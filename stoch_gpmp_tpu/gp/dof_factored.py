"""Per-dof factored, plane-ordered form of the constant-velocity GP stack.

Every weight in the reference's prior/cost construction is isotropic —
``Qc^{-1} = I/sigma^2`` (``stoch_gpmp/costs/factors/gp_factor.py:26``),
unary anchors ``K = I/sigma^2`` (``unary_factor.py:19``) — and the
state-transition ``Phi = [[I, dt I], [0, I]]`` (``gp_factor.py:36-42``)
couples position and velocity only WITHIN a dof. The lifted trajectory
Gaussian therefore factorizes exactly across dofs: the dense ``[M, M]``
precision/cost/sampling matrices (``M = 2 * n_dof * T``) are permuted
block-diagonals of ``n_dof`` IDENTICAL ``[2T, 2T]`` blocks.

This module materializes that structure in PLANE ordering — per dof, the
``2T`` state vector is ``[p_0..p_{T-1}, v_0..v_{T-1}]`` — which makes the
per-dof layout exactly the 128-lane-friendly time-plane layout of the fast
field kernels (``ops/pallas/panda_fields.py``). Wins over the dense stack:

- sampling / quadratic-cost matmuls shrink from ``[B, M] @ [M, M]`` to
  ``[B*d, 2T] @ [2T, 2T]`` — a factor-``d`` FLOP reduction (4x at d=14 for
  the sampling+quad pair vs dense sampling+quad+plane-selection);
- the position planes fall out of the sampling matmul itself — the
  ``[M, n_dof*TPAD]`` selection matmul of the flat fast stack disappears;
- the fused-iteration Pallas kernel's constants drop from ``O(M^2)``
  (~38 MB at the config-5 scale — over VMEM) to ``O((2T)^2)`` (~260 KB),
  so the whole iteration fuses at ANY particle count.

The factorization is exact for the reference's entire API surface (scalar
sigmas). Non-isotropic weights (a dense ``Qc``) would couple dofs; the
constructors assert isotropy and callers fall back to the dense stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from stoch_gpmp_tpu.gp.lift import q_inv_block, unary_weight
from stoch_gpmp_tpu.gp.tridiag import BlockTridiag


def plane_perm(traj_len: int) -> np.ndarray:
    """Permutation taking a per-dof t-major ``[p(0), v(0), p(1), v(1), ...]``
    vector to plane order ``[p(0..T-1), v(0..T-1)]``: ``x_plane = x_tmajor[perm]``."""
    t = traj_len
    return np.concatenate([2 * np.arange(t), 2 * np.arange(t) + 1])


def _perm2(mat: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    return mat[np.ix_(perm, perm)]


def _assert_isotropic(k: jnp.ndarray, n_dof: int, name: str) -> None:
    """Check ``k`` (a ``[2d, 2d]`` matrix) has the per-dof-decoupled form
    ``[[a I, b I], [c I, e I]]``; raises otherwise."""
    k = np.asarray(k)
    d = n_dof
    a, b, c, e = k[0, 0], k[0, d], k[d, 0], k[d, d]
    expect = np.block([
        [a * np.eye(d), b * np.eye(d)],
        [c * np.eye(d), e * np.eye(d)],
    ])
    scale = max(1.0, float(np.abs(k).max()))
    if not np.allclose(k, expect, rtol=1e-5, atol=1e-6 * scale):
        raise ValueError(
            f"{name} is not per-dof isotropic; the dof-factored fast path "
            "requires scalar sigmas (the reference's only API)"
        )


def _dof2_block(k: jnp.ndarray, n_dof: int) -> jnp.ndarray:
    """Extract the per-dof ``[2, 2]`` block of a ``[[aI, bI], [bI, cI]]``
    weight."""
    d = n_dof
    return jnp.asarray(
        [[k[0, 0], k[0, d]], [k[d, 0], k[d, d]]], dtype=k.dtype
    )


def to_dof_planes(x: jnp.ndarray) -> jnp.ndarray:
    """``[..., T, 2d] -> [d, ..., 2T]`` (per-dof position plane then velocity
    plane, dof axis LEADING). Layout-conversion boundary: call once at
    optimize entry/exit.

    The dof axis must be leading (not second-minor): a ``[..., d, 2T]``
    layout tiles d onto 8-sublane vregs (14 -> 16 padding) and every
    ``reshape(-1, 2T)`` for the per-dof matmuls then REPACKS the whole
    batch — the known d-minor relayout trap (docs/PERFORMANCE.md). With d
    leading, merging it into the matmul batch is free."""
    t, d2 = x.shape[-2], x.shape[-1]
    d = d2 // 2
    y = x.reshape(x.shape[:-2] + (t, 2, d))
    nb = y.ndim - 3
    perm = (y.ndim - 1,) + tuple(range(nb)) + (y.ndim - 2, y.ndim - 3)
    y = jnp.transpose(y, perm)  # [d, ..., 2, T]
    return y.reshape((d,) + x.shape[:-2] + (2 * t,))


def from_dof_planes(x_planes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_dof_planes`: ``[d, ..., 2T] -> [..., T, 2d]``."""
    d, t2 = x_planes.shape[0], x_planes.shape[-1]
    t = t2 // 2
    y = x_planes.reshape((d,) + x_planes.shape[1:-1] + (2, t))
    nb = y.ndim - 3
    perm = tuple(range(1, nb + 1)) + (y.ndim - 1, y.ndim - 2, 0)
    y = jnp.transpose(y, perm)  # [..., T, 2, d]
    return y.reshape(x_planes.shape[1:-1] + (t, 2 * d))


def _lane_slices(x, n_dof):
    """Shifted flat-lane views for the t-major layout (lane ``t*2d + j`` =
    pos_j(t), ``t*2d + d + j`` = vel_j(t)): at a position lane ``l`` of step
    ``t < T-1``, returns ``(pos(t), vel(t), pos(t+1), vel(t+1))`` as
    ``[..., L]`` slices with ``L = M - 3d`` (every needed position lane is
    ``< L``), plus the pos-lane mask."""
    m = x.shape[-1]
    sd = 2 * n_dof
    lng = m - 3 * n_dof
    x0 = x[..., :lng]
    xd = x[..., n_dof : lng + n_dof]
    x1 = x[..., sd : lng + sd]
    x1d = x[..., sd + n_dof : lng + sd + n_dof]
    lanes = np.arange(lng)
    mask = jnp.asarray(((lanes % sd) < n_dof).astype(np.float32), dtype=x.dtype)
    return x0, xd, x1, x1d, mask


def stencil_matvec_flat(x, q_i2, k_s2, k_g2, dt):
    """``A x`` for the factor-graph block-tridiagonal ``A`` (start anchor +
    CV-GP chain + goal anchor, per-dof-isotropic 2x2 weights) on flat
    ``[..., T, 2d]`` trajectories. Exact O(T) elementwise stencil — the
    TPU-safe replacement for ``x @ A_dense`` (see module docstring).

    Runs on flat-LANE slices of the t-major ``[..., M]`` row: a
    ``[..., T, d]`` formulation would put the d-wide state on the lane dim
    and pad 14 -> 128 on TPU tiles (9x traffic — the known d-minor trap);
    lane-shifted slices of the flat row stay dense."""
    d = x.shape[-1] // 2
    t = x.shape[-2]
    lead = x.shape[:-2]
    m = t * 2 * d
    sd = 2 * d
    xf = x.reshape(lead + (m,))
    x0, xd, x1, x1d, mask = _lane_slices(xf, d)
    q11, q12 = q_i2[0, 0], q_i2[0, 1]
    q21, q22 = q_i2[1, 0], q_i2[1, 1]
    rp = (x0 + dt * xd - x1) * mask
    rv = (xd - x1d) * mask
    a = q11 * rp + q12 * rv  # (Q^{-1} r)_p at pos lane l
    b = q21 * rp + q22 * rv  # (Q^{-1} r)_v
    pad_lo = [(0, 0)] * (xf.ndim - 1)
    # y += phi^T Q^{-1} r at step t (lanes l, l+d), -= Q^{-1} r at step t+1
    # (lanes l+2d, l+3d)
    y = (
        jnp.pad(a, pad_lo + [(0, 3 * d)])
        + jnp.pad(dt * a + b, pad_lo + [(d, 2 * d)])
        - jnp.pad(a, pad_lo + [(sd, d)])
        - jnp.pad(b, pad_lo + [(3 * d, 0)])
    )
    ks, kg = k_s2, k_g2
    p0, v0 = xf[..., :d], xf[..., d:sd]
    pl_, vl_ = xf[..., m - sd : m - d], xf[..., m - d :]
    y = y.at[..., :d].add(ks[0, 0] * p0 + ks[0, 1] * v0)
    y = y.at[..., d:sd].add(ks[1, 0] * p0 + ks[1, 1] * v0)
    y = y.at[..., m - sd : m - d].add(kg[0, 0] * pl_ + kg[0, 1] * vl_)
    y = y.at[..., m - d :].add(kg[1, 0] * pl_ + kg[1, 1] * vl_)
    return y.reshape(x.shape)


@struct.dataclass
class DofFactoredPrior:
    """Shared per-dof sampling factor + precision in plane order.

    ``w_dof``: ``[2T, 2T]`` with ``x_d = mu_d + eps_d @ w_dof`` (rows = plane
    order); ``prec_dof``: ``[2T, 2T]`` per-dof ``Sigma^{-1}`` (symmetric).
    All dofs share both (scalar sigmas). Equivalent — exactly, tested — to
    the dense ``[M, M]`` forms of ``make_gp_prior`` under the plane
    permutation.
    """

    w_dof: jnp.ndarray
    prec_dof: jnp.ndarray
    traj_len: int = struct.field(pytree_node=False)
    # factor-graph stencil of the same precision (2x2 per-dof blocks):
    # Sigma^{-1} = K_s anchor(0) + sum_t F_t^T Q^{-1} F_t + K_g anchor(T-1).
    # matvec runs on these — O(T) shifted-plane VPU math — instead of the
    # [2T, 2T] MXU matmul: the precision's ~1/sigma^2 dt^-3 entries (1e10 at
    # the Panda sigmas) make a default-precision TPU matmul bf16-garbage
    # (the CLAUDE.md 1e8-weight trap, hit by the fused dof kernel in round 3),
    # while the residual form has no cancellation and is f32-exact.
    q_i2: jnp.ndarray | None = None  # [2, 2] CV-factor Q^{-1}
    k_s2: jnp.ndarray | None = None  # [2, 2] start anchor weight
    k_g2: jnp.ndarray | None = None  # [2, 2] goal anchor weight (zeros if none)
    dt: float = struct.field(pytree_node=False, default=0.0)

    def sample_planes(self, key, mu_planes: jnp.ndarray, num_samples: int):
        """Draw ``[d, P, S, 2T]`` samples around ``mu_planes [d, P, 2T]``;
        returns ``(samples, corr)``."""
        d, p, t2 = mu_planes.shape
        eps = jax.random.normal(
            key, (d, p, num_samples, t2), dtype=mu_planes.dtype
        )
        corr = (eps.reshape(-1, t2) @ self.w_dof).reshape(eps.shape)
        return mu_planes[:, :, None] + corr, corr

    def matvec_planes(self, x_planes: jnp.ndarray) -> jnp.ndarray:
        """``Sigma^{-1} x`` per dof on ``[d, ..., 2T]`` planes.

        Factor-graph stencil (exact, O(T), no MXU): per factor
        ``r_t = phi x_t - x_{t+1}``, ``y_t += phi^T Q^{-1} r_t``,
        ``y_{t+1} -= Q^{-1} r_t``, plus the two anchors."""
        if self.q_i2 is None:  # legacy pytrees without stencil params
            t2 = x_planes.shape[-1]
            return (x_planes.reshape(-1, t2) @ self.prec_dof).reshape(
                x_planes.shape
            )
        t = self.traj_len
        p = x_planes[..., :t]
        v = x_planes[..., t:]
        q11, q12 = self.q_i2[0, 0], self.q_i2[0, 1]
        q21, q22 = self.q_i2[1, 0], self.q_i2[1, 1]
        rp = p[..., :-1] + self.dt * v[..., :-1] - p[..., 1:]
        rv = v[..., :-1] - v[..., 1:]
        a = q11 * rp + q12 * rv  # (Q^{-1} r)_p
        b = q21 * rp + q22 * rv  # (Q^{-1} r)_v
        pad_lo = [(0, 0)] * (p.ndim - 1)
        yp = jnp.pad(a, pad_lo + [(0, 1)]) - jnp.pad(a, pad_lo + [(1, 0)])
        bv = self.dt * a + b  # (phi^T Q^{-1} r)_v
        yv = jnp.pad(bv, pad_lo + [(0, 1)]) - jnp.pad(b, pad_lo + [(1, 0)])
        ks, kg = self.k_s2, self.k_g2
        yp = yp.at[..., 0].add(ks[0, 0] * p[..., 0] + ks[0, 1] * v[..., 0])
        yv = yv.at[..., 0].add(ks[1, 0] * p[..., 0] + ks[1, 1] * v[..., 0])
        yp = yp.at[..., -1].add(kg[0, 0] * p[..., -1] + kg[0, 1] * v[..., -1])
        yv = yv.at[..., -1].add(kg[1, 0] * p[..., -1] + kg[1, 1] * v[..., -1])
        return jnp.concatenate([yp, yv], axis=-1)

    def matvec_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """``Sigma^{-1} x`` on flat ``[..., T, 2d]`` trajectories — the same
        stencil as :meth:`matvec_planes` without the plane relayout, so the
        legacy flat planner path gets the exact O(T) matvec too."""
        return stencil_matvec_flat(
            x, self.q_i2, self.k_s2, self.k_g2, self.dt
        )


def make_dof_factored_prior(
    traj_len: int,
    dt: float,
    sigma_start: float,
    sigma_gp: float,
    sigma_goal: float | None = None,
    dtype=jnp.float32,
) -> DofFactoredPrior:
    """Per-dof ``[2T, 2T]`` sampling factor and precision (plane order).

    Built by the same structured (f32-stable) block-Cholesky as
    ``make_gp_prior`` — at ``n_dof=1`` — then permuted from t-major to plane
    order. The factorization over dofs is exact because Cholesky preserves
    the disconnected per-dof sparsity components in any ordering.
    """
    from stoch_gpmp_tpu.gp.prior import build_precision

    # setup-time constants: build on the host CPU backend when available —
    # eager construction ops through a remote-TPU attachment would each pay
    # tunnel latency/compiles for [2T, 2T]-sized work
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        k_s_inv = unary_weight(2, sigma_start, dtype=dtype)
        q_inv = q_inv_block(1, dt, sigma=sigma_gp, dtype=dtype)
        k_g_inv = (
            None if sigma_goal is None else unary_weight(2, sigma_goal, dtype=dtype)
        )
        prec1 = build_precision(
            1, traj_len, dt, k_s_inv, q_inv, k_g_inv=k_g_inv, dtype=dtype
        )
        chol = prec1.cholesky()
        w1 = chol.dense_inv_transpose().T  # [2T, 2T] = L^{-1}
        perm = plane_perm(traj_len)
        w_dof = _perm2(w1, perm)
        prec_dof = _perm2(prec1.to_dense(), perm)
        k_g2 = (
            jnp.zeros((2, 2), dtype=dtype) if k_g_inv is None
            else jnp.asarray(k_g_inv, dtype=dtype)
        )
    return DofFactoredPrior(
        w_dof=jnp.asarray(np.asarray(w_dof)),
        prec_dof=jnp.asarray(np.asarray(prec_dof)),
        traj_len=traj_len,
        q_i2=jnp.asarray(np.asarray(q_inv)),
        k_s2=jnp.asarray(np.asarray(k_s_inv)),
        k_g2=jnp.asarray(np.asarray(k_g2)),
        dt=float(dt),
    )


@struct.dataclass
class DofQuadraticCost:
    """``CostGP + CostGoalPrior`` as per-dof plane-order quadratics.

    ``cost(x) = sum_d x_d^T a_dof x_d - 2 b_planes[g, d] . x_d + c[g]`` —
    exactly equal (tested) to ``QuadraticCost`` (and hence to
    ``CostGP.eval + CostGoalPrior.eval``, reference
    ``cost_functions.py:128-146,376-388``) on the plane-ordered batch.
    """

    a_dof: jnp.ndarray  # [2T, 2T] shared across dofs and goals
    b_planes: jnp.ndarray  # [G, d, 2T]
    c: jnp.ndarray  # [G]
    num_goals: int = struct.field(pytree_node=False)
    n_dof: int = struct.field(pytree_node=False)
    traj_len: int = struct.field(pytree_node=False)
    # factor-graph stencil parameters — eval runs in residual form
    # (sum of local non-negative quadratics; exact, O(T), VPU-only) rather
    # than ``x A x - 2 b x + c``: the latter feeds the ~1e10-scale GP
    # precision through an MXU matmul whose default bf16 passes corrupt the
    # massively-cancelling quadratic beyond use (measured on v5e, round 3).
    q_i2: jnp.ndarray | None = None  # [2, 2] CV-factor Q^{-1}
    k_s2: jnp.ndarray | None = None  # [2, 2] start anchor weight
    k_g2: jnp.ndarray | None = None  # [2, 2] goal anchor weight (zeros if none)
    s_pd: jnp.ndarray | None = None  # [d, 2] start (pos, vel) per dof
    g_pd: jnp.ndarray | None = None  # [G, d, 2] goals (zeros if none)
    dt: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def from_gp_and_goal_prior(cls, gp, goal_prior, traj_len: int) -> "DofQuadraticCost":
        """Per-dof analogue of ``QuadraticCost.from_gp_and_goal_prior``."""
        d2 = gp.start_state.shape[-1]
        n_dof = d2 // 2
        dtype = gp.start_state.dtype
        _assert_isotropic(gp.k_start, n_dof, "k_start")
        _assert_isotropic(gp.q_inv, n_dof, "q_inv")
        _assert_isotropic(gp.phi, n_dof, "phi")
        if goal_prior is not None:
            _assert_isotropic(goal_prior.k_goal, n_dof, "k_goal")

        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        import contextlib

        ctx = (
            jax.default_device(cpu) if cpu is not None
            else contextlib.nullcontext()
        )
        with ctx:
            k_s = _dof2_block(jnp.asarray(np.asarray(gp.k_start)), n_dof)
            q_i = _dof2_block(jnp.asarray(np.asarray(gp.q_inv)), n_dof)
            phi = _dof2_block(jnp.asarray(np.asarray(gp.phi)), n_dof)
            k_g = (
                _dof2_block(jnp.asarray(np.asarray(goal_prior.k_goal)), n_dof)
                if goal_prior is not None else None
            )
            pqp = phi.T @ q_i @ phi
            diag = jnp.tile(q_i + pqp, (traj_len, 1, 1))
            diag = diag.at[0].set(k_s + pqp)
            last = q_i if k_g is None else q_i + k_g
            diag = diag.at[traj_len - 1].set(last)
            lower = jnp.tile(-(q_i @ phi), (traj_len - 1, 1, 1))
            a1 = BlockTridiag(diag=diag, lower=lower).to_dense()  # t-major
            perm = plane_perm(traj_len)
            a_dof = _perm2(a1, perm)

            goals = (
                jnp.asarray(np.asarray(goal_prior.multi_goal_states))
                if goal_prior is not None else None
            )
            start_state = jnp.asarray(np.asarray(gp.start_state))
            g = goals.shape[0] if goals is not None else 1
            t = traj_len
            b_planes = jnp.zeros((g, n_dof, 2 * t), dtype=dtype)
            # start anchor: linear term K_s s on state 0 -> (pos_0, vel_0)
            s_pd = jnp.stack(
                [start_state[:n_dof], start_state[n_dof:]], axis=-1
            )  # [d, 2]
            bs = s_pd @ k_s.T  # [d, 2] rows (pos coeff, vel coeff)
            b_planes = b_planes.at[:, :, 0].set(bs[:, 0])
            b_planes = b_planes.at[:, :, t].set(bs[:, 1])
            c = jnp.full((g,), jnp.sum(s_pd * bs), dtype=dtype)
            if goals is not None:
                g_pd = jnp.stack(
                    [goals[:, :n_dof], goals[:, n_dof:]], axis=-1
                )  # [G, d, 2]
                bg = jnp.einsum("gdk,jk->gdj", g_pd, k_g)  # [G, d, 2]
                b_planes = b_planes.at[:, :, t - 1].add(bg[..., 0])
                b_planes = b_planes.at[:, :, 2 * t - 1].add(bg[..., 1])
                c = c + jnp.einsum("gdk,gdk->g", g_pd, bg)
            else:
                g_pd = jnp.zeros((g, n_dof, 2), dtype=dtype)
            k_g2 = jnp.zeros((2, 2), dtype=dtype) if k_g is None else k_g
            a_dof = jnp.asarray(np.asarray(a_dof))
            b_planes = jnp.asarray(np.asarray(b_planes))
            c = jnp.asarray(np.asarray(c))
            dt = float(np.asarray(phi)[0, 1])
        return cls(
            a_dof=a_dof, b_planes=b_planes, c=c, num_goals=g,
            n_dof=n_dof, traj_len=traj_len,
            q_i2=jnp.asarray(np.asarray(q_i)),
            k_s2=jnp.asarray(np.asarray(k_s)),
            k_g2=jnp.asarray(np.asarray(k_g2)),
            s_pd=jnp.asarray(np.asarray(s_pd)),
            g_pd=jnp.asarray(np.asarray(g_pd)),
            dt=dt,
        )

    def supports_dof_planes(self) -> bool:
        return True

    def eval(self, trajs, x_trajs=None, observation=None):
        """Flat-batch ``eval`` (``[B, T, 2d]`` or ``[B, M]``) through the
        plane layout — the dense-free quadratic for long horizons where a
        ``[M, M]`` ``QuadraticCost.a_dense`` would not fit (e.g. d=14,
        T=1024: 3.3 GB)."""
        trajs = trajs.reshape(-1, self.traj_len, 2 * self.n_dof)
        return self.eval_dof_planes(to_dof_planes(trajs), observation=observation)

    def eval_dof_planes(self, x_planes: jnp.ndarray, observation=None) -> jnp.ndarray:
        """``x_planes [d, B, 2T]`` (dof-leading, goal-major batch) -> ``[B]``
        costs, in factor-graph residual form (exact ``x A x - 2 b x + c``
        rewritten as sums of local quadratics — no MXU, no cancellation).

        On TPU the residual form runs as a single-pass Pallas kernel when
        eligible (``dof_quad_eval_pallas``): XLA leaves the ~20 shifted
        elementwise passes unfused at scale, which is HBM-bound on the
        [d, N, 2T] sample batch (measured ~2.4x whole-iteration regression
        at config 5 — docs/PERFORMANCE.md round 3)."""
        if self.q_i2 is None:  # legacy pytrees without stencil params
            return self.eval_dof_planes_dense(x_planes)
        if jax.default_backend() == "tpu":
            from stoch_gpmp_tpu.ops.pallas.stencil import dof_quad_eval_pallas

            out = dof_quad_eval_pallas(self, x_planes)
            if out is not None:
                return out
        d, b, t2 = x_planes.shape
        t = self.traj_len
        p = x_planes[..., :t]
        v = x_planes[..., t:]
        q11, q12, q22 = self.q_i2[0, 0], self.q_i2[0, 1], self.q_i2[1, 1]
        rp = p[..., :-1] + self.dt * v[..., :-1] - p[..., 1:]
        rv = v[..., :-1] - v[..., 1:]
        e = jnp.sum(
            q11 * rp * rp + 2.0 * q12 * rp * rv + q22 * rv * rv, axis=(0, -1)
        )
        ks11, ks12, ks22 = self.k_s2[0, 0], self.k_s2[0, 1], self.k_s2[1, 1]
        r0p = p[..., 0] - self.s_pd[:, None, 0]
        r0v = v[..., 0] - self.s_pd[:, None, 1]
        e = e + jnp.sum(
            ks11 * r0p * r0p + 2.0 * ks12 * r0p * r0v + ks22 * r0v * r0v,
            axis=0,
        )
        kg11, kg12, kg22 = self.k_g2[0, 0], self.k_g2[0, 1], self.k_g2[1, 1]
        ppg = b // self.num_goals
        rgp = (
            p[..., -1].reshape(d, self.num_goals, ppg)
            - self.g_pd[..., 0].T[:, :, None]
        )
        rgv = (
            v[..., -1].reshape(d, self.num_goals, ppg)
            - self.g_pd[..., 1].T[:, :, None]
        )
        e = e + jnp.sum(
            kg11 * rgp * rgp + 2.0 * kg12 * rgp * rgv + kg22 * rgv * rgv,
            axis=0,
        ).reshape(b)
        return e

    def grad_dof_planes(self, x_planes: jnp.ndarray) -> jnp.ndarray:
        """``b - A x`` per dof on ``[d, B, 2T]`` planes (goal-major batch) —
        half the negative cost gradient, in factor-graph residual form.

        Each factor's contribution is ``J^T W r`` with the (small) residual
        ``r`` formed BEFORE the ~1/sigma^2-scale weight touches it: exact in
        f32, no MXU. The algebraically-equal dense form
        ``b_planes - x @ a_dof`` cancels two ~|A|*|x| quantities and is
        bf16-corrupted on TPU (the round-3 stencil lesson; measured as GN
        divergence, 18 -> 5e9 over 5 iterations at the planar sigmas)."""
        d, bsz, t2 = x_planes.shape
        t = self.traj_len
        p = x_planes[..., :t]
        v = x_planes[..., t:]
        q11, q12 = self.q_i2[0, 0], self.q_i2[0, 1]
        q21, q22 = self.q_i2[1, 0], self.q_i2[1, 1]
        rp = p[..., :-1] + self.dt * v[..., :-1] - p[..., 1:]
        rv = v[..., :-1] - v[..., 1:]
        a = q11 * rp + q12 * rv  # (Q^{-1} r)_p
        b = q21 * rp + q22 * rv  # (Q^{-1} r)_v
        pad_lo = [(0, 0)] * (p.ndim - 1)
        yp = jnp.pad(a, pad_lo + [(0, 1)]) - jnp.pad(a, pad_lo + [(1, 0)])
        bv = self.dt * a + b  # (phi^T Q^{-1} r)_v
        yv = jnp.pad(bv, pad_lo + [(0, 1)]) - jnp.pad(b, pad_lo + [(1, 0)])
        # anchors act on RESIDUALS (x - s, x - g): K_s s lands in b, K_s x_0
        # in A x — forming them separately is the cancellation this avoids.
        ks, kg = self.k_s2, self.k_g2
        r0p = p[..., 0] - self.s_pd[:, None, 0]
        r0v = v[..., 0] - self.s_pd[:, None, 1]
        yp = yp.at[..., 0].add(ks[0, 0] * r0p + ks[0, 1] * r0v)
        yv = yv.at[..., 0].add(ks[1, 0] * r0p + ks[1, 1] * r0v)
        ppg = bsz // self.num_goals
        rgp = (
            p[..., -1].reshape(d, self.num_goals, ppg)
            - self.g_pd[..., 0].T[:, :, None]
        )
        rgv = (
            v[..., -1].reshape(d, self.num_goals, ppg)
            - self.g_pd[..., 1].T[:, :, None]
        )
        yp = yp.at[..., -1].add(
            (kg[0, 0] * rgp + kg[0, 1] * rgv).reshape(d, bsz)
        )
        yv = yv.at[..., -1].add(
            (kg[1, 0] * rgp + kg[1, 1] * rgv).reshape(d, bsz)
        )
        return -jnp.concatenate([yp, yv], axis=-1)

    def eval_dof_planes_dense(self, x_planes: jnp.ndarray) -> jnp.ndarray:
        """The ``x A x - 2 b x + c`` matmul form — algebraically identical to
        the stencil eval, kept for A/B tests. On TPU this form is NUMERICALLY
        UNSAFE at the reference's Panda sigmas (see class docstring)."""
        d, b, t2 = x_planes.shape
        xa = (x_planes.reshape(-1, t2) @ self.a_dof).reshape(d, b, t2)
        quad = jnp.sum(xa * x_planes, axis=(0, -1))
        xg = x_planes.reshape(d, self.num_goals, -1, t2)
        lin = jnp.einsum("dgbk,gdk->gb", xg, self.b_planes).reshape(b)
        cg = jnp.repeat(self.c, b // self.num_goals)
        return quad - 2.0 * lin + cg
