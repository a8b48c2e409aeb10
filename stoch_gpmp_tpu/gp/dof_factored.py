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
        """``Sigma^{-1} x`` per dof: ``[d, ..., 2T] @ [2T, 2T]``."""
        t2 = x_planes.shape[-1]
        return (x_planes.reshape(-1, t2) @ self.prec_dof).reshape(x_planes.shape)


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
    return DofFactoredPrior(
        w_dof=jnp.asarray(np.asarray(w_dof)),
        prec_dof=jnp.asarray(np.asarray(prec_dof)),
        traj_len=traj_len,
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
            a_dof = jnp.asarray(np.asarray(a_dof))
            b_planes = jnp.asarray(np.asarray(b_planes))
            c = jnp.asarray(np.asarray(c))
        return cls(
            a_dof=a_dof, b_planes=b_planes, c=c, num_goals=g,
            n_dof=n_dof, traj_len=traj_len,
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
        costs."""
        d, b, t2 = x_planes.shape
        xa = (x_planes.reshape(-1, t2) @ self.a_dof).reshape(d, b, t2)
        quad = jnp.sum(xa * x_planes, axis=(0, -1))
        xg = x_planes.reshape(d, self.num_goals, -1, t2)
        lin = jnp.einsum("dgbk,gdk->gb", xg, self.b_planes).reshape(b)
        cg = jnp.repeat(self.c, b // self.num_goals)
        return quad - 2.0 * lin + cg
