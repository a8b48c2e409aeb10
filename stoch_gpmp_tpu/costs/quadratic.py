"""Fused dense quadratic cost: the MXU fast path for the planner hot loop.

``CostGP`` + ``CostGoalPrior`` (and the start anchor) are all quadratic forms
in the flattened trajectory ``x [M]``:

    cost(x) = x^T A x - 2 b^T x + c

with a SHARED ``A`` (block-tridiagonal, but at M <= ~1k a dense apply is one
MXU matmul and beats a structured apply's chain of small ops) and per-goal
``(b, c)``. Evaluating for the whole ``particles x samples`` batch is then a
single ``[B, M] @ [M, M]`` matmul plus row-dots — replacing dozens of small
VPU einsums that leave the TPU latency-bound.

Exactly equal (tested) to ``CostGP.eval + CostGoalPrior.eval``. The
block-tridiagonal blocks are kept alongside the dense matrix so the
Gauss-Newton path still gets its structured contribution.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.costs.costs import Cost, CostGP, CostGoalPrior, GNContrib
from stoch_gpmp_tpu.gp.tridiag import BlockTridiag


@struct.dataclass
class QuadraticCost(Cost):
    a_dense: jnp.ndarray  # [M, M]
    a_diag: jnp.ndarray  # [T, d, d] block-tridiagonal form of A
    a_lower: jnp.ndarray  # [T-1, d, d]
    b: jnp.ndarray  # [G, M]
    c: jnp.ndarray  # [G]
    num_goals: int = struct.field(pytree_node=False)
    traj_len: int = struct.field(pytree_node=False)
    state_dim: int = struct.field(pytree_node=False)
    # per-dof factored form (gp/dof_factored.py) — exact under scalar sigmas;
    # lets the planner's dof-plane fast path evaluate this cost as d
    # [B, 2T] @ [2T, 2T] matmuls (factor-d fewer FLOPs than a_dense)
    dof_form: object | None = None
    # conditioning verdict, decided at CONSTRUCTION (needs_stencil on
    # concrete weights — eval runs under tracing where the weights are
    # Tracers): stencil where bf16 MXU error would swamp the quadratic
    # (Panda, ~2e11 weights), one-matmul dense form at mild weights
    stencil_required: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def from_gp_and_goal_prior(
        cls, gp: CostGP, goal_prior: CostGoalPrior | None, traj_len: int
    ) -> "QuadraticCost":
        """Fuse a ``CostGP`` (start anchor + GP smoothness) and optionally a
        ``CostGoalPrior`` into one dense quadratic."""
        d = gp.start_state.shape[-1]
        dof = d // 2
        dtype = gp.start_state.dtype
        k_g = goal_prior.k_goal if goal_prior is not None else None
        # A = the same block-tridiagonal precision the prior builder makes
        # (dt is baked into gp.phi / gp.q_inv; build directly from blocks).
        pqp = gp.phi.T @ gp.q_inv @ gp.phi
        diag = jnp.tile(gp.q_inv + pqp, (traj_len, 1, 1))
        diag = diag.at[0].set(gp.k_start + pqp)
        last = gp.q_inv if k_g is None else gp.q_inv + k_g
        diag = diag.at[traj_len - 1].set(last)
        lower = jnp.tile(-(gp.q_inv @ gp.phi), (traj_len - 1, 1, 1))
        a_dense = BlockTridiag(diag=diag, lower=lower).to_dense()

        m = traj_len * d
        if goal_prior is not None:
            goals = goal_prior.multi_goal_states  # [G, d]
            g = goals.shape[0]
        else:
            g = 1
        b = jnp.zeros((g, m), dtype=dtype)
        # start anchor: e0 = s - x0 -> linear term K_s s in block 0
        b = b.at[:, :d].set(jnp.einsum("ij,j->i", gp.k_start, gp.start_state))
        c = jnp.full(
            (g,), jnp.einsum("i,ij,j->", gp.start_state, gp.k_start, gp.start_state),
            dtype=dtype,
        )
        if goal_prior is not None:
            b = b.at[:, -d:].add(jnp.einsum("ij,gj->gi", k_g, goals))
            c = c + jnp.einsum("gi,ij,gj->g", goals, k_g, goals)
        from stoch_gpmp_tpu.gp.dof_factored import DofQuadraticCost

        try:
            dof_form = DofQuadraticCost.from_gp_and_goal_prior(
                gp, goal_prior, traj_len
            )
        except ValueError:  # non-isotropic weights: dense form only
            dof_form = None
        if dof_form is not None:
            from stoch_gpmp_tpu.ops.pallas.stencil import needs_stencil

            try:
                stencil_required = bool(needs_stencil(dof_form))
            except Exception:  # built under tracing: keep the safe default
                stencil_required = True
        else:
            stencil_required = True
        return cls(
            a_dense=a_dense,
            a_diag=diag,
            a_lower=lower,
            b=b,
            c=c,
            num_goals=g,
            traj_len=traj_len,
            state_dim=d,
            dof_form=dof_form,
            stencil_required=stencil_required,
        )

    def supports_dof_planes(self) -> bool:
        return self.dof_form is not None

    def eval_dof_planes(self, x_planes, observation=None):
        return self.dof_form.eval_dof_planes(x_planes, observation=observation)

    def eval(self, trajs, x_trajs=None, observation=None):
        batch = trajs.shape[0]
        if self.dof_form is not None and self.dof_form.q_i2 is not None:
            # same conditioning gate as the fused kernels (see the
            # stencil_required field + STENCIL_CONDITION_THRESHOLD)
            if self.stencil_required:
                return self._eval_stencil(trajs)
        x = trajs.reshape(batch, -1)  # [B, M]
        quad = jnp.sum((x @ self.a_dense) * x, axis=-1)
        xg = x.reshape(self.num_goals, -1, x.shape[-1])
        lin = jnp.einsum("gbm,gm->gb", xg, self.b).reshape(batch)
        cg = jnp.repeat(self.c, batch // self.num_goals)
        return quad - 2.0 * lin + cg

    def _eval_stencil(self, trajs):
        """Factor-graph residual form of the same quadratic on flat-LANE
        slices of the t-major ``[B, M]`` row (no d-minor tile pad, no
        relayout). Algebraically identical to ``x A x - 2 b x + c`` but
        TPU-SAFE: the dense form routes the ~1e10-scale GP precision
        through MXU matmuls whose default bf16 passes corrupt the
        massively-cancelling quadratic (measured on v5e — see
        gp/dof_factored.py)."""
        from stoch_gpmp_tpu.gp.dof_factored import _lane_slices

        df = self.dof_form
        batch = trajs.shape[0]
        d = self.state_dim // 2
        sd = self.state_dim
        m = self.traj_len * sd
        x = trajs.reshape(batch, m)
        x0, xd, x1, x1d, mask = _lane_slices(x, d)
        q11, q12, q22 = df.q_i2[0, 0], df.q_i2[0, 1], df.q_i2[1, 1]
        rp = (x0 + df.dt * xd - x1) * mask
        rv = (xd - x1d) * mask
        e = jnp.sum(
            q11 * rp * rp + 2.0 * q12 * rp * rv + q22 * rv * rv, axis=-1
        )
        ks11, ks12, ks22 = df.k_s2[0, 0], df.k_s2[0, 1], df.k_s2[1, 1]
        r0p = x[:, :d] - df.s_pd[None, :, 0]
        r0v = x[:, d:sd] - df.s_pd[None, :, 1]
        e = e + jnp.sum(
            ks11 * r0p * r0p + 2.0 * ks12 * r0p * r0v + ks22 * r0v * r0v,
            axis=-1,
        )
        kg11, kg12, kg22 = df.k_g2[0, 0], df.k_g2[0, 1], df.k_g2[1, 1]
        ppg = batch // self.num_goals
        rgp = (
            x[:, m - sd : m - d].reshape(self.num_goals, ppg, d)
            - df.g_pd[:, None, :, 0]
        )
        rgv = (
            x[:, m - d :].reshape(self.num_goals, ppg, d)
            - df.g_pd[:, None, :, 1]
        )
        e = e + jnp.sum(
            kg11 * rgp * rgp + 2.0 * kg12 * rgp * rgv + kg22 * rgv * rgv,
            axis=-1,
        ).reshape(batch)
        return e

    def gn_contrib(self, trajs, x_trajs=None, observation=None):
        batch = trajs.shape[0]
        t, d = self.traj_len, self.state_dim
        trajs = trajs.reshape(batch, t, d)
        diag = jnp.broadcast_to(self.a_diag, (batch, t, d, d))
        lower = jnp.broadcast_to(self.a_lower, (batch, t - 1, d, d))
        # g = b_p - A x (gradient of 1/2 quad form with the reference's
        # A = -dE/dx convention: identical to CostGP/CostGoalPrior sums).
        # A x via the exact O(T) factor-graph stencil when available (the
        # dense [M, M] matmul is bf16-degraded on the TPU MXU at the
        # reference's sigmas — see gp/dof_factored.py)
        df = self.dof_form
        if df is not None and getattr(df, "q_i2", None) is not None:
            from stoch_gpmp_tpu.gp.dof_factored import stencil_matvec_flat

            ax = stencil_matvec_flat(
                trajs, df.q_i2, df.k_s2, df.k_g2, df.dt
            ).reshape(batch, -1)
        else:
            ax = trajs.reshape(batch, -1) @ self.a_dense
        bg = jnp.repeat(self.b, batch // self.num_goals, axis=0)
        g = (bg - ax).reshape(batch, t, d)
        return GNContrib(diag=diag, lower=lower, g=g)
