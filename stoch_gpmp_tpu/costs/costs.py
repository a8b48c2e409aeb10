"""Composable trajectory cost stack.

Capability parity with reference ``stoch_gpmp/costs/cost_functions.py``,
re-designed as immutable pytree dataclasses with pure, fully-batched ``eval``
methods (no Python loops over goals or timesteps — the reference's per-goal
loop at ``cost_functions.py:381-387`` becomes a vectorized einsum).

Conventions (matching the reference):
- ``trajs``: ``[batch, traj_len, 2*n_dof]`` (positions then velocities).
- ``x_trajs``: optional FK link poses ``[batch, traj_len, links, 4, 4]``,
  computed ONCE by ``CostComposite`` and passed to children
  (``cost_functions.py:51-56``).
- ``observation``: dict pytree of runtime data (e.g. ``obstacle_spheres``).
- collision costs skip timestep 0 (``cost_functions.py:244``); goal field
  costs use only the final timestep (``cost_functions.py:305``).

Each cost also exposes ``gn_contrib`` returning its Gauss-Newton normal-
equation contribution in *structured* form (per-timestep diagonal blocks +
gradient), consumed by the GPMP planner's block-tridiagonal solver — the
TPU-native replacement for the reference's dense ``A, b, K`` assembly
(``cost_functions.py:60-85``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.costs.factors import gp_error, quadratic_cost, unary_error
from stoch_gpmp_tpu.gp.lift import phi_matrix, q_inv_block, unary_weight


@struct.dataclass
class GNContrib:
    """One cost's contribution to the Gauss-Newton normal equations, in
    block-structured form: ``J^T K J ~ (diag, lower)`` block-tridiagonal
    pieces and ``g = A^T K b`` (with the reference's ``A = -dE/dx`` sign
    convention, see ``costs/factors.py``).

    ``diag``: ``[..., T, d, d]`` or None; ``lower``: ``[..., T-1, d, d]`` or
    None; ``g``: ``[..., T, d]``.
    """

    diag: jnp.ndarray | None
    lower: jnp.ndarray | None
    g: jnp.ndarray


class Cost:
    """Protocol-ish base. Subclasses are flax.struct dataclasses."""

    def __call__(self, trajs, **kwargs):
        """Call-through to eval (reference ``cost_functions.py:20-21``)."""
        return self.eval(trajs, **kwargs)

    def eval(self, trajs, x_trajs=None, observation=None):  # pragma: no cover
        raise NotImplementedError

    def gn_contrib(self, trajs, x_trajs=None, observation=None):  # pragma: no cover
        raise NotImplementedError


@struct.dataclass
class CostGP(Cost):
    """Start-anchor + GP smoothness cost (reference ``cost_functions.py:88-168``).

    ``cost = e_0^T K_s e_0 + sum_t e_t^T Q^{-1} e_t`` with ``e_0 = start - x_0``
    and ``e_t = x_{t+1} - Phi x_t``.
    """

    start_state: jnp.ndarray  # [d]
    k_start: jnp.ndarray  # [d, d]
    q_inv: jnp.ndarray  # [d, d]
    phi: jnp.ndarray  # [d, d]

    @classmethod
    def create(cls, n_dof, traj_len, start_state, dt, sigma_params, dtype=jnp.float32):
        del traj_len  # shape-free; kept for reference API parity
        d = 2 * n_dof
        return cls(
            start_state=jnp.asarray(start_state, dtype=dtype),
            k_start=unary_weight(d, sigma_params["sigma_start"], dtype=dtype),
            q_inv=q_inv_block(n_dof, dt, sigma=sigma_params["sigma_gp"], dtype=dtype),
            phi=phi_matrix(n_dof, dt, dtype=dtype),
        )

    def eval(self, trajs, x_trajs=None, observation=None):
        err0 = unary_error(trajs[..., 0, :], self.start_state)
        start_costs = quadratic_cost(err0, self.k_start)
        err = gp_error(trajs, self.phi)
        gp_costs = jnp.sum(quadratic_cost(err, self.q_inv), axis=-1)
        return start_costs + gp_costs

    def supports_planes(self) -> bool:
        return True

    def eval_planes(self, planes, observation=None):
        """``eval`` on per-dim time planes (tuple_d of ``[..., T]``) — the
        long-horizon layout: no ``[.., T, d]`` materialization (its d-wide
        minor dim pads up to 32x on TPU tiles), no batched tiny matmuls."""
        d = len(planes)
        err0 = [self.start_state[i] - planes[i][..., 0] for i in range(d)]
        start = None
        for i in range(d):
            fi = sum(self.k_start[i, j] * err0[j] for j in range(d))
            term = err0[i] * fi
            start = term if start is None else start + term
        e = [
            planes[i][..., 1:]
            - sum(self.phi[i, j] * planes[j][..., :-1] for j in range(d))
            for i in range(d)
        ]
        gp = None
        for i in range(d):
            fi = sum(self.q_inv[i, j] * e[j] for j in range(d))
            term = jnp.sum(e[i] * fi, axis=-1)
            gp = term if gp is None else gp + term
        return start + gp

    def gn_contrib(self, trajs, x_trajs=None, observation=None):
        t = trajs.shape[-2]
        d = trajs.shape[-1]
        dtype = trajs.dtype
        # Constant structured J^T K J: identical to the prior precision blocks.
        pqp = self.phi.T @ self.q_inv @ self.phi
        diag = jnp.tile(self.q_inv + pqp, (t, 1, 1))
        diag = diag.at[0].set(self.k_start + pqp)
        diag = diag.at[t - 1].set(self.q_inv)
        lower = jnp.tile(-(self.q_inv @ self.phi), (t - 1, 1, 1))
        diag = jnp.broadcast_to(diag, trajs.shape[:-2] + (t, d, d))
        lower = jnp.broadcast_to(lower, trajs.shape[:-2] + (t - 1, d, d))
        # g: start row (A = +I on block 0) and GP rows (A = (+Phi, -I)).
        err0 = unary_error(trajs[..., 0, :], self.start_state)
        err = gp_error(trajs, self.phi)  # [..., T-1, d]
        qe = jnp.einsum("ij,...tj->...ti", self.q_inv, err)
        g = jnp.zeros_like(trajs)
        g = g.at[..., 0, :].add(jnp.einsum("ij,...j->...i", self.k_start, err0))
        g = g.at[..., :-1, :].add(jnp.einsum("ji,...tj->...ti", self.phi, qe))
        g = g.at[..., 1:, :].add(-qe)
        return GNContrib(diag=diag, lower=lower, g=g)


@struct.dataclass
class CostGPTrajectory(Cost):
    """GP smoothness only, no start anchor (reference
    ``cost_functions.py:171-218``; its ``get_linear_system`` is unimplemented
    there and likewise unsupported here)."""

    q_inv: jnp.ndarray
    phi: jnp.ndarray

    @classmethod
    def create(cls, n_dof, traj_len, start_state, dt, sigma_params, dtype=jnp.float32):
        del traj_len, start_state
        return cls(
            q_inv=q_inv_block(n_dof, dt, sigma=sigma_params["sigma_gp"], dtype=dtype),
            phi=phi_matrix(n_dof, dt, dtype=dtype),
        )

    def eval(self, trajs, x_trajs=None, observation=None):
        err = gp_error(trajs, self.phi)
        return jnp.sum(quadratic_cost(err, self.q_inv), axis=-1)

    def gn_contrib(self, trajs, x_trajs=None, observation=None):
        raise NotImplementedError("reference parity: no linear system for this cost")


@struct.dataclass
class CostGoalPrior(Cost):
    """Per-goal quadratic anchor on the final state (reference
    ``cost_functions.py:340-405``), vectorized over goals.

    The batch must be goal-major: ``batch = num_goals * per_goal``. Unlike the
    reference — whose ``eval`` hardcodes ``num_particles_per_goal*num_samples``
    as the per-goal batch (``cost_functions.py:379-380``, the API trap noted in
    SURVEY.md §7) — any batch size divisible by ``num_goals`` works.
    """

    multi_goal_states: jnp.ndarray  # [G, d]
    k_goal: jnp.ndarray  # [d, d]
    num_goals: int = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls, n_dof, traj_len, multi_goal_states, sigma_goal_prior, dtype=jnp.float32, **kw
    ):
        del traj_len, kw
        goals = jnp.asarray(multi_goal_states, dtype=dtype)
        return cls(
            multi_goal_states=goals,
            k_goal=unary_weight(2 * n_dof, sigma_goal_prior, dtype=dtype),
            num_goals=goals.shape[0],
        )

    def eval(self, trajs, x_trajs=None, observation=None):
        batch = trajs.shape[0]
        t, d = trajs.shape[-2], trajs.shape[-1]
        x_final = trajs[..., -1, :].reshape(self.num_goals, -1, d)
        err = unary_error(x_final, self.multi_goal_states[:, None])
        return quadratic_cost(err, self.k_goal).reshape(batch)

    def supports_planes(self) -> bool:
        return True

    def eval_planes(self, planes, observation=None):
        """Plane-layout ``eval``: goal-major grouping on the leading axis of
        ``[..., T]`` planes (same contract as ``eval``'s flat batch)."""
        d = len(planes)
        batch_shape = planes[0].shape[:-1]
        g = self.num_goals
        err = [
            self.multi_goal_states[:, i].reshape(
                (g,) + (1,) * len(batch_shape)
            )
            - planes[i][..., -1].reshape((g, -1) + batch_shape[1:])
            for i in range(d)
        ]
        out = None
        for i in range(d):
            fi = sum(self.k_goal[i, j] * err[j] for j in range(d))
            term = err[i] * fi
            out = term if out is None else out + term
        return out.reshape(batch_shape)

    def gn_contrib(self, trajs, x_trajs=None, observation=None):
        batch = trajs.shape[0]
        t, d = trajs.shape[-2], trajs.shape[-1]
        x_final = trajs[..., -1, :].reshape(self.num_goals, -1, d)
        err = unary_error(x_final, self.multi_goal_states[:, None])  # [G, B/G, d]
        g = jnp.zeros_like(trajs)
        g = g.at[..., -1, :].set(
            jnp.einsum("ij,...j->...i", self.k_goal, err).reshape(batch, d)
        )
        diag = jnp.zeros(trajs.shape[:-2] + (t, d, d), dtype=trajs.dtype)
        diag = diag.at[..., -1, :, :].set(self.k_goal)
        return GNContrib(diag=diag, lower=None, g=g)


@struct.dataclass
class CostCollision(Cost):
    """Obstacle cost via a distance field over a timestep slice (default
    ``1..T-1``, reference ``cost_functions.py:221-279``); the field is
    evaluated on FK link poses when available, otherwise on configuration
    positions. ``traj_range`` generalizes the slice like the reference's
    standalone ``FieldFactor`` (``field_factor.py:10-15``)."""

    field: Any
    sigma_coll: float = struct.field(pytree_node=False)
    n_dof: int = struct.field(pytree_node=False)
    traj_range: tuple = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, n_dof, traj_len, field, sigma_coll, traj_range=None, **kw):
        if traj_range is None:
            traj_range = (1, traj_len)
        del kw
        return cls(
            field=field, sigma_coll=sigma_coll, n_dof=n_dof,
            traj_range=tuple(traj_range),
        )

    def _slice(self):
        return slice(1, None) if self.traj_range is None else slice(*self.traj_range)

    def _field_errors(self, trajs, x_trajs, observation):
        obs = observation or {}
        spheres = obs.get("obstacle_spheres", None)
        sl = self._slice()
        if x_trajs is not None:
            states = x_trajs[:, sl]
            return self.field.compute_cost(states, obstacle_spheres=spheres)
        states = trajs[:, sl, : self.n_dof]
        return self.field.compute_cost(states, obstacle_spheres=spheres)

    def eval(self, trajs, x_trajs=None, observation=None):
        err = self._field_errors(trajs, x_trajs, observation)  # [B, T-1]
        k = 1.0 / (self.sigma_coll**2)
        return k * jnp.sum(err, axis=-1)

    def supports_planes(self) -> bool:
        return hasattr(self.field, "compute_cost_planes")

    def eval_planes(self, planes, observation=None):
        """Plane-layout ``eval`` for 2D coordinate fields: positions are the
        first two planes; the field evaluates on them directly (long-horizon
        pipeline, no ``[.., T, d]`` materialization)."""
        vals = self.field.compute_cost_planes(planes[0], planes[1])
        sl = self._slice()
        k = 1.0 / (self.sigma_coll**2)
        return k * jnp.sum(vals[..., sl], axis=-1)

    def supports_dof_planes(self) -> bool:
        return self.n_dof == 2 and hasattr(self.field, "compute_cost_planes")

    def eval_dof_planes(self, x_planes, observation=None):
        """Dof-plane-layout ``eval`` for 2D coordinate fields: ``x_planes``
        is ``[d, B, 2T]`` with position lanes ``:T`` per dof — the field
        evaluates on the two position planes directly (the d<=8 dof
        dense-apply A/B path; equal to ``eval`` on the same batch,
        tested)."""
        t = x_planes.shape[-1] // 2
        vals = self.field.compute_cost_planes(
            x_planes[0, :, :t], x_planes[1, :, :t]
        )
        sl = self._slice()
        k = 1.0 / (self.sigma_coll**2)
        return k * jnp.sum(vals[..., sl], axis=-1)

    def gn_contrib(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        # H_t = -d e_t / d q_t (position dims only), reference
        # field_factor.py:34-38 via autograd -> jax.grad here. When the field
        # operates on link poses, the gradient flows through FK (fk_trajs).
        t, d = trajs.shape[-2], trajs.shape[-1]
        k = 1.0 / (self.sigma_coll**2)

        def total_err(tr):
            x = fk_trajs(tr) if fk_trajs is not None else None
            return jnp.sum(self._field_errors(tr, x, observation))

        sl = self._slice()
        err = self._field_errors(trajs, x_trajs, observation)  # [B, range]
        grad_q = -jax.grad(total_err)(trajs)[..., sl, : self.n_dof]
        h = jnp.zeros(trajs.shape[:-1] + (d,), dtype=trajs.dtype)
        h = h.at[..., sl, : self.n_dof].set(grad_q)  # [B, T, d]
        # Rank-1 per-step: J^T K J diag block = K h h^T; g = K h e.
        diag = k * jnp.einsum("...ti,...tj->...tij", h, h)
        err_full = jnp.zeros(trajs.shape[:-1], dtype=trajs.dtype)
        err_full = err_full.at[..., sl].set(err)
        g = k * h * err_full[..., None]
        return GNContrib(diag=diag, lower=None, g=g)

    def gn_rank1(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        """Rank-1 structure of this cost's GN contribution: per timestep the
        diag-block is ``k h_t h_t^T`` and the gradient is ``k h_t e_t``.
        Returns ``(h [B, T, n_dof], e [B, T], k)`` — positions only (the
        velocity components of the field Jacobian are zero). Consumed by the
        GPMP Woodbury fast path (planners/gpmp.py)."""
        k = 1.0 / (self.sigma_coll**2)

        def total_err(tr):
            x = fk_trajs(tr) if fk_trajs is not None else None
            return jnp.sum(self._field_errors(tr, x, observation))

        sl = self._slice()
        t = trajs.shape[-2]
        err = self._field_errors(trajs, x_trajs, observation)
        grad_q = -jax.grad(total_err)(trajs)[..., sl, : self.n_dof]
        h = jnp.zeros(trajs.shape[:-2] + (t, self.n_dof), dtype=trajs.dtype)
        h = h.at[..., sl, :].set(grad_q)
        e = jnp.zeros(trajs.shape[:-2] + (t,), dtype=trajs.dtype)
        e = e.at[..., sl].set(err)
        return h, e, k


@struct.dataclass
class CostGoal(Cost):
    """Field-based terminal cost on the final timestep only (reference
    ``cost_functions.py:282-337``); used for SE(3) end-effector targets."""

    field: Any
    sigma_goal: float = struct.field(pytree_node=False)
    n_dof: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, n_dof, traj_len, field, sigma_goal, **kw):
        del traj_len, kw
        return cls(field=field, sigma_goal=sigma_goal, n_dof=n_dof)

    def _field_error(self, trajs, x_trajs, observation):
        if x_trajs is not None:
            return self.field.compute_cost(x_trajs[:, -1])
        return self.field.compute_cost(trajs[:, -1, : self.n_dof])

    def eval(self, trajs, x_trajs=None, observation=None):
        err = self._field_error(trajs, x_trajs, observation)  # [B]
        k = 1.0 / (self.sigma_goal**2)
        return k * err

    def gn_contrib(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        t, d = trajs.shape[-2], trajs.shape[-1]
        k = 1.0 / (self.sigma_goal**2)

        def total_err(tr):
            x = fk_trajs(tr) if fk_trajs is not None else None
            return jnp.sum(self._field_error(tr, x, observation))

        err = self._field_error(trajs, x_trajs, observation)  # [B]
        grad_q = -jax.grad(total_err)(trajs)[..., -1, : self.n_dof]
        h = jnp.zeros(trajs.shape[:-1] + (d,), dtype=trajs.dtype)
        h = h.at[..., -1, : self.n_dof].set(grad_q)
        diag = k * jnp.einsum("...ti,...tj->...tij", h, h)
        g = k * h * jnp.zeros(trajs.shape[:-1], dtype=trajs.dtype).at[..., -1].set(err)[..., None]
        return GNContrib(diag=diag, lower=None, g=g)

    def gn_rank1(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        """Rank-1 GN structure (see ``CostCollision.gn_rank1``): one active
        column at the final timestep."""
        k = 1.0 / (self.sigma_goal**2)

        def total_err(tr):
            x = fk_trajs(tr) if fk_trajs is not None else None
            return jnp.sum(self._field_error(tr, x, observation))

        t = trajs.shape[-2]
        err = self._field_error(trajs, x_trajs, observation)  # [B]
        grad_q = -jax.grad(total_err)(trajs)[..., -1, : self.n_dof]
        h = jnp.zeros(trajs.shape[:-2] + (t, self.n_dof), dtype=trajs.dtype)
        h = h.at[..., -1, :].set(grad_q)
        e = jnp.zeros(trajs.shape[:-2] + (t,), dtype=trajs.dtype)
        e = e.at[..., -1].set(err)
        return h, e, k


@struct.dataclass
class CostComposite(Cost):
    """Sums child costs, computing FK once per evaluation and sharing the
    link poses with every child (reference ``cost_functions.py:32-85``)."""

    costs: tuple
    n_dof: int = struct.field(pytree_node=False)
    traj_len: int = struct.field(pytree_node=False)
    fk: Callable | None = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, n_dof, traj_len, cost_list: Sequence[Cost], fk=None):
        return cls(costs=tuple(cost_list), n_dof=n_dof, traj_len=traj_len, fk=fk)

    def supports_planes(self) -> bool:
        """True when every child evaluates on per-dim time planes (the
        long-horizon plane-layout fast path; FK-based stacks do not)."""
        return self.fk is None and all(
            getattr(c, "supports_planes", lambda: hasattr(c, "eval_planes"))()
            for c in self.costs
        )

    def eval_planes(self, planes, observation=None):
        """Sum of child costs on per-dim time planes ``tuple_d of [..., T]``
        (requires ``supports_planes()``)."""
        total = None
        for c in self.costs:
            v = c.eval_planes(planes, observation=observation)
            total = v if total is None else total + v
        return total

    def supports_dof_planes(self) -> bool:
        """True when every child evaluates on dof-LEADING plane-major state
        ``[d, B, 2T]`` (the dof-factored fast path, gp/dof_factored.py)."""
        return self.fk is None and all(
            getattr(c, "supports_dof_planes", lambda: hasattr(c, "eval_dof_planes"))()
            for c in self.costs
        )

    def eval_dof_planes(self, x_planes, observation=None):
        """Sum of child costs on the dof-factored batch ``[d, B, 2T]``
        (requires ``supports_dof_planes()``)."""
        total = None
        for c in self.costs:
            v = c.eval_dof_planes(x_planes, observation=observation)
            total = v if total is None else total + v
        return total

    def _fk_trajs(self, trajs):
        if self.fk is None:
            return None
        batch = trajs.shape[0]
        q = trajs.reshape(-1, trajs.shape[-1])[:, : self.n_dof]
        out = self.fk(q)
        if hasattr(out, "positions"):  # compact LinkState (chain.fk_compact)
            return out.reshape(batch, self.traj_len)
        return out.reshape(batch, self.traj_len, -1, 4, 4)

    def eval(self, trajs, x_trajs=None, observation=None):
        trajs = trajs.reshape(-1, self.traj_len, 2 * self.n_dof)
        if x_trajs is None:
            x_trajs = self._fk_trajs(trajs)
        total = jnp.zeros(trajs.shape[0], dtype=trajs.dtype)
        for cost in self.costs:
            total = total + cost.eval(trajs, x_trajs=x_trajs, observation=observation)
        return total

    def gn_contrib(self, trajs, x_trajs=None, observation=None):
        trajs = trajs.reshape(-1, self.traj_len, 2 * self.n_dof)
        if x_trajs is None:
            x_trajs = self._fk_trajs(trajs)
        t, d = self.traj_len, 2 * self.n_dof
        diag = jnp.zeros(trajs.shape[:-2] + (t, d, d), dtype=trajs.dtype)
        lower = jnp.zeros(trajs.shape[:-2] + (t - 1, d, d), dtype=trajs.dtype)
        g = jnp.zeros_like(trajs)
        fk_trajs = self._fk_trajs if self.fk is not None else None
        for cost in self.costs:
            if isinstance(cost, (CostGoal, CostCollision)):
                c = cost.gn_contrib(
                    trajs, x_trajs=x_trajs, observation=observation, fk_trajs=fk_trajs
                )
            else:
                c = cost.gn_contrib(trajs, x_trajs=x_trajs, observation=observation)
            if c.diag is not None:
                diag = diag + c.diag
            if c.lower is not None:
                lower = lower + c.lower
            g = g + c.g
        return GNContrib(diag=diag, lower=lower, g=g)
