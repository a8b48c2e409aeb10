"""GPMP: deterministic Gauss-Newton trajectory optimization.

Capability parity with the reference ``GPMP`` (``stoch_gpmp/planner.py:352-
661``), redesigned around structure: the reference assembles a dense
``A [B, rows, M]``, ``K [B, rows, rows]`` (``cost_functions.py:60-85``), forms
``J^T K J`` densely (O(M^2 rows)) and solves an ``M x M`` dense system per
particle per iteration (``planner.py:600-633``). Here every factor contributes
its normal-equation blocks directly in block-tridiagonal form
(``costs.gn_contrib``), and the damped system is factorized and solved with
the O(T d^3) structured Cholesky — per-particle, batched with ``vmap``, the
whole iteration loop under ``lax.scan``.

Reference semantics preserved (SURVEY.md §7 quirk list):
- damping ``J^T J + delta * I`` (``planner.py:609-610``);
- the trust-region branch's second-assignment-wins behavior
  (``planner.py:612-615``): the effective system is
  ``A^T K A + delta * Diag(diag(mean_over_particles(A^T K A)))``;
- update ``means += step_size * d_theta`` (``planner.py:595``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.gp.prior import make_gp_prior
from stoch_gpmp_tpu.gp.tridiag import BlockTridiag


@struct.dataclass
class GPMPState:
    particle_means: jnp.ndarray  # [P, T, d]
    key: jax.Array


def _solve_structured(diag, lower, g):
    """Solve one particle's block-tridiagonal system H x = g."""
    bt = BlockTridiag(diag=diag, lower=lower)
    return bt.cholesky().solve(g)


def gpmp_step(
    cost: Any,
    state: GPMPState,
    observation: dict,
    *,
    delta: float,
    trust_region: bool,
    method: str = "cholesky",
    step_size: float = 1.0,
    shard_particles=None,
) -> GPMPState:
    """One Gauss-Newton update of all particle means. Pure function.

    ``shard_particles``: optional callable applying a leading-axis (particle)
    sharding constraint to an array — pins the per-particle linearization and
    structured solves to the ``p`` mesh axis (see ``parallel/sharding.py``) so
    GSPMD cannot silently replicate the GN path.
    """
    means = state.particle_means
    if shard_particles is not None:
        means = shard_particles(means)
    p, t, d = means.shape
    contrib = cost.gn_contrib(means, observation=observation)
    diag, lower, g = contrib.diag, contrib.lower, contrib.g  # [P,T,d,d],[P,T-1,d,d],[P,T,d]
    if shard_particles is not None:
        diag, lower, g = map(shard_particles, (diag, lower, g))

    eye = jnp.eye(d, dtype=means.dtype)
    if not trust_region:
        diag = diag + delta * eye
    else:
        # reference planner.py:612-615 — second assignment wins: damping by
        # the particle-averaged diagonal of J^T K J.
        mean_diag = jnp.diagonal(diag.mean(axis=0), axis1=-2, axis2=-1)  # [T, d]
        diag = diag + delta * mean_diag[..., None] * eye

    if method == "cholesky":
        d_theta = jax.vmap(_solve_structured)(diag, lower, g)
    elif method == "inverse":
        # dense fallback (reference 'inverse' path, planner.py:624-625)
        def dense_solve(dg, lo, gv):
            h = BlockTridiag(diag=dg, lower=lo).to_dense()
            return jnp.linalg.solve(h, gv.reshape(-1)).reshape(t, d)

        d_theta = jax.vmap(dense_solve)(diag, lower, g)
    else:
        raise ValueError(f"unknown solve method: {method}")
    if shard_particles is not None:
        d_theta = shard_particles(d_theta)

    return state.replace(particle_means=means + step_size * d_theta)


def gpmp_optimize(
    cost: Any,
    state: GPMPState,
    observation: dict,
    *,
    opt_iters: int,
    delta: float,
    trust_region: bool,
    method: str = "cholesky",
    step_size: float = 1.0,
    shard_particles=None,
) -> GPMPState:
    """``opt_iters`` Gauss-Newton updates under ``lax.scan``."""

    def body(carry, _):
        return (
            gpmp_step(
                cost,
                carry,
                observation,
                delta=delta,
                trust_region=trust_region,
                method=method,
                step_size=step_size,
                shard_particles=shard_particles,
            ),
            None,
        )

    state, _ = jax.lax.scan(body, state, None, length=opt_iters)
    return state


class GPMP:
    """Stateful wrapper with the reference's API surface
    (``planner.py:352-661``)."""

    def __init__(
        self,
        num_particles_per_goal,
        traj_len,
        opt_iters,
        dt=None,
        n_dof=None,
        step_size=1.0,
        temperature=1.0,
        start_state=None,
        multi_goal_states=None,
        initial_particle_means=None,
        cost=None,
        sigma_start_init=None,
        sigma_start_sample=None,
        sigma_goal_init=None,
        sigma_goal_sample=None,
        sigma_gp_init=None,
        sigma_gp_sample=None,
        solver_params=None,
        seed: int = 0,
        dtype=jnp.float32,
        **kwargs,
    ):
        self.n_dof = n_dof
        self.d_state_opt = 2 * n_dof
        self.dt = dt
        self.traj_len = traj_len
        self.goal_directed = multi_goal_states is not None
        self.num_goals = multi_goal_states.shape[0] if self.goal_directed else 1
        self.num_particles_per_goal = num_particles_per_goal
        self.num_particles = num_particles_per_goal * self.num_goals
        self.opt_iters = opt_iters
        self.step_size = step_size
        self.temperature = temperature
        self.sigma_start_init = sigma_start_init
        self.sigma_start_sample = sigma_start_sample
        self.sigma_goal_init = sigma_goal_init
        self.sigma_goal_sample = sigma_goal_sample
        self.sigma_gp_init = sigma_gp_init
        self.sigma_gp_sample = sigma_gp_sample
        self.solver_params = dict(solver_params or {})
        self.solver_params.setdefault("delta", 0.0)
        self.solver_params.setdefault("trust_region", False)
        self.solver_params.setdefault("method", "cholesky")
        self.cost = cost
        self.dtype = dtype
        self._key = jax.random.PRNGKey(seed)

        self.reset(start_state, multi_goal_states, initial_particle_means)

    def reset(self, start_state=None, multi_goal_states=None, initial_particle_means=None):
        if start_state is not None:
            self.start_state = jnp.asarray(start_state, dtype=self.dtype)
        if multi_goal_states is not None:
            self.multi_goal_states = jnp.asarray(multi_goal_states, dtype=self.dtype)
        elif not self.goal_directed:
            self.multi_goal_states = None
        goals = self.multi_goal_states if self.goal_directed else None

        if initial_particle_means is not None:
            means = jnp.asarray(initial_particle_means, dtype=self.dtype)
        else:
            init_prior = make_gp_prior(
                self.n_dof,
                self.traj_len,
                self.dt,
                self.start_state,
                self.sigma_start_init,
                self.sigma_gp_init,
                sigma_goal=self.sigma_goal_init if self.goal_directed else None,
                goal_states=goals,
                dtype=self.dtype,
            )
            self._key, sub = jax.random.split(self._key)
            means = init_prior.sample(sub, self.num_particles_per_goal)
        particle_means = means.reshape(self.num_particles, self.traj_len, self.d_state_opt)
        self.state = GPMPState(particle_means=particle_means, key=self._key)

        # sampling prior kept for sample_trajectories parity
        self._sample_prior = make_gp_prior(
            self.n_dof,
            self.traj_len,
            self.dt,
            self.start_state,
            self.sigma_start_sample,
            self.sigma_gp_sample,
            sigma_goal=self.sigma_goal_sample if self.goal_directed else None,
            goal_states=goals,
            dtype=self.dtype,
        )

        self._jit_optimize = functools.partial(
            jax.jit,
            static_argnames=("opt_iters", "delta", "trust_region", "method", "step_size"),
        )(gpmp_optimize)

    @property
    def particle_means(self):
        return self.state.particle_means

    def optimize(self, opt_iters=None, debug=False, observation=None, **obs_kwargs):
        """Returns ``(velocity_means, position_means, costs)`` matching the
        reference (``planner.py:570-574``; costs here are ``cost.eval`` at the
        final means — the reference's ``b^T K b`` of the last linearization is
        the same quantity for quadratic factors)."""
        observation = dict(observation or {})
        observation.update(obs_kwargs)
        iters = self.opt_iters if opt_iters is None else opt_iters
        self.state = self._jit_optimize(
            self.cost,
            self.state,
            observation,
            opt_iters=iters,
            delta=float(self.solver_params["delta"]),
            trust_region=bool(self.solver_params["trust_region"]),
            method=self.solver_params["method"],
            step_size=self.step_size,
        )
        means = self.state.particle_means
        costs = self.cost.eval(
            means.reshape(self.num_particles, -1), observation=observation
        )
        n = self.n_dof
        return means[..., n:], means[..., :n], costs

    def get_recent_samples(self):
        n = self.n_dof
        means = self.state.particle_means
        return means[..., :n], means[..., n:]

    def sample_trajectories(self, num_samples_per_particle: int):
        self._key, sub = jax.random.split(self._key)
        means = self.state.particle_means
        p, t, d = means.shape
        eps = jax.random.normal(
            sub, (p, num_samples_per_particle, t, d), dtype=means.dtype
        )
        if self._sample_prior.weight_t is not None:
            corr = (
                eps.reshape(p, -1, t * d) @ self._sample_prior.weight_t
            ).reshape(p, -1, t, d)
        else:  # long-horizon mode: structured O(T d^2) backward substitution
            pr = self._sample_prior
            solver = pr.psolver if pr.psolver is not None else pr.chol
            corr = solver.solve_LT(eps)
        samples = means[:, None] + corr
        n = self.n_dof
        return samples[..., :n], samples[..., n:]
