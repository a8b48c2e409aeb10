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
import numpy as np
from flax import struct

from stoch_gpmp_tpu.gp.prior import make_gp_prior
from stoch_gpmp_tpu.gp.tridiag import BlockTridiag


@struct.dataclass
class GPMPState:
    particle_means: jnp.ndarray  # [P, T, d]
    key: jax.Array


@struct.dataclass
class WoodburyGN:
    """Constant pieces of the parallel-in-time Woodbury GN solve.

    The GN normal matrix splits as ``H = H0 + U D U^T`` where
    ``H0 = A_quad + delta I`` is the (particle-independent, per-dof-decoupled
    — gp/dof_factored.py) quadratic part and the field costs contribute ONE
    rank-1 term per (cost, timestep): column ``u_r = e_{t_r} (x) h_r`` with
    weight ``k_r`` (``Cost*.gn_rank1``). Woodbury then solves every
    particle's system with NO sequential-over-T factorization:

        x = H0i g - H0i U (D^{-1} + U^T H0i U)^{-1} U^T H0i g

    — per-dof ``[.., 2T] @ [2T, 2T]`` MXU matmuls plus one batched
    ``[P, R, R]`` Cholesky (R = n_fields * T). ``H0i`` is inverted once at
    build time in float64 on the host (H0's condition number ~1e8-1e10 from
    the 1/sigma^2 anchor weights makes an f32 inverse meaningless;
    SURVEY.md §7 'f32-stable prior factorization').
    """

    h0i: jnp.ndarray  # [2T, 2T] per-dof (A_dof + delta I)^{-1}, symmetric
    a_dof: jnp.ndarray  # [2T, 2T]
    b_planes: jnp.ndarray  # [G, n_dof, 2T]
    dq: Any  # DofQuadraticCost — stencil-form gradient (TPU-exact)
    wpp_tiled: jnp.ndarray  # [R, R] = tile(h0i[:T, :T], (nf, nf))
    cdiag: jnp.ndarray  # [R] capacitance diagonal 1/k_r
    num_goals: int = struct.field(pytree_node=False)
    n_dof: int = struct.field(pytree_node=False)
    traj_len: int = struct.field(pytree_node=False)
    n_fields: int = struct.field(pytree_node=False)


def build_woodbury(cost: Any, delta: float) -> WoodburyGN | None:
    """Classify a ``CostComposite``'s children and build the Woodbury model;
    returns None when the stack doesn't decompose (non-isotropic quadratics
    or a child without rank-1 GN structure)."""
    from stoch_gpmp_tpu.costs.costs import CostGP, CostGoalPrior
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.gp.dof_factored import DofQuadraticCost

    gp = goal_prior = dq = None
    fields = []
    for c in getattr(cost, "costs", ()):
        if isinstance(c, QuadraticCost):
            dq = c.dof_form
            if dq is None:
                return None
        elif isinstance(c, CostGP):
            gp = c
        elif isinstance(c, CostGoalPrior):
            goal_prior = c
        elif hasattr(c, "gn_rank1"):
            fields.append(c)
        else:
            return None
    if dq is None:
        if gp is None:
            return None
        try:
            dq = DofQuadraticCost.from_gp_and_goal_prior(
                gp, goal_prior, cost.traj_len
            )
        except ValueError:
            return None
    t = cost.traj_len
    dtype = dq.a_dof.dtype
    h0 = np.asarray(dq.a_dof, np.float64) + delta * np.eye(2 * t)
    h0i = np.linalg.inv(h0)
    h0i = 0.5 * (h0i + h0i.T)
    nf = len(fields)
    wpp = h0i[:t, :t]
    wpp_tiled = np.tile(wpp, (max(nf, 1), max(nf, 1)))
    cdiag = np.concatenate(
        [np.full(t, c.sigma_coll**2 if hasattr(c, "sigma_coll")
                 else c.sigma_goal**2) for c in fields]
    ) if nf else np.zeros(0)
    return WoodburyGN(
        h0i=jnp.asarray(h0i, dtype=dtype),
        a_dof=dq.a_dof,
        b_planes=dq.b_planes,
        dq=dq,
        wpp_tiled=jnp.asarray(wpp_tiled, dtype=dtype),
        cdiag=jnp.asarray(cdiag, dtype=dtype),
        num_goals=dq.num_goals,
        n_dof=dq.n_dof,
        traj_len=t,
        n_fields=nf,
    )


def gpmp_step_woodbury(
    wb: WoodburyGN,
    cost: Any,
    state: GPMPState,
    observation: dict,
    *,
    step_size: float = 1.0,
    shard_particles=None,
) -> GPMPState:
    """One GN update via the Woodbury split — parallel in time (no
    sequential-over-T factorization; see ``WoodburyGN``). Exactly equal to
    ``gpmp_step(method='cholesky')`` up to float rounding (tested)."""
    from stoch_gpmp_tpu.gp.dof_factored import from_dof_planes, to_dof_planes

    means = state.particle_means
    if shard_particles is not None:
        means = shard_particles(means)
    p, t, d2 = means.shape
    nd = d2 // 2
    t2 = 2 * t

    trajs = means
    x_trajs = cost._fk_trajs(trajs) if cost.fk is not None else None
    fk_trajs = cost._fk_trajs if cost.fk is not None else None
    field_costs = [c for c in cost.costs if hasattr(c, "gn_rank1")]

    # Everything dense below runs at Precision.HIGHEST: the [2T, 2T]/[R, R]
    # matmuls are tiny, and the default single-pass-bf16 MXU error is enough
    # to destabilize the solve (divergence measured on v5e at the planar
    # sigmas before the round-3 stencil/precision fix).
    hp = jax.lax.Precision.HIGHEST

    mu_planes = to_dof_planes(means)  # [nd, P, 2T] (dof-leading)
    if wb.dq is not None and wb.dq.q_i2 is not None:
        # b - A mu in factor-graph residual form — exact on TPU (the dense
        # form cancels two ~|A|*|mu| quantities through the MXU).
        g_planes = wb.dq.grad_dof_planes(mu_planes)
    else:  # legacy pytrees without stencil params
        bg = jnp.transpose(
            jnp.repeat(wb.b_planes, p // wb.num_goals, axis=0), (1, 0, 2)
        )  # [nd, P, 2T]
        g_planes = bg - jnp.matmul(
            mu_planes.reshape(-1, t2), wb.a_dof, precision=hp
        ).reshape(nd, p, t2)

    if wb.n_fields:
        hs, gs_pos = [], None
        for c in field_costs:
            h, e, k = c.gn_rank1(
                trajs, x_trajs=x_trajs, observation=observation,
                fk_trajs=fk_trajs,
            )  # h [P, T, nd], e [P, T]
            hs.append(h)
            term = k * h * e[..., None]  # [P, T, nd]
            gs_pos = term if gs_pos is None else gs_pos + term
        g_planes = g_planes.at[..., :t].add(
            jnp.transpose(gs_pos, (2, 0, 1))
        )
        h_all = jnp.concatenate(hs, axis=1)  # [P, R, nd], R = nf*T

    y0 = jnp.matmul(
        g_planes.reshape(-1, t2), wb.h0i, precision=hp
    ).reshape(nd, p, t2)

    if wb.n_fields:
        nf = wb.n_fields
        gram = jnp.einsum("pri,psi->prs", h_all, h_all, precision=hp)
        c_mat = gram * wb.wpp_tiled + jnp.diag(wb.cdiag)
        y0p_tiled = jnp.tile(y0[..., :t], (1, 1, nf))  # [nd, P, R]
        rhs = jnp.einsum("pri,ipr->pr", h_all, y0p_tiled, precision=hp)
        # Jacobi-equilibrate the capacitance before factorizing: rows where
        # the field gradient vanishes sit at the bare cdiag floor (~1e-10)
        # while active rows reach ~1e4 — and XLA's BLOCKED Cholesky /
        # triangular_solve run their internal matmuls at default precision,
        # which at R >= 1024 turns that spread into an indefinite factor
        # (NaNs measured on v5e at T=1024). Scaling to unit diagonal plus
        # HIGHEST-precision internals keeps the factorization exact.
        s = jax.lax.rsqrt(jnp.einsum("prr->pr", c_mat))  # [P, R]
        c_scaled = c_mat * s[:, :, None] * s[:, None, :]
        with jax.default_matmul_precision("highest"):
            chol = jnp.linalg.cholesky(c_scaled)
            z = jax.lax.linalg.triangular_solve(
                chol, (rhs * s)[..., None], left_side=True, lower=True,
            )
            z = jax.lax.linalg.triangular_solve(
                chol, z, left_side=True, lower=True, transpose_a=True,
            )[..., 0]  # [P, R]
        z = z * s
        zw = z.reshape(p, nf, t)
        h_resh = h_all.reshape(p, nf, t, nd)
        uz_pos = jnp.einsum(
            "pft,pfti->ipt", zw, h_resh, precision=hp
        )  # [nd, P, T]
        uz = jnp.zeros_like(y0).at[..., :t].set(uz_pos)
        x = y0 - jnp.matmul(
            uz.reshape(-1, t2), wb.h0i, precision=hp
        ).reshape(nd, p, t2)
    else:
        x = y0

    d_theta = from_dof_planes(x)
    if shard_particles is not None:
        d_theta = shard_particles(d_theta)
    return state.replace(particle_means=means + step_size * d_theta)


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
    woodbury: WoodburyGN | None = None,
) -> GPMPState:
    """``opt_iters`` Gauss-Newton updates under ``lax.scan``.

    ``method='woodbury'`` (requires ``woodbury=build_woodbury(cost, delta)``,
    built outside jit) runs the parallel-in-time solve — equal to 'cholesky'
    up to rounding, with no sequential-over-T factorization per iteration."""

    if method == "woodbury":
        if woodbury is None:
            raise ValueError(
                "method='woodbury' needs woodbury=build_woodbury(cost, delta)"
            )
        if trust_region:
            raise ValueError(
                "woodbury path supports trust_region=False only (the "
                "trust-region damping re-dampens H0 per iteration)"
            )

        def wb_body(carry, _):
            return (
                gpmp_step_woodbury(
                    woodbury, cost, carry, observation,
                    step_size=step_size, shard_particles=shard_particles,
                ),
                None,
            )

        state, _ = jax.lax.scan(wb_body, state, None, length=opt_iters)
        return state

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
        mesh=None,
        **kwargs,
    ):
        # mesh: a jax.sharding.Mesh with ('p', 's') axes — optimize() then
        # shards the per-particle GN solves over 'p' (the trust-region
        # damping's particle-mean reduction all-reduces across the mesh).
        self.mesh = mesh
        self._sharded_cache: dict = {}
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
        if self.mesh is not None:
            from stoch_gpmp_tpu.parallel import shard_gpmp_state

            self.state = shard_gpmp_state(self.mesh, self.state)
            self._sharded_cache.clear()

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
        # woodbury fast path: constant model built once outside jit
        self._wb = None
        if self.solver_params.get("method") == "woodbury":
            self._wb = build_woodbury(
                self.cost, float(self.solver_params["delta"])
            )
            if self._wb is None:
                raise ValueError(
                    "cost stack does not decompose for method='woodbury' "
                    "(need isotropic quadratics + rank-1 field costs)"
                )

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
        if self.mesh is not None:
            # every static the unsharded path reads fresh per call keys the
            # cache, so mutating solver_params/step_size between calls
            # behaves identically in both modes
            key = (iters, float(self.solver_params["delta"]),
                   bool(self.solver_params["trust_region"]),
                   self.solver_params["method"], self.step_size)
            if key not in self._sharded_cache:
                from stoch_gpmp_tpu.parallel import make_sharded_gpmp_optimize

                self._sharded_cache[key] = make_sharded_gpmp_optimize(
                    self.mesh, opt_iters=iters,
                    delta=float(self.solver_params["delta"]),
                    trust_region=bool(self.solver_params["trust_region"]),
                    method=self.solver_params["method"],
                    step_size=self.step_size, woodbury=self._wb,
                )
            self.state = self._sharded_cache[key](
                self.cost, self.state, observation
            )
        else:
            self.state = self._jit_optimize(
                self.cost,
                self.state,
                observation,
                opt_iters=iters,
                delta=float(self.solver_params["delta"]),
                trust_region=bool(self.solver_params["trust_region"]),
                method=self.solver_params["method"],
                step_size=self.step_size,
                woodbury=self._wb,
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
