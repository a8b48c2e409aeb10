"""Multi-device sharding on the 8-way virtual CPU mesh (conftest sets
``--xla_force_host_platform_device_count=8``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
from stoch_gpmp_tpu.gp.prior import make_gp_prior
from stoch_gpmp_tpu.parallel import (
    make_mesh,
    make_sharded_optimize,
    shard_planner_state,
)
from stoch_gpmp_tpu.planners import (
    SamplerModel,
    StochGPMPState,
    stoch_gpmp_optimize,
)


def _tiny_problem(num_particles=8, num_samples=4, traj_len=8, dtype=jnp.float32):
    n_dof, dt = 2, 0.05
    d = 2 * n_dof
    start = jnp.zeros(d, dtype=dtype)
    goals = jnp.asarray(
        [[1.0, 1, 0, 0], [1, -1, 0, 0], [-1, 1, 0, 0], [-1, -1, 0, 0]], dtype=dtype
    )
    prior = make_gp_prior(
        n_dof, traj_len, dt, start, 1e-2, 1.0, sigma_goal=1e-2, goal_states=goals,
        dtype=dtype,
    )
    sampler = SamplerModel.from_prior(prior)
    ppg = num_particles // 4
    means = jnp.repeat(prior.means, ppg, axis=0)
    state = StochGPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    cost = CostComposite.create(
        n_dof,
        traj_len,
        [
            CostGP.create(
                n_dof, traj_len, start, dt,
                {"sigma_start": 1e-2, "sigma_gp": 1.0}, dtype=dtype,
            ),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=1e-2, dtype=dtype),
        ],
    )
    return sampler, cost, state, num_samples


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_optimize_matches_single_device():
    sampler, cost, state, num_samples = _tiny_problem()
    kwargs = dict(opt_iters=3, num_samples=num_samples, temperature=1.0, step_size=0.5)

    # single device
    s1, aux1 = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(sa, c, st, ob, **kwargs)
    )(sampler, cost, state, {})

    # 4x2 mesh: particles x samples
    mesh = make_mesh(8, axis_shape=(4, 2))
    sharded = make_sharded_optimize(mesh, **kwargs)
    s2, aux2 = sharded(sampler, cost, shard_planner_state(mesh, state), {})

    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(aux1.costs), np.asarray(aux2.costs), rtol=1e-4, atol=1e-5
    )
    # output really is sharded over the mesh
    assert len(s2.particle_means.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    mesh1 = make_mesh(1)
    assert mesh1.devices.shape == (1, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_gpmp_matches_single_device():
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.parallel import make_sharded_gpmp_optimize, shard_gpmp_state
    from stoch_gpmp_tpu.planners.gpmp import GPMPState, gpmp_optimize

    dtype = jnp.float64
    n_dof, traj_len, dt = 2, 10, 0.05
    start = jnp.zeros(4, dtype=dtype)
    goals = jnp.asarray(
        [[1.0, 1, 0, 0], [1, -1, 0, 0], [-1, 1, 0, 0], [-1, -1, 0, 0]], dtype=dtype
    )
    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt,
                          {"sigma_start": 1e-2, "sigma_gp": 1.0}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=1e-2, dtype=dtype),
        ],
    )
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.standard_normal((8, traj_len, 4)))
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    kwargs = dict(opt_iters=4, delta=1e-2, trust_region=True, step_size=0.5)

    s1 = jax.jit(
        lambda c, st, ob: gpmp_optimize(c, st, ob, **kwargs)
    )(cost, state, {})
    mesh = make_mesh(8, axis_shape=(8, 1))
    run = make_sharded_gpmp_optimize(mesh, **kwargs)
    s2 = run(cost, shard_gpmp_state(mesh, state), {})
    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means),
        rtol=1e-9, atol=1e-10,
    )
    assert len(s2.particle_means.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_long_horizon_pscan_matches_single_device():
    """Long-horizon mode (no dense factor; parallel-in-time associative-scan
    sampler) under the sharded optimize: the pscan solver's plane arrays are
    replicated pytree leaves, samples still shard over (p, s)."""
    sampler, cost, state, num_samples = _tiny_problem(traj_len=12)
    # rebuild the prior in forced long-horizon (structured-only) mode
    prior = make_gp_prior(
        2, 12, 0.05, jnp.zeros(4, jnp.float32), 1e-2, 1.0, sigma_goal=1e-2,
        goal_states=jnp.asarray(
            [[1.0, 1, 0, 0], [1, -1, 0, 0], [-1, 1, 0, 0], [-1, -1, 0, 0]],
            jnp.float32,
        ),
        dtype=jnp.float32, materialize_dense=False,
    )
    sampler = SamplerModel.from_prior(prior)
    assert sampler.weight_t is None and sampler.psolver is not None

    # sample_method="scan" pins BOTH sides to the legacy [P, S, T, d] path:
    # the unsharded default would otherwise take the plane-layout fast path,
    # whose plane-major eps stream differs (valid, but not bit-comparable)
    kwargs = dict(opt_iters=3, num_samples=num_samples, temperature=1.0,
                  step_size=0.5, sample_method="scan")
    s1, aux1 = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(sa, c, st, ob, **kwargs)
    )(sampler, cost, state, {})

    mesh = make_mesh(8, axis_shape=(4, 2))
    sharded = make_sharded_optimize(mesh, **kwargs)
    s2, aux2 = sharded(sampler, cost, shard_planner_state(mesh, state), {})

    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means),
        rtol=1e-5, atol=1e-6,
    )
    assert len(s2.particle_means.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_dof_layout_matches_single_device():
    """make_sharded_optimize(layout='dof'): the dof-factored fast path
    (d=14 Panda regime) shards particles/samples over the mesh and matches
    the single-device dof path."""
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost

    n_dof, t, dt = 14, 128, 0.05
    dtype = jnp.float32
    rng = np.random.default_rng(2)
    start = jnp.asarray(
        np.concatenate([rng.normal(size=n_dof), np.zeros(n_dof)]), dtype
    )
    goals = jnp.asarray(
        np.concatenate([rng.normal(size=(4, n_dof)), np.zeros((4, n_dof))],
                       axis=1), dtype
    )
    gp = CostGP.create(
        n_dof, t, start, dt,
        {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype,
    )
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=1.0, dtype=dtype
    )
    cost = CostComposite.create(
        n_dof, t, [QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)],
        fk=None,
    )
    prior = make_gp_prior(
        n_dof, t, dt, start, 1e-3, 0.1, sigma_goal=0.1, goal_states=goals,
        dtype=dtype,
    )
    sampler = SamplerModel.from_prior(prior)
    means = jnp.repeat(prior.means, 2, axis=0)  # P=8
    state = StochGPMPState(particle_means=means, key=jax.random.PRNGKey(1))
    kwargs = dict(opt_iters=3, num_samples=4, temperature=1.0, step_size=0.3)

    s1, aux1 = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, sample_method="dof", **kwargs
        )
    )(sampler, cost, state, {})

    mesh = make_mesh(8, axis_shape=(4, 2))
    sharded = make_sharded_optimize(mesh, layout="dof", **kwargs)
    s2, aux2 = sharded(sampler, cost, shard_planner_state(mesh, state), {})

    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(aux1.costs), np.asarray(aux2.costs), rtol=1e-4, atol=1e-4
    )
    assert len(s2.particle_means.sharding.device_set) == 8

    # a non-dof-capable problem must fail loudly, not silently unshard
    sampler_nodof = sampler.replace(dof=None)
    with pytest.raises(ValueError, match="shard_dof"):
        sharded(sampler_nodof, cost, shard_planner_state(mesh, state), {})


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_dof_quad_kernel_engages_and_matches():
    """The sharded dof path's fused quadratic runs the Pallas stencil
    kernel PER SHARD via shard_map (round-4 fix of the round-3 fallback:
    sharded runs used to keep the unfused XLA stencil, the form measured
    2.4x slower at config-5 scale). Checks (a) the wrapper engages (not
    None) on a kernel-eligible problem, (b) it equals the XLA stencil +
    importance term, and (c) it trace-time-declines on an ineligible
    horizon so the planner can fall back."""
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.parallel.sharding import _make_shard_dof_quad

    n_dof, t, dt = 14, 128, 0.05
    rng = np.random.default_rng(7)
    start = jnp.asarray(
        np.concatenate([rng.normal(size=n_dof), np.zeros(n_dof)]), jnp.float32
    )
    goals = jnp.asarray(
        np.concatenate([rng.normal(size=(4, n_dof)), np.zeros((4, n_dof))],
                       axis=1), jnp.float32
    )
    gp = CostGP.create(
        n_dof, t, start, dt, {"sigma_start": 1e-3, "sigma_gp": 0.1},
        dtype=jnp.float32,
    )
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=1.0, dtype=jnp.float32
    )
    dq = QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t).dof_form

    p, s = 8, 4
    x = jnp.asarray(
        rng.normal(size=(n_dof, p, s, 2 * t)), jnp.float32
    )
    pu = jnp.asarray(rng.normal(size=(n_dof, p, 2 * t)), jnp.float32)
    mesh = make_mesh(8, axis_shape=(4, 2))
    f = _make_shard_dof_quad(mesh)
    out = f(dq, x, pu, 0.7)
    assert out is not None and out.shape == (p, s)
    ref = np.asarray(
        dq.eval_dof_planes(x.reshape(n_dof, p * s, 2 * t)).reshape(p, s)
        + 0.7 * jnp.sum(x * pu[:, :, None, :], axis=(0, -1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-3)
    # inside jit with dq TRACED (every benchmark jits the cost as an arg;
    # the stencil weights must ride into the kernel as SMEM scalars)
    out_j = jax.jit(lambda dq_, x_, pu_: f(dq_, x_, pu_, 0.7))(dq, x, pu)
    np.testing.assert_allclose(np.asarray(out_j), ref, rtol=2e-5, atol=1e-3)

    # ineligible horizon (t % 128 != 0) -> trace-time None, no crash
    assert f(dq.replace(traj_len=96), x, pu, 0.7) is None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_stochgpmp_class_mesh_kwarg():
    """StochGPMP(mesh=...) — the reference-shaped class runs multi-chip
    with one kwarg: same trajectories as the unsharded class (threefry
    stream is sharding-stable) and output actually sharded."""
    goals = jnp.asarray(
        [[1.0, 1, 0, 0], [1, -1, 0, 0], [-1, 1, 0, 0], [-1, -1, 0, 0]],
        jnp.float32,
    )
    kw = dict(
        num_particles_per_goal=2, num_samples=4, traj_len=8, opt_iters=3,
        dt=0.05, n_dof=2, step_size=0.5, temperature=1.0,
        start_state=jnp.zeros(4, jnp.float32), multi_goal_states=goals,
        sigma_start_init=1e-2, sigma_goal_init=1e-2, sigma_gp_init=1.0,
        sigma_start_sample=1e-2, sigma_goal_sample=1e-2, sigma_gp_sample=1.0,
        seed=3,
    )
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import StochGPMP

    cost = CostComposite.create(2, 8, [
        CostGP.create(2, 8, jnp.zeros(4, jnp.float32), 0.05,
                      {"sigma_start": 1e-2, "sigma_gp": 1.0}),
        CostGoalPrior.create(2, 8, goals, sigma_goal_prior=1e-2),
    ])
    p1 = StochGPMP(cost=cost, **kw)
    p1.optimize(collect_metrics=True)
    mesh = make_mesh(8, axis_shape=(4, 2))
    p2 = StochGPMP(cost=cost, mesh=mesh, **kw)
    p2.optimize(collect_metrics=True)
    np.testing.assert_allclose(
        np.asarray(p1.particle_means), np.asarray(p2.particle_means),
        rtol=1e-5, atol=1e-6,
    )
    assert len(p2.particle_means.sharding.device_set) == 8
    assert p2.last_metrics is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gpmp_class_mesh_kwarg():
    """GPMP(mesh=...) — one-kwarg multi-chip Gauss-Newton on the class:
    equals the unsharded class (deterministic solver, exact equality up to
    all-reduce ordering) and lands sharded."""
    goals = jnp.asarray(
        [[1.0, 1, 0, 0], [1, -1, 0, 0], [-1, 1, 0, 0], [-1, -1, 0, 0]],
        jnp.float64,
    )
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners.gpmp import GPMP

    cost = CostComposite.create(2, 10, [
        CostGP.create(2, 10, jnp.zeros(4, jnp.float64), 0.05,
                      {"sigma_start": 1e-2, "sigma_gp": 1.0}, dtype=jnp.float64),
        CostGoalPrior.create(2, 10, goals, sigma_goal_prior=1e-2,
                             dtype=jnp.float64),
    ])
    kw = dict(
        num_particles_per_goal=2, traj_len=10, opt_iters=4, dt=0.05, n_dof=2,
        step_size=0.5, start_state=jnp.zeros(4, jnp.float64),
        multi_goal_states=goals, sigma_start_init=1e-2, sigma_goal_init=1e-2,
        sigma_gp_init=1.0, sigma_start_sample=1e-2, sigma_goal_sample=1e-2,
        sigma_gp_sample=1.0, seed=7, dtype=jnp.float64,
        solver_params={"delta": 1e-2, "trust_region": True},
    )
    p1 = GPMP(cost=cost, **kw)
    p1.optimize()
    mesh = make_mesh(8, axis_shape=(8, 1))
    p2 = GPMP(cost=cost, mesh=mesh, **kw)
    p2.optimize()
    np.testing.assert_allclose(
        np.asarray(p1.particle_means), np.asarray(p2.particle_means),
        rtol=1e-9, atol=1e-10,
    )
    assert len(p2.particle_means.sharding.device_set) == 8


def _woodbury_field_problem(dtype=jnp.float64, num_particles=8):
    """Planar GP + goal-prior + occupancy-collision stack whose GN Hessian
    decomposes for the Woodbury solve (rank-1 field rows -> a batched
    [P, nf*T, nf*T] capacitance Cholesky — the per-particle factorization
    that must shard over the ``p`` axis)."""
    from stoch_gpmp_tpu.costs import CostCollision, OccupancyGridField

    n_dof, traj_len, dt = 2, 24, 0.05
    start = jnp.asarray([-2.0, -2.0, 0.0, 0.0], dtype=dtype)
    goals = jnp.asarray([[2.0, 2.0, 0.0, 0.0]], dtype=dtype)
    xg, yg = jnp.meshgrid(jnp.arange(40, dtype=dtype),
                          jnp.arange(40, dtype=dtype))
    grid = jnp.exp(-((xg - 20.0) ** 2 + (yg - 20.0) ** 2) / 50.0)
    field = OccupancyGridField(grid=grid, cell_size=0.1)
    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt,
                          {"sigma_start": 0.01, "sigma_gp": 0.5}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals,
                                 sigma_goal_prior=0.02, dtype=dtype),
            CostCollision.create(n_dof, traj_len, field, sigma_coll=0.1),
        ],
    )
    rng = np.random.default_rng(11)
    means = jnp.asarray(
        0.5 * rng.standard_normal((num_particles, traj_len, 2 * n_dof)), dtype
    )
    return cost, means, start, goals, n_dof, traj_len, dt


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_gpmp_woodbury_matches_single_device():
    """method='woodbury' under the mesh (VERDICT r4 #7): the batched
    capacitance Cholesky + parallel-in-time solve shard over ``p`` and
    equal the single-device woodbury run at the cholesky-test tolerance."""
    from stoch_gpmp_tpu.parallel import (
        make_sharded_gpmp_optimize,
        shard_gpmp_state,
    )
    from stoch_gpmp_tpu.planners.gpmp import (
        GPMPState,
        build_woodbury,
        gpmp_optimize,
    )

    cost, means, *_ = _woodbury_field_problem()
    wb = build_woodbury(cost, 1e-2)
    assert wb is not None and wb.n_fields == 1
    state = GPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    kwargs = dict(opt_iters=4, delta=1e-2, trust_region=False,
                  method="woodbury", woodbury=wb, step_size=0.5)

    s1 = jax.jit(
        lambda c, st, ob: gpmp_optimize(c, st, ob, **kwargs)
    )(cost, state, {})
    mesh = make_mesh(8, axis_shape=(8, 1))
    run = make_sharded_gpmp_optimize(mesh, **kwargs)
    s2 = run(cost, shard_gpmp_state(mesh, state), {})
    np.testing.assert_allclose(
        np.asarray(s1.particle_means), np.asarray(s2.particle_means),
        rtol=1e-9, atol=1e-10,
    )
    assert len(s2.particle_means.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gpmp_class_mesh_woodbury():
    """GPMP(mesh=..., solver_params={'method': 'woodbury'}): the class
    builds the Woodbury model itself and runs it sharded — equal to the
    unsharded class and actually distributed."""
    from stoch_gpmp_tpu.planners.gpmp import GPMP

    cost, _, start, goals, n_dof, traj_len, dt = _woodbury_field_problem()
    kw = dict(
        num_particles_per_goal=8, traj_len=traj_len, opt_iters=4, dt=dt,
        n_dof=n_dof, step_size=0.5, start_state=start,
        multi_goal_states=goals, sigma_start_init=1e-2, sigma_goal_init=1e-2,
        sigma_gp_init=1.0, sigma_start_sample=1e-2, sigma_goal_sample=1e-2,
        sigma_gp_sample=1.0, seed=5, dtype=jnp.float64,
        solver_params={"method": "woodbury", "delta": 1e-2,
                       "trust_region": False},
    )
    p1 = GPMP(cost=cost, **kw)
    p1.optimize()
    mesh = make_mesh(8, axis_shape=(8, 1))
    p2 = GPMP(cost=cost, mesh=mesh, **kw)
    p2.optimize()
    np.testing.assert_allclose(
        np.asarray(p1.particle_means), np.asarray(p2.particle_means),
        rtol=1e-9, atol=1e-10,
    )
    assert len(p2.particle_means.sharding.device_set) == 8
