"""The per-dof factored (plane-ordered) GP stack equals the dense machinery.

The claim (gp/dof_factored.py): with scalar sigmas — the reference's whole
API — the dense ``[M, M]`` sampling factor / precision / quadratic-cost
matrices are permuted block-diagonals of ``n_dof`` identical ``[2T, 2T]``
blocks in plane order. Verified here exactly (float64) against
``make_gp_prior`` / ``QuadraticCost``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import CostGP, CostGoalPrior
from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
from stoch_gpmp_tpu.gp.dof_factored import (
    DofQuadraticCost,
    from_dof_planes,
    make_dof_factored_prior,
    to_dof_planes,
)
from stoch_gpmp_tpu.gp.prior import make_gp_prior

T, DOF, DT = 13, 3, 0.05
SIG_START, SIG_GP, SIG_GOAL = 1e-3, 0.07, 0.08


def _global_perm(t, d):
    """Flat t-major index of plane-major element (dof k, s) with s < T a
    position step and s >= T a velocity step."""
    idx = np.empty(2 * d * t, dtype=np.int64)
    for k in range(d):
        for s in range(2 * t):
            if s < t:
                idx[k * 2 * t + s] = s * 2 * d + k
            else:
                idx[k * 2 * t + s] = (s - t) * 2 * d + d + k
    return idx


def _priors():
    start = jnp.arange(2 * DOF, dtype=jnp.float64) * 0.1
    goals = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 2 * DOF)), dtype=jnp.float64
    )
    dense = make_gp_prior(
        DOF, T, DT, start, SIG_START, SIG_GP, sigma_goal=SIG_GOAL,
        goal_states=goals, dtype=jnp.float64,
    )
    dof = make_dof_factored_prior(
        T, DT, SIG_START, SIG_GP, sigma_goal=SIG_GOAL, dtype=jnp.float64
    )
    return start, goals, dense, dof


def test_weight_and_precision_blockdiag():
    _, _, dense, dof = _priors()
    perm = _global_perm(T, DOF)
    w_full = np.asarray(dense.weight_t)[np.ix_(perm, perm)]
    p_full = np.asarray(dense.precision.to_dense())[np.ix_(perm, perm)]
    t2 = 2 * T
    for k in range(DOF):
        blk = slice(k * t2, (k + 1) * t2)
        np.testing.assert_allclose(
            w_full[blk, blk], np.asarray(dof.w_dof), rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            p_full[blk, blk], np.asarray(dof.prec_dof), rtol=1e-9, atol=1e-9
        )
        # off-dof coupling is exactly zero
        out = w_full[blk].copy()
        out[:, blk] = 0.0
        assert np.abs(out).max() == 0.0


def test_sampling_matches_dense():
    """eps routed through the per-dof factor equals the dense-matmul sample
    with the correspondingly permuted eps."""
    _, _, dense, dof = _priors()
    perm = _global_perm(T, DOF)
    rng = np.random.default_rng(1)
    eps_flat = jnp.asarray(rng.normal(size=(5, 2 * DOF * T)))  # t-major
    corr_dense = np.asarray(eps_flat @ dense.weight_t)[:, perm]
    eps_planes = eps_flat[:, perm].reshape(5, DOF, 2 * T)
    corr_dof = np.asarray(
        (eps_planes.reshape(-1, 2 * T) @ dof.w_dof).reshape(5, DOF * 2 * T)
    )
    np.testing.assert_allclose(corr_dof, corr_dense, rtol=1e-9, atol=1e-9)


def test_layout_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 7, T, 2 * DOF)))
    planes = to_dof_planes(x)
    assert planes.shape == (DOF, 4, 7, 2 * T)  # dof axis LEADING
    # first T lanes of dof k is its position sequence, last T its velocities
    np.testing.assert_array_equal(
        np.asarray(planes[1, ..., :T]), np.asarray(x[..., :, 1])
    )
    np.testing.assert_array_equal(
        np.asarray(planes[1, ..., T:]), np.asarray(x[..., :, DOF + 1])
    )
    np.testing.assert_array_equal(np.asarray(from_dof_planes(planes)), np.asarray(x))


def test_quadratic_cost_matches():
    start, goals, _, _ = _priors()
    gp = CostGP.create(
        DOF, T, start, DT,
        {"sigma_start": SIG_START, "sigma_gp": SIG_GP}, dtype=jnp.float64,
    )
    goal_prior = CostGoalPrior.create(
        DOF, T, goals, sigma_goal_prior=20.0, dtype=jnp.float64
    )
    dense_q = QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, T)
    dof_q = DofQuadraticCost.from_gp_and_goal_prior(gp, goal_prior, T)

    rng = np.random.default_rng(3)
    trajs = jnp.asarray(rng.normal(size=(8, T, 2 * DOF)))  # goal-major, 4/goal
    ref = np.asarray(dense_q.eval(trajs))
    got = np.asarray(dof_q.eval_dof_planes(to_dof_planes(trajs)))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)

    # no-goal variant
    dense_q0 = QuadraticCost.from_gp_and_goal_prior(gp, None, T)
    dof_q0 = DofQuadraticCost.from_gp_and_goal_prior(gp, None, T)
    ref0 = np.asarray(dense_q0.eval(trajs))
    got0 = np.asarray(dof_q0.eval_dof_planes(to_dof_planes(trajs)))
    np.testing.assert_allclose(got0, ref0, rtol=1e-9, atol=1e-9)


def test_grad_dof_planes_matches_dense():
    """The residual-form gradient equals ``b_planes - x @ a_dof`` exactly
    (float64) — the TPU-safe form the Woodbury GN solve consumes."""
    start, goals, _, _ = _priors()
    gp = CostGP.create(
        DOF, T, start, DT,
        {"sigma_start": SIG_START, "sigma_gp": SIG_GP}, dtype=jnp.float64,
    )
    goal_prior = CostGoalPrior.create(
        DOF, T, goals, sigma_goal_prior=20.0, dtype=jnp.float64
    )
    rng = np.random.default_rng(4)
    trajs = jnp.asarray(rng.normal(size=(8, T, 2 * DOF)))  # goal-major, 4/goal
    x_planes = to_dof_planes(trajs)
    for gprior in (goal_prior, None):
        dq = DofQuadraticCost.from_gp_and_goal_prior(gp, gprior, T)
        bg = jnp.transpose(
            jnp.repeat(dq.b_planes, 8 // dq.num_goals, axis=0), (1, 0, 2)
        )
        ref = bg - (x_planes.reshape(-1, 2 * T) @ dq.a_dof).reshape(
            DOF, 8, 2 * T
        )
        got = dq.grad_dof_planes(x_planes)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-9, atol=1e-9
        )


def test_panda_fast_stack_dof_parity():
    """CostComposite([QuadraticCost, PlaneFieldsCost]).eval_dof_planes equals
    the flat eval — the config-5 fast stack is exact in the dof layout."""
    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.kinematics import homogeneous, y_rot, z_rot
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda

    dtype = jnp.float64
    t, n_dof = 9, 7
    chain = franka_panda(dtype=dtype)
    target_rot = z_rot(jnp.asarray(-np.pi, dtype=dtype)) @ y_rot(
        jnp.asarray(-np.pi, dtype=dtype)
    )
    target_h = homogeneous(target_rot, jnp.asarray([0.3, 0.3, 0.3], dtype=dtype))
    start_q = jnp.asarray(
        [0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], dtype=dtype
    )
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    goals = jnp.concatenate([start_q + 0.1, jnp.zeros_like(start_q)])[None]

    gp = CostGP.create(
        n_dof, t, start, 0.05,
        {"sigma_start": 1e-4, "sigma_gp": 7e-4}, dtype=dtype,
    )
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=20.0, dtype=dtype
    )
    cost = CostComposite.create(n_dof, t, [
        QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t),
        PlaneFieldsCost.create(
            n_dof, t, chain, target_h, margin=0.03, sigma_self=0.01,
            sigma_coll=0.01, sigma_goal=7e-5, use_pallas=False,
        ),
    ])
    assert cost.supports_dof_planes()

    rng = np.random.default_rng(5)
    trajs = jnp.asarray(
        start[None, None] + 0.2 * rng.normal(size=(6, t, 2 * n_dof)), dtype=dtype
    )
    spheres = np.zeros((1, 5, 4))
    spheres[0, :, :3] = rng.uniform([0.6, -0.2, 0.6], [1.0, 0.2, 1.0], (5, 3))
    spheres[0, :, 3] = rng.uniform(0.1, 0.2, 5)
    obs = {"obstacle_spheres": jnp.asarray(spheres, dtype=dtype)}

    ref = np.asarray(cost.eval(trajs, observation=obs))
    got = np.asarray(cost.eval_dof_planes(to_dof_planes(trajs), observation=obs))
    np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_dof_optimize_path_descends():
    """The planner routes the d=14 fast stack through the dof-plane path and
    still descends with the start anchored."""
    import jax

    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.kinematics import homogeneous, y_rot, z_rot
    from stoch_gpmp_tpu.kinematics.panda_model import franka_panda
    from stoch_gpmp_tpu.planners import (
        SamplerModel, StochGPMPState, stoch_gpmp_optimize,
    )

    dtype = jnp.float32
    t, n_dof = 16, 7
    chain = franka_panda(dtype=dtype)
    target_rot = z_rot(jnp.asarray(-np.pi, dtype=dtype)) @ y_rot(
        jnp.asarray(-np.pi, dtype=dtype)
    )
    target_h = homogeneous(target_rot, jnp.asarray([0.3, 0.3, 0.3], dtype=dtype))
    start_q = jnp.asarray(
        [0.012, -0.57, 0.0, -2.81, 0.0, 3.037, 0.741], dtype=dtype
    )
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    goals = jnp.concatenate([start_q + 0.2, jnp.zeros_like(start_q)])[None]

    gp = CostGP.create(
        n_dof, t, start, 0.05,
        {"sigma_start": 1e-4, "sigma_gp": 7e-4}, dtype=dtype,
    )
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=20.0, dtype=dtype
    )
    cost = CostComposite.create(n_dof, t, [
        QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t),
        PlaneFieldsCost.create(
            n_dof, t, chain, target_h, margin=0.03, sigma_self=0.01,
            sigma_coll=0.01, sigma_goal=7e-5, use_pallas=False,
        ),
    ])
    prior = make_gp_prior(n_dof, t, 0.05, start, 0.001, 0.1, sigma_goal=0.07,
                          goal_states=goals, dtype=dtype)
    sampler = SamplerModel.from_prior(prior)
    assert sampler.dof is not None
    means = jnp.repeat(prior.means, 3, axis=0)
    state = StochGPMPState(particle_means=means, key=jax.random.PRNGKey(0))
    obs = {}

    c0 = float(cost.eval(means, observation=obs).mean())
    new_state, aux, metrics = jax.jit(
        lambda sa, c, st: stoch_gpmp_optimize(
            sa, c, st, obs, opt_iters=30, num_samples=16,
            temperature=1.0, step_size=0.1, collect_metrics=True,
        )
    )(sampler, cost, state)
    m1 = np.asarray(new_state.particle_means)
    assert np.isfinite(m1).all()
    c1 = float(cost.eval(new_state.particle_means, observation=obs).mean())
    assert c1 < c0
    np.testing.assert_allclose(
        m1[:, 0, :n_dof],
        np.broadcast_to(np.asarray(start_q), (3, n_dof)),
        rtol=0, atol=2e-2,
    )
    assert metrics.cost_mean.shape == (30,)
    assert aux.samples.shape == (3, 16, t, 2 * n_dof)


def test_matvec_matches_dense_precision():
    _, _, dense, dof = _priors()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, T, 2 * DOF)))
    ref = np.asarray(dense.precision.matvec(x))
    got = np.asarray(from_dof_planes(dof.matvec_planes(to_dof_planes(x))))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_pallas_dof_quad_eval_matches_stencil():
    """The single-pass Pallas stencil kernel (interpret mode) equals the
    XLA residual-form eval and a float64 oracle at the reference's Panda
    sigmas (~2e11-scale weights) — the round-3 config-5 hot path."""
    from stoch_gpmp_tpu.ops.pallas.stencil import dof_quad_eval_pallas

    t, n_dof = 128, 3
    rng = np.random.default_rng(11)
    start = jnp.asarray(rng.normal(size=2 * n_dof), jnp.float64)
    goals = jnp.asarray(rng.normal(size=(2, 2 * n_dof)), jnp.float64)

    def build(dtype):
        gp = CostGP.create(
            n_dof, t, start.astype(dtype), 0.05,
            {"sigma_start": 1e-4, "sigma_gp": 7e-4}, dtype=dtype,
        )
        goal_prior = CostGoalPrior.create(
            n_dof, t, goals.astype(dtype), sigma_goal_prior=20.0, dtype=dtype
        )
        return DofQuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)

    dq32, dq64 = build(jnp.float32), build(jnp.float64)
    # small excursions around the start state (the planner regime: tight
    # sigmas => tiny spreads on a huge-weight quadratic)
    trajs = np.broadcast_to(
        np.asarray(start, np.float64), (16, t, 2 * n_dof)
    ) + rng.normal(size=(16, t, 2 * n_dof)) * 1e-3
    xp32 = to_dof_planes(jnp.asarray(trajs, jnp.float32))

    oracle = np.asarray(dq64.eval_dof_planes(to_dof_planes(jnp.asarray(trajs))))
    xla32 = np.asarray(dq32.eval_dof_planes(xp32))
    pal = dof_quad_eval_pallas(dq32, xp32, interpret=True)
    assert pal is not None
    pal = np.asarray(pal)
    np.testing.assert_allclose(pal, xla32, rtol=2e-6)
    np.testing.assert_allclose(pal, oracle, rtol=2e-4)

    # ineligible shapes fall back (caller handles None)
    assert dof_quad_eval_pallas(
        dq32, xp32[:, :15], interpret=True) is None  # b=15 not divisible
    dq13 = DofQuadraticCost.from_gp_and_goal_prior(
        CostGP.create(n_dof, 13, start.astype(jnp.float32), 0.05,
                      {"sigma_start": 1e-4, "sigma_gp": 7e-4},
                      dtype=jnp.float32),
        None, 13)
    x13 = jnp.zeros((n_dof, 8, 26), jnp.float32)
    assert dof_quad_eval_pallas(dq13, x13, interpret=True) is None


def test_pallas_dof_quad_importance_fusion():
    """The pu-fused kernel equals quad eval + tau * sum(x * pu) (the
    planner dof path's importance term), and _dof_quad_split finds the
    quadratic in the stacks the planner sees."""
    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.ops.pallas.stencil import dof_quad_eval_pallas
    from stoch_gpmp_tpu.planners.stoch_gpmp import _dof_quad_split

    t, n_dof, p, s = 128, 3, 4, 4
    rng = np.random.default_rng(5)
    start = jnp.asarray(rng.normal(size=2 * n_dof), jnp.float32)
    gp = CostGP.create(
        n_dof, t, start, 0.05,
        {"sigma_start": 1e-3, "sigma_gp": 0.07}, dtype=jnp.float32,
    )
    dq = DofQuadraticCost.from_gp_and_goal_prior(gp, None, t)

    x = jnp.asarray(rng.normal(size=(n_dof, p, s, 2 * t)), jnp.float32)
    pu = jnp.asarray(rng.normal(size=(n_dof, p, 2 * t)), jnp.float32)
    x_flat = x.reshape(n_dof, p * s, 2 * t)
    tau = 0.7

    base = dof_quad_eval_pallas(dq, x_flat, interpret=True)
    fused = dof_quad_eval_pallas(
        dq, x_flat, pu=pu, temperature=tau, num_samples=s, interpret=True
    )
    assert base is not None and fused is not None
    expect = np.asarray(base) + tau * np.asarray(
        jnp.sum(x * pu[:, :, None, :], axis=(0, -1))
    ).reshape(-1)
    np.testing.assert_allclose(np.asarray(fused), expect, rtol=1e-5,
                               atol=1e-5)

    # multi-batch-block grid (bb < B): the dof-column accumulation into the
    # revisited [bb, d] output block must agree with the one-block answer
    p2, s2 = 80, 8  # b=640 -> bb=128 (128 // 8 = 16, pu-sublane aligned)
    x2 = jnp.asarray(rng.normal(size=(n_dof, p2, s2, 2 * t)), jnp.float32)
    pu2 = jnp.asarray(rng.normal(size=(n_dof, p2, 2 * t)), jnp.float32)
    x2_flat = x2.reshape(n_dof, p2 * s2, 2 * t)
    from stoch_gpmp_tpu.ops.pallas.stencil import _pick_batch_block
    assert _pick_batch_block(p2 * s2, s2, with_pu=True) == 128  # < B
    fused2 = dof_quad_eval_pallas(
        dq, x2_flat, pu=pu2, temperature=tau, num_samples=s2, interpret=True
    )
    expect2 = np.asarray(dq.eval_dof_planes(x2_flat)) + tau * np.asarray(
        jnp.sum(x2 * pu2[:, :, None, :], axis=(0, -1))
    ).reshape(-1)
    np.testing.assert_allclose(np.asarray(fused2), expect2, rtol=1e-5,
                               atol=1e-5)

    got_dq, rest = _dof_quad_split(dq)
    assert got_dq is dq and rest == []
    comp = CostComposite.create(n_dof, t, [dq], fk=None)
    got_dq, rest = _dof_quad_split(comp)
    assert got_dq is dq and rest == []
    assert _dof_quad_split(object()) == (None, None)


def test_dof_planner_fused_quad_path_matches_fallback(monkeypatch):
    """The TPU-gated planner wiring (quad + importance through
    dof_quad_eval_pallas) produces the same trajectories as the XLA
    fallback: monkeypatch the backend gate to 'tpu' and force the kernel
    into interpret mode so the full planner path runs on CPU."""
    import stoch_gpmp_tpu.ops.pallas.stencil as st
    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.planners import (
        SamplerModel, StochGPMPState, stoch_gpmp_optimize,
    )

    dtype = jnp.float32
    t, n_dof = 128, 14  # d > 8, 128-aligned: the dof auto-gate regime
    rng = np.random.default_rng(9)
    start = jnp.asarray(
        np.concatenate([rng.normal(size=n_dof), np.zeros(n_dof)]), dtype
    )
    goals = jnp.asarray(
        np.concatenate([rng.normal(size=(2, n_dof)),
                        np.zeros((2, n_dof))], axis=1), dtype
    )
    gp = CostGP.create(
        n_dof, t, start, 0.05,
        {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype,
    )
    goal_prior = CostGoalPrior.create(
        n_dof, t, goals, sigma_goal_prior=1.0, dtype=dtype
    )
    cost = CostComposite.create(n_dof, t, [
        QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)
    ], fk=None)
    prior = make_gp_prior(
        n_dof, t, 0.05, start, 1e-3, 0.1, sigma_goal=0.1,
        goal_states=goals, dtype=dtype,
    )
    sampler = SamplerModel.from_prior(prior)
    means = jnp.repeat(prior.means, 2, axis=0)  # [4, T, 2d]
    state = StochGPMPState(
        particle_means=means, key=jax.random.PRNGKey(3)
    )

    def run():
        out, _ = stoch_gpmp_optimize(
            sampler, cost, state, {}, opt_iters=3, num_samples=8,
            temperature=1.0, step_size=0.3,
        )
        return np.asarray(out.particle_means)

    base = run()  # CPU backend: XLA stencil + separate importance

    orig = st.dof_quad_eval_pallas
    calls = []

    def forced(*a, **k):
        calls.append(1)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(st, "dof_quad_eval_pallas", forced)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = run()
    assert calls, "fused path did not engage"
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-4)


def test_cost_collision_eval_dof_planes_matches_eval():
    """CostCollision.eval_dof_planes (2D coordinate fields; the d<=8 dof
    dense-apply A/B path) equals the flat eval on the same batch."""
    import numpy as np

    from stoch_gpmp_tpu.costs import CostCollision
    from stoch_gpmp_tpu.costs.fields import RasterPrimitive2DField
    from stoch_gpmp_tpu.envs import generate_obstacle_map
    from stoch_gpmp_tpu.gp.dof_factored import to_dof_planes

    t = 16
    obst_map, obst_list = generate_obstacle_map(
        map_dim=(20, 20), cell_size=0.1, random_gen=True, num_obst=6,
        rand_limits=[[-7.5, 7.5]] * 2, rand_rect_shape=[2, 2], rng=3,
        dtype=jnp.float32,
    )
    field = RasterPrimitive2DField.from_map(obst_map, obst_list,
                                            use_pallas=False)
    coll = CostCollision.create(2, t, field, sigma_coll=1e-2)
    assert coll.supports_dof_planes()
    rng = np.random.default_rng(0)
    trajs = jnp.asarray(
        rng.uniform(-9, 9, size=(7, t, 4)), jnp.float32
    )
    flat = coll.eval(trajs)
    planes = coll.eval_dof_planes(to_dof_planes(trajs))
    np.testing.assert_allclose(
        np.asarray(planes), np.asarray(flat), rtol=1e-6, atol=1e-6
    )


def test_pallas_dof_quad_eval_odd_batch_blocks():
    """_pick_batch_block fallbacks: batches that are not 8-aligned (the
    shard_map per-device slices can be tiny/odd) still evaluate exactly —
    block == array dims is a legal Mosaic tile."""
    import numpy as np

    from stoch_gpmp_tpu.costs import CostGP, CostGoalPrior
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.ops.pallas.stencil import (
        _pick_batch_block, dof_quad_eval_pallas,
    )

    assert _pick_batch_block(4, 2) == 4
    assert _pick_batch_block(12, 4) == 12
    assert _pick_batch_block(480, 32) == 32
    assert _pick_batch_block(7, 2) is None  # 7 % 2 != 0 with pu grouping
    # with_pu: the pu block's sublane dim bb // s must be 8-aligned (or the
    # block the full batch) — Mosaic rejects partial blocks with 1/2/4-row
    # sublanes at hardware compile time
    assert _pick_batch_block(480, 32, with_pu=True) == 480  # 32//32=1 -> full
    assert _pick_batch_block(1280 * 128, 128, with_pu=True) == 2048  # cfg 5
    assert _pick_batch_block(12 * 128, 128, with_pu=True) == 1536  # full
    assert _pick_batch_block(40 * 128, 128, with_pu=True) == 1024
    assert _pick_batch_block(128, 8, with_pu=True) == 128  # == b -> legal
    assert _pick_batch_block(640, 8, with_pu=True) == 128  # 128//8=16 ok
    for b, s in ((480, 32), (12 * 128, 128), (128, 8), (640, 8), (64, 8)):
        bb = _pick_batch_block(b, s, with_pu=True)
        assert bb == b or (bb // s) % 8 == 0

    n_dof, t = 3, 128
    rng = np.random.default_rng(5)
    start = jnp.asarray(
        np.concatenate([rng.normal(size=n_dof), np.zeros(n_dof)]), jnp.float32
    )
    goals = jnp.asarray(
        np.concatenate([rng.normal(size=(2, n_dof)), np.zeros((2, n_dof))],
                       axis=1), jnp.float32
    )
    gp = CostGP.create(n_dof, t, start, 0.05,
                       {"sigma_start": 1e-3, "sigma_gp": 0.1},
                       dtype=jnp.float32)
    gprior = CostGoalPrior.create(n_dof, t, goals, sigma_goal_prior=1.0,
                                  dtype=jnp.float32)
    dq = QuadraticCost.from_gp_and_goal_prior(gp, gprior, t).dof_form
    for b in (4, 12):  # not 8-aligned; goal-major (b % 2 == 0)
        x = jnp.asarray(rng.normal(size=(n_dof, b, 2 * t)), jnp.float32)
        out = dof_quad_eval_pallas(dq, x, interpret=True)
        assert out is not None
        # oracle: the XLA residual-form stencil (tests run on CPU, where
        # eval_dof_planes never routes to the kernel)
        ref = dq.eval_dof_planes(x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-6,
            atol=1e-2 * float(np.abs(np.asarray(ref)).max()),
        )


def test_dof_auto_gate_routes_d2_t128(monkeypatch):
    """Round-5 hardware A/B gate (docs/PERFORMANCE.md): with the dof factor
    built and a dof-capable cost stack, ``sample_method='dense'`` auto-routes
    to the dof path for ANY d when the horizon is 128-aligned — and stays on
    the flat/plane stack at T=64 (the 64->128 lane pad loses there)."""
    import stoch_gpmp_tpu.planners.stoch_gpmp as sg
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import (
        SamplerModel, StochGPMPState, stoch_gpmp_optimize,
    )

    def build(t):
        dtype = jnp.float32
        start = jnp.asarray([-9.0, -9.0, 0, 0], dtype)
        goals = jnp.asarray([[9.0, 6.0, 0, 0]], dtype)
        gp = CostGP.create(2, t, start, 0.02,
                           {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype)
        gprior = CostGoalPrior.create(2, t, goals, sigma_goal_prior=1e-3,
                                      dtype=dtype)
        cost = CostComposite.create(
            2, t, [QuadraticCost.from_gp_and_goal_prior(gp, gprior, t)]
        )
        prior = make_gp_prior(2, t, 0.02, start, 1e-3, 3.0, sigma_goal=1e-3,
                              goal_states=goals, dtype=dtype)
        sampler = SamplerModel.from_prior(prior)
        assert sampler.dof is not None  # 2T <= 2048: dof factor built
        assert cost.supports_dof_planes()
        state = StochGPMPState(particle_means=jnp.repeat(prior.means, 3, axis=0),
                               key=jax.random.PRNGKey(7))
        return sampler, cost, state

    calls = []
    real_dof_path = sg._stoch_gpmp_optimize_dof

    def spy(*a, **kw):
        calls.append(True)
        return real_dof_path(*a, **kw)

    monkeypatch.setattr(sg, "_stoch_gpmp_optimize_dof", spy)

    kwargs = dict(opt_iters=2, num_samples=8, temperature=1.0, step_size=0.5)

    # T=128: dense auto-routes to the dof path, bit-identical to explicit opt-in.
    sampler, cost, state = build(128)
    st_dense, _ = stoch_gpmp_optimize(sampler, cost, state, {},
                                      sample_method="dense", **kwargs)
    assert calls, "T=128 dense run did not reach the dof path"
    st_dof, _ = stoch_gpmp_optimize(sampler, cost, state, {},
                                    sample_method="dof", **kwargs)
    np.testing.assert_array_equal(np.asarray(st_dense.particle_means),
                                  np.asarray(st_dof.particle_means))

    # T=64 (parity scale, not 128-aligned): the gate stays off.
    calls.clear()
    sampler, cost, state = build(64)
    st64, _ = stoch_gpmp_optimize(sampler, cost, state, {},
                                  sample_method="dense", **kwargs)
    assert not calls, "T=64 dense run must NOT route to the dof path"
    assert np.isfinite(np.asarray(st64.particle_means)).all()


def test_fused_executor_eligibility_reasons():
    """planners/fused_exec.py returns targeted reasons for ineligible
    stacks (the backend gate is LAST, so these are CPU-checkable), and the
    planner class surfaces them / rejects mesh+fused at construction."""
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import SamplerModel
    from stoch_gpmp_tpu.planners.fused_exec import build_fused_dof_executor

    n_dof, dt = 2, 0.02
    start = jnp.asarray([-9.0, -9.0, 0, 0], jnp.float32)
    goals = jnp.asarray([[9.0, 6.0, 0, 0]], jnp.float32)

    def stack(t):
        gp = CostGP.create(n_dof, t, start, dt,
                           {"sigma_start": 1e-3, "sigma_gp": 0.1},
                           dtype=jnp.float32)
        gprior = CostGoalPrior.create(n_dof, t, goals, sigma_goal_prior=1e-3,
                                      dtype=jnp.float32)
        quad = QuadraticCost.from_gp_and_goal_prior(gp, gprior, t)
        prior = make_gp_prior(n_dof, t, dt, start, 1e-3, 3.0, sigma_goal=1e-3,
                              goal_states=goals, dtype=jnp.float32)
        return SamplerModel.from_prior(prior), quad, gp, gprior

    kw = dict(num_particles=4, num_samples=8, temperature=1.0, step_size=0.1)

    # wrong composition
    sampler, quad, gp, gprior = stack(128)
    from stoch_gpmp_tpu.costs import CostComposite as CC
    run, reason = build_fused_dof_executor(
        sampler, CC.create(n_dof, 128, [gp, gprior]), {}, **kw)
    assert run is None and "CostComposite" in reason

    # non-128-aligned horizon (needs the full eligible composition shape;
    # a quad-only composite fails the composition check first)
    sampler64, quad64, _, _ = stack(64)
    run, reason = build_fused_dof_executor(
        sampler64, CC.create(n_dof, 64, [quad64, quad64]), {}, **kw)
    assert run is None and ("PlaneFieldsCost" in reason or "128" in reason)

    # planar executor: same wrong-composition stack gets a planar-specific
    # reason, and the combined dispatcher reports both kernels' reasons.
    from stoch_gpmp_tpu.planners.fused_exec import (
        build_fused_executor,
        build_fused_planar_executor,
    )
    run, reason = build_fused_planar_executor(
        sampler, CC.create(n_dof, 128, [gp, gprior]), {}, **kw)
    assert run is None and "CostComposite" in reason
    run, reason = build_fused_executor(
        sampler, CC.create(n_dof, 128, [gp, gprior]), {}, **kw)
    assert run is None
    assert "panda kernel:" in reason and "planar kernel:" in reason

    # mesh + fused rejected at construction
    import pytest as _pytest
    from stoch_gpmp_tpu.planners import StochGPMP
    with _pytest.raises(ValueError, match="single-chip"):
        StochGPMP(
            num_particles_per_goal=2, num_samples=4, traj_len=64, dt=dt,
            n_dof=n_dof, opt_iters=2, start_state=start,
            multi_goal_states=goals,
            cost=CC.create(n_dof, 64, [quad64]),
            sigma_start_init=1e-3, sigma_goal_init=1e-3, sigma_gp_init=20.0,
            sigma_start_sample=1e-3, sigma_goal_sample=1e-3,
            sigma_gp_sample=3.0, fused_kernel=True, mesh=object(),
        )
