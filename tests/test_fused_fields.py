"""Fused link-fields cost (Pallas, interpret mode on CPU) vs the separate
field costs."""

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs import (
    CostCollision,
    LinkDistanceField,
    LinkSelfDistanceField,
)
from stoch_gpmp_tpu.costs.fused_fields import FusedLinkFieldsCost
from stoch_gpmp_tpu.kinematics.panda_model import franka_panda


def _setup(seed=0, b=6, t=10):
    chain = franka_panda()
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-1, 1, (b, t, 7)), dtype=jnp.float32)
    trajs = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)
    x_full = chain.fk(q.reshape(-1, 7)).reshape(b, t, -1, 4, 4)
    x_compact = chain.fk_compact(q.reshape(-1, 7)).reshape(b, t)
    spheres = jnp.asarray(rng.uniform(0.2, 0.8, (1, 5, 4)), dtype=jnp.float32)
    return trajs, x_full, x_compact, {"obstacle_spheres": spheres}


def test_fused_matches_separate_fields():
    trajs, x_full, x_compact, obs = _setup()
    t = trajs.shape[1]
    c_self = CostCollision.create(7, t, LinkSelfDistanceField(margin=0.03), sigma_coll=0.01)
    c_coll = CostCollision.create(7, t, LinkDistanceField(), sigma_coll=0.02)
    want = np.asarray(c_self.eval(trajs, x_trajs=x_full, observation=obs)) + np.asarray(
        c_coll.eval(trajs, x_trajs=x_full, observation=obs)
    )
    fused = FusedLinkFieldsCost.create(7, t, margin=0.03, sigma_self=0.01, sigma_coll=0.02)
    np.testing.assert_allclose(
        np.asarray(fused.eval(trajs, x_trajs=x_full, observation=obs)), want, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused.eval(trajs, x_trajs=x_compact, observation=obs)), want, rtol=2e-5
    )


def test_fused_no_obstacles_is_self_only():
    trajs, x_full, _, _ = _setup(seed=1)
    t = trajs.shape[1]
    c_self = CostCollision.create(7, t, LinkSelfDistanceField(margin=0.03), sigma_coll=0.01)
    fused = FusedLinkFieldsCost.create(7, t, margin=0.03, sigma_self=0.01, sigma_coll=0.02)
    np.testing.assert_allclose(
        np.asarray(fused.eval(trajs, x_trajs=x_full)),
        np.asarray(c_self.eval(trajs, x_trajs=x_full)),
        rtol=2e-5,
    )


def test_fused_step_block_heuristic():
    """The fused-kernel particle-block chooser returns sublane-aligned
    divisors under the VMEM budget for awkward particle counts (host-side
    logic; the kernel itself is TPU-only)."""
    import jax.numpy as jnp

    from stoch_gpmp_tpu.costs import CostGP, CostGoalPrior
    from stoch_gpmp_tpu.gp.dof_factored import (
        DofQuadraticCost,
        make_dof_factored_prior,
    )
    from stoch_gpmp_tpu.ops.pallas.fused_step import make_fused_planar_step_batched

    m = 256
    gp = CostGP.create(2, 64, jnp.zeros(4, jnp.float32), 0.02,
                       {"sigma_start": 1e-3, "sigma_gp": 3.0})
    dof_prior = make_dof_factored_prior(64, 0.02, 1e-3, 3.0, sigma_goal=1e-3)
    for p, s in ((15, 128), (192, 128), (1536, 32), (8, 64), (24, 128), (7, 16)):
        goals = jnp.zeros((p if p % 3 else 3, 4), jnp.float32)
        dq = DofQuadraticCost.from_gp_and_goal_prior(
            gp, CostGoalPrior.create(2, 64, goals, sigma_goal_prior=20.0), 64
        )
        step = make_fused_planar_step_batched(
            weight_t=jnp.zeros((m, m), jnp.float32),
            dof_prior=dof_prior, dof_quad=dq, num_particles=p,
            rect_bounds=jnp.zeros((1, 4), jnp.int32),
            circles=jnp.zeros((1, 3), jnp.float32),
            cell_size=0.1, nx=200, ny=200, traj_len=64, state_dim=4,
            num_samples=s, k_coll=1.0, temperature=1.0, step_size=0.5,
        )
        nb = step.n_blocks
        pb = p // nb
        assert p % pb == 0
        assert pb % 8 == 0 or pb == p
        # one [PB*S, M] f32 buffer stays near the 1 MB budget (or PB == P)
        assert pb * s * m * 4 <= 2 * 1024 * 1024 or pb == p or nb == 1 or p % 8 != 0


def test_plane_fields_matches_separate_costs():
    """PlaneFieldsCost (FK fused into the field sums via scalar planes) is
    exactly the separate self+obstacle+SE3 cost stack."""
    from stoch_gpmp_tpu.costs import CostGoal
    from stoch_gpmp_tpu.costs.fields import EESE3DistanceField
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.kinematics import homogeneous, y_rot, z_rot

    trajs, x_full, _, obs = _setup(seed=2)
    t = trajs.shape[1]
    chain = franka_panda()
    rot = z_rot(jnp.asarray(-np.pi, jnp.float32)) @ y_rot(jnp.asarray(-np.pi, jnp.float32))
    th = homogeneous(rot, jnp.asarray([0.3, 0.3, 0.3], jnp.float32))
    c_self = CostCollision.create(7, t, LinkSelfDistanceField(margin=0.03), sigma_coll=0.01)
    c_coll = CostCollision.create(7, t, LinkDistanceField(), sigma_coll=0.02)
    c_goal = CostGoal.create(7, t, EESE3DistanceField(target_h=th), sigma_goal=0.0007)
    want = (
        np.asarray(c_self.eval(trajs, x_trajs=x_full, observation=obs))
        + np.asarray(c_coll.eval(trajs, x_trajs=x_full, observation=obs))
        + np.asarray(c_goal.eval(trajs, x_trajs=x_full, observation=obs))
    )
    plane = PlaneFieldsCost.create(
        7, t, chain, th, margin=0.03, sigma_self=0.01, sigma_coll=0.02,
        sigma_goal=0.0007,
    )
    got = np.asarray(plane.eval(trajs, observation=obs))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_plane_fields_in_composite_planner_step():
    """The plane cost drives an actual planner step (jitted) to the same
    update as the separate-cost stack."""
    import jax

    from stoch_gpmp_tpu.costs import CostComposite, CostGoal, CostGP
    from stoch_gpmp_tpu.costs.fields import EESE3DistanceField
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.kinematics import homogeneous
    from stoch_gpmp_tpu.planners import SamplerModel, StochGPMPState, stoch_gpmp_step

    dtype = jnp.float32
    chain = franka_panda(dtype=dtype)
    n_dof, t = 7, 12
    dt = 0.05
    start_q = jnp.asarray([0.0, -0.5, 0.0, -2.0, 0.0, 1.5, 0.7], dtype)
    start = jnp.concatenate([start_q, jnp.zeros_like(start_q)])
    goals = start[None] + 0.1
    th = homogeneous(jnp.eye(3, dtype=dtype), jnp.asarray([0.3, 0.3, 0.3], dtype))
    gp = CostGP.create(n_dof, t, start, dt, {"sigma_start": 1e-3, "sigma_gp": 0.1}, dtype=dtype)
    c_self = CostCollision.create(n_dof, t, LinkSelfDistanceField(margin=0.03), sigma_coll=0.01)
    c_coll = CostCollision.create(n_dof, t, LinkDistanceField(), sigma_coll=0.01)
    c_goal = CostGoal.create(n_dof, t, EESE3DistanceField(target_h=th), sigma_goal=0.0007)
    cost_ref = CostComposite.create(n_dof, t, [gp, c_self, c_coll, c_goal], fk=chain.fk_compact)
    cost_plane = CostComposite.create(
        n_dof, t,
        [gp, PlaneFieldsCost.create(n_dof, t, chain, th, sigma_goal=0.0007)],
    )
    prior = make_gp_prior(n_dof, t, dt, start, 1e-3, 0.5, sigma_goal=0.1,
                          goal_states=goals, dtype=dtype)
    sampler = SamplerModel.from_prior(prior)
    state = StochGPMPState(particle_means=prior.means, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    spheres = jnp.asarray(rng.uniform(0.3, 0.7, (1, 5, 4)), dtype)
    obs = {"obstacle_spheres": spheres}
    run = jax.jit(lambda c, st: stoch_gpmp_step(
        sampler, c, st, obs, num_samples=8, temperature=1.0, step_size=0.1))
    s_ref, aux_ref = run(cost_ref, state)
    s_pl, aux_pl = run(cost_plane, state)
    np.testing.assert_allclose(
        np.asarray(s_ref.particle_means), np.asarray(s_pl.particle_means),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(aux_ref.costs), np.asarray(aux_pl.costs), rtol=2e-5
    )


def test_plane_fields_xla_fallback_matches_kernel_path():
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.kinematics import homogeneous

    trajs, _, _, obs = _setup(seed=4)
    t = trajs.shape[1]
    chain = franka_panda()
    th = homogeneous(jnp.eye(3, dtype=jnp.float32), jnp.asarray([0.3, 0.3, 0.3], jnp.float32))
    a = PlaneFieldsCost.create(7, t, chain, th, use_pallas=True)
    b = PlaneFieldsCost.create(7, t, chain, th, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(a.eval(trajs, observation=obs)),
        np.asarray(b.eval(trajs, observation=obs)),
        rtol=1e-6,
    )


def test_plane_fields_eval_planes_matches_eval():
    """Plane-layout evaluation (planner's long-horizon pipeline: per-dof
    [..., T] planes, no selection matmul) equals the flat-trajectory eval."""
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.kinematics import homogeneous

    trajs, _, _, obs = _setup(seed=5)
    t = trajs.shape[1]
    chain = franka_panda()
    th = homogeneous(
        jnp.eye(3, dtype=jnp.float32), jnp.asarray([0.3, 0.3, 0.3], jnp.float32)
    )
    cost = PlaneFieldsCost.create(7, t, chain, th)
    ref = np.asarray(cost.eval(trajs, observation=obs))
    b = trajs.shape[0]
    planes = tuple(trajs[..., i].reshape(b // 2, 2, t) for i in range(14))
    par = np.asarray(cost.eval_planes(planes, observation=obs))
    assert par.shape == (b // 2, 2)
    np.testing.assert_allclose(par.reshape(b), ref, rtol=1e-5)
