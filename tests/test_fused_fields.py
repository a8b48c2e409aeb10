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

    from stoch_gpmp_tpu.ops.pallas.fused_step import make_fused_planar_step_batched

    m = 256
    for p, s in ((15, 128), (192, 128), (1536, 32), (8, 64), (24, 128), (7, 16)):
        step = make_fused_planar_step_batched(
            weight_t=jnp.zeros((m, m), jnp.float32),
            a_dense=jnp.zeros((m, m), jnp.float32),
            b=jnp.zeros((p, m), jnp.float32),
            precision_dense=jnp.zeros((m, m), jnp.float32),
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
