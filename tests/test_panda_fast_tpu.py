"""Panda fast-path (QuadraticCost + PlaneFieldsCost / FK-in-kernel Pallas)
on real TPU hardware: value parity vs the reference-shaped stack, and a real
planner run. Skipped on CPU (the CPU equivalents run in interpret mode in
tests/test_fused_fields.py). Run with STOCH_GPMP_TPU_TESTS=1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="validates Mosaic lowering on TPU"
)


def _problems():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.run import _panda_problem

    fast = _panda_problem(num_goals=1, ppg=5, fast=True)
    ref = _panda_problem(num_goals=1, ppg=5, fast=False)
    return fast, ref


def test_fast_stack_matches_reference_stack_on_tpu():
    (sampler, cost_f, state, obs, s), (_, cost_r, _, _, _) = _problems()
    rng = np.random.default_rng(0)
    trajs = state.particle_means + jnp.asarray(
        rng.normal(0, 0.05, state.particle_means.shape), jnp.float32
    )
    # full stacks: loose tolerance — the quad term (sigma_start=1e-4 ->
    # k=1e8, values ~4e11) amplifies f32 accumulation-order differences
    # between one dense MXU matmul and the structured per-factor sums
    a = np.asarray(jax.jit(lambda tr: cost_f.eval(tr, observation=obs))(trajs))
    b = np.asarray(jax.jit(lambda tr: cost_r.eval(tr, observation=obs))(trajs))
    np.testing.assert_allclose(a, b, rtol=1e-2)
    # field terms alone (the Pallas FK+fields kernel vs the XLA field stack):
    # tight tolerance — same magnitudes, no ill-conditioned quadratic
    fields_f = cost_f.costs[1]
    fields_r = [c for c in cost_r.costs[2:]]

    def ref_fields(tr):
        x = cost_r._fk_trajs(tr)
        return sum(c.eval(tr, x_trajs=x, observation=obs) for c in fields_r)

    fa = np.asarray(
        jax.jit(lambda tr: fields_f.eval(tr, observation=obs))(trajs)
    )
    fb = np.asarray(jax.jit(ref_fields)(trajs))
    np.testing.assert_allclose(fa, fb, rtol=1e-3)


def test_fast_stack_planner_descends_on_tpu():
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    (sampler, cost, state, obs, s), _ = _problems()
    run = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, opt_iters=100, num_samples=s,
            temperature=1.0, step_size=0.1,
        )
    )
    st0_cost = float(cost.eval(state.particle_means, observation=obs).mean())
    new_state, aux = run(sampler, cost, state, obs)
    jax.block_until_ready(new_state.particle_means)
    assert bool(jnp.all(jnp.isfinite(new_state.particle_means)))
    final_cost = float(
        cost.eval(new_state.particle_means, observation=obs).mean()
    )
    assert final_cost < st0_cost  # the importance-weighted update descends
