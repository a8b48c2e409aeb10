"""Benchmark: StochGPMP planner throughput on the planar parity workload.

Workload = the reference's ``examples/planar_environment.py`` scale
(3 goals x 5 particles/goal x 128 samples x 64 timesteps x 4 state dims,
15 random obstacles) but float32 (the reference needs float64, see
BASELINE.md). One "particle-trajectory update" = one importance-weighted
mean update of one particle (P updates per optimizer iteration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is vs the 5,000 updates/sec north-star target (BASELINE.json).
"""

import json
import time

import jax


def main():
    from __graft_entry__ import _build_problem
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state = _build_problem(
        n_dof=2, traj_len=64, num_goals=3, ppg=5, with_obstacles=True, fast=True
    )
    num_particles = state.particle_means.shape[0]
    num_samples = 128

    kwargs = dict(
        opt_iters=1000, num_samples=num_samples, temperature=1.0, step_size=0.5
    )
    run = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(sa, c, st, ob, **kwargs)
    )

    import numpy as np

    # warmup / compile (np.asarray forces a device->host readback: honest sync)
    st, aux = run(sampler, cost, state, {})
    _ = np.asarray(st.particle_means)

    # timed: chained async chunks of 1000 scanned iterations; one full host
    # readback at the end forces completion of the whole chain
    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        st, aux = run(sampler, cost, st, {})
    final = np.asarray(st.particle_means)
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(final))

    iters = n_chunks * kwargs["opt_iters"]
    updates_per_sec = num_particles * iters / elapsed
    baseline = 5000.0
    print(
        json.dumps(
            {
                "metric": "planar particle-trajectory updates/sec (P=15, S=128, T=64, f32)",
                "value": round(updates_per_sec, 1),
                "unit": "updates/sec",
                "vs_baseline": round(updates_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
