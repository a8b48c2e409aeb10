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
import os
import subprocess
import sys
import time


def _ensure_live_backend():
    """Probe the default jax backend in a SUBPROCESS with a timeout: a dead
    remote-TPU attachment hangs ``jax.devices()`` indefinitely in-process
    (observed on the axon tunnel), which would leave the driver with no
    number at all. On probe failure re-exec on CPU with an honest marker.

    The re-exec also strips the remote-backend sitecustomize from
    PYTHONPATH: its ``register()`` runs at interpreter start (pre-main) and
    can itself hang on a dead tunnel, so a CPU child with the ambient
    PYTHONPATH would never reach this module. (If THIS process's own
    startup hung there, no in-module guard can help — this guard covers the
    post-registration failure modes.)"""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return False
    # Two spaced probes (VERDICT r3 #9): the tunnel dies and comes back; a
    # single failed probe turned round 3's headline into a CPU number.
    for attempt in range(2):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=420, check=True, capture_output=True,
            )
            return True
        except Exception:
            if attempt == 0:
                time.sleep(120)
    pypath = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=pypath,
               STOCH_GPMP_BENCH_FALLBACK="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


_ensure_live_backend()

import jax  # noqa: E402


def _make_runner(fused: bool):
    """Returns (run(means_state) -> state, initial_state, num_particles).

    ``fused=True`` uses the single-kernel Pallas iteration (TPU only;
    validated for moments/goal-reaching in tests) — the framework's fastest
    correct path. Falls back to the jitted XLA pipeline elsewhere.
    """
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    sampler, cost, state = _build_problem(
        n_dof=2, traj_len=64, num_goals=3, ppg=5, with_obstacles=True, fast=True
    )
    opt_iters, num_samples = 1000, 128
    if os.environ.get("STOCH_GPMP_BENCH_FALLBACK"):
        opt_iters = 100  # CPU emergency number, not the headline protocol

    if fused:
        from stoch_gpmp_tpu.ops.pallas.fused_step import (
            fused_planar_optimize_batched,
            make_fused_planar_step_batched,
        )

        quad = cost.costs[0]
        field = cost.costs[1].field
        p = state.particle_means.shape[0]
        step = make_fused_planar_step_batched(
            weight_t=sampler.weight_t, dof_prior=sampler.dof,
            dof_quad=quad.dof_form, num_particles=p,
            rect_bounds=field.rect_bounds, circles=field.circles,
            cell_size=field.cell_size, nx=field.nx, ny=field.ny,
            traj_len=64, state_dim=4, num_samples=num_samples,
            k_coll=1e10, temperature=1.0, step_size=0.5,
        )
        run = jax.jit(
            lambda ms: fused_planar_optimize_batched(step, ms[0], ms[1], opt_iters)
        )
        return run, (state.particle_means, state.key), p, opt_iters

    run_x = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, opt_iters=opt_iters, num_samples=num_samples,
            temperature=1.0, step_size=0.5,
        )
    )

    def run(ms):
        from stoch_gpmp_tpu.planners import StochGPMPState

        st, _ = run_x(sampler, cost, StochGPMPState(particle_means=ms[0], key=ms[1]), {})
        return st.particle_means, st.key

    return run, (state.particle_means, state.key), state.particle_means.shape[0], opt_iters


def main():
    import numpy as np

    try:
        if jax.default_backend() != "tpu":
            raise RuntimeError("fused kernel path is TPU-only")
        run, ms, num_particles, opt_iters = _make_runner(fused=True)
    except Exception:
        run, ms, num_particles, opt_iters = _make_runner(fused=False)

    # warmup / compile (np.asarray forces a device->host readback: honest sync)
    ms_out = run(ms)
    _ = np.asarray(ms_out[0])

    # timed: chained async chunks of scanned iterations; one full host
    # readback at the end forces completion of the whole chain
    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        ms_out = run(ms_out)
    final = np.asarray(ms_out[0])
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(final))

    iters = n_chunks * opt_iters
    updates_per_sec = num_particles * iters / elapsed
    baseline = 5000.0
    rec = {
        "metric": "planar particle-trajectory updates/sec (P=15, S=128, T=64, f32)",
        "value": round(updates_per_sec, 1),
        "unit": "updates/sec",
        "vs_baseline": round(updates_per_sec / baseline, 3),
    }
    if os.environ.get("STOCH_GPMP_BENCH_FALLBACK"):
        rec["note"] = "TPU backend unavailable at run time; CPU fallback"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
