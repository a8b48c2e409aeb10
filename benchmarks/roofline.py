"""MFU / roofline accounting for the BASELINE configs + a saturation config.

For each config: analytic MXU-matmul FLOPs per iteration (the dominant
counted work: sampling / quadratic / selection / segment matmuls — exact
from the shapes), measured iteration time, achieved MXU FLOP/s, fraction of
the v5e f32 MXU peak, and the implied binding resource (MXU when the matmul
work at peak would account for most of the measured time; latency/VPU/HBM
otherwise — the field kernels and RNG are VPU work not counted as MXU).

Peak reference: one v5e chip ~197 TFLOP/s bf16 => ~49 TFLOP/s f32 through
the MXU's reduced-precision f32 passes (factor 4; public v5e spec). The
percentage column uses that 49.2 TF/s figure.

The saturation config is deliberately MXU-bound: quadratic-only planar
problem with a forced dense M=4096 factor and a large sample batch, so the
two [N, M] @ [M, M] matmuls dominate everything else — it demonstrates the
framework's compute ceiling when the workload is big enough.

Usage: ``python benchmarks/roofline.py [--config N|sat]`` (TPU).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

F32_PEAK = 49.2e12  # v5e MXU f32-effective peak, FLOP/s


def _report(name, mxu_flops_per_iter, iters_per_sec, particles, note=""):
    achieved = mxu_flops_per_iter * iters_per_sec
    frac = achieved / F32_PEAK
    # if running the counted matmuls at peak would cover >60% of the
    # measured iteration, the MXU is the binding resource; otherwise the
    # uncounted work (VPU fields/RNG, HBM, dispatch latency) binds
    mxu_time = mxu_flops_per_iter / F32_PEAK
    measured = 1.0 / iters_per_sec
    bound = "MXU" if mxu_time / measured > 0.6 else (
        "VPU/latency" if mxu_flops_per_iter / measured < 1e12 else "mixed"
    )
    out = {
        "config": name,
        "particles": particles,
        "ms_per_iter": round(measured * 1e3, 3),
        "mxu_gflops_per_iter": round(mxu_flops_per_iter / 1e9, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "pct_f32_peak": round(100 * frac, 1),
        "bound": bound,
    }
    if note:
        out["note"] = note
    print(json.dumps(out), flush=True)
    return out


def config_1():
    from benchmarks.run import _timed_fused_planar

    p, s, m = 192, 128, 256
    r = _timed_fused_planar(ppg=64, num_samples=s, opt_iters=500)
    ups, ips = r
    # per particle: sampling eps@W + quad x@A: 2 * (2 s m^2); segment matmul
    # and raster field are VPU-side
    flops = p * 2 * (2 * s * m * m)
    return _report("planar-parity-64ppg (fused kernel)", flops, ips, p)


def config_3():
    from benchmarks.run import _timed_fused_planar

    p, s, m = 1536, 32, 256
    ups, ips = _timed_fused_planar(ppg=512, num_samples=s, opt_iters=200)
    flops = p * 2 * (2 * s * m * m)
    return _report("planar-512ppg (fused kernel)", flops, ips, p)


def config_4():
    from benchmarks.run import _panda_problem, _timed_updates_per_sec

    sampler, cost, state, obs, s = _panda_problem(num_goals=1, ppg=5)
    ups, ips = _timed_updates_per_sec(
        sampler, cost, state, obs, num_samples=s, opt_iters=1000, n_chunks=5,
        step_size=0.1,
    )
    p = 5
    n = p * s
    d, t2 = 7, 128
    # dof path: sampling + quad as [N*d, 2T] @ [2T, 2T], importance matvec
    flops = 2 * (2 * n * d * t2 * t2) + 2 * p * d * t2 * t2
    return _report("panda-parity (dof fast stack)", flops, ips, p,
                   note="FK+field kernel is VPU work, uncounted")


def config_5():
    from benchmarks.run import _timed_fused_panda_dof

    r = _timed_fused_panda_dof(opt_iters=50, n_chunks=3)
    p, s, d, t2 = 1280, 8, 7, 256
    n = p * s
    ups, ips = r
    flops = 2 * (2 * n * d * t2 * t2) + 2 * p * d * t2 * t2
    return _report("panda-scaling-10x128 (fused dof kernel)", flops, ips, p,
                   note="FK+field kernel is VPU work, uncounted")


def config_sat():
    """Saturation: quadratic-only planar, forced dense M=4096 factor, big
    batch — the two [N, M] @ [M, M] matmuls dominate; demonstrates the
    framework's MXU ceiling."""
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.gp.prior import make_gp_prior
    from stoch_gpmp_tpu.planners import (
        SamplerModel, StochGPMPState, stoch_gpmp_optimize,
    )

    dtype = jnp.float32
    t, n_dof = 1024, 2
    m = 4 * t
    start = jnp.asarray([-9.0, -9.0, 0, 0], dtype)
    goals = jnp.asarray([[9.0, 6.0, 0, 0]], dtype)
    gp = CostGP.create(2, t, start, 0.02,
                       {"sigma_start": 1e-3, "sigma_gp": 0.3}, dtype=dtype)
    goal_prior = CostGoalPrior.create(2, t, goals, sigma_goal_prior=1e-3,
                                      dtype=dtype)
    cost = CostComposite.create(
        2, t, [QuadraticCost.from_gp_and_goal_prior(gp, goal_prior, t)]
    )
    prior = make_gp_prior(2, t, 0.02, start, 1e-3, 3.0, sigma_goal=1e-3,
                          goal_states=goals, dtype=dtype,
                          materialize_dense=True)
    sampler = SamplerModel.from_prior(prior)
    p, s = 128, 32
    means = jnp.repeat(prior.means, p, axis=0)
    state = StochGPMPState(
        particle_means=means, key=jax.random.key(0, impl="unsafe_rbg")
    )
    iters = 20
    run = jax.jit(lambda st: stoch_gpmp_optimize(
        sampler, cost, st, {}, opt_iters=iters, num_samples=s,
        temperature=1.0, step_size=0.5, sample_method="dense")[0])
    st = run(state)
    np.asarray(st.particle_means)
    t0 = time.perf_counter()
    chunks = 3
    for _ in range(chunks):
        st = run(st)
    np.asarray(st.particle_means)
    el = (time.perf_counter() - t0) / (iters * chunks)
    n = p * s
    # sampling eps@W + quad x@A + importance mu@Sigma^-1
    flops = 2 * (2 * n * m * m) + 2 * p * m * m
    return _report("saturation M=4096 dense (P=128, S=32)", flops, 1.0 / el, p)


CONFIGS = {"1": config_1, "3": config_3, "4": config_4, "5": config_5,
           "sat": config_sat}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None,
                    help="1, 3, 4, 5 or 'sat'; default all")
    args = ap.parse_args()
    keys = [args.config] if args.config else ["1", "3", "4", "5", "sat"]
    for k in keys:
        CONFIGS[k]()


if __name__ == "__main__":
    main()
