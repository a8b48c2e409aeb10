"""MFU / roofline accounting for the BASELINE configs (VERDICT r2 weak #5).

For each benchmark config this measures the per-iteration wall time (same
chained-chunk + forced-readback protocol as ``benchmarks/run.py``), pulls
XLA's own cost model (``compiled.cost_analysis()``: flops + bytes accessed)
where the path is pure XLA, and an analytic dominant-matmul FLOP count where
the hot loop is a Pallas kernel (XLA sees those as opaque custom calls).
From these it derives:

- achieved FLOP/s and MFU versus both the v5e bf16 peak (197 TFLOP/s) and
  the f32-effective MXU rate (~197/4 = 49 TFLOP/s — f32 matmuls run as
  multi-pass bf16 on the MXU);
- achieved HBM bytes/s vs the 819 GB/s v5e peak;
- arithmetic intensity (flops/byte) vs the roofline ridge point, and a
  verdict for the BINDING RESOURCE: ``mxu`` (>=40% of f32-effective peak),
  ``hbm`` (>=40% of HBM bandwidth), else ``latency/overhead`` (the per-iter
  scaffolding + ~25 ms tunnel readback amortization floor).

The ``saturation`` config is a deliberately MXU-bound workload — the planar
fused kernel scaled until the two ``[S, M] @ [M, M]`` sampling/cost matmuls
dominate — demonstrating the framework's compute ceiling when the workload
is big enough to amortize everything else.

The reference has no counterpart surface (no benchmarks at all —
BASELINE.md); this is TPU-first accounting per the scaling-book recipe.

Usage: ``python benchmarks/mfu.py [--config 1|3|4|5|saturation ...]``
One JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = V5E_BF16_PEAK / 4  # multi-pass bf16 passes per f32 matmul
V5E_HBM_BW = 819e9


def _time_chunks(run, first_args, n_chunks, sync):
    out = run(*first_args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = run(*(list(out) if isinstance(out, tuple) else [out]))
    sync(out)
    return (time.perf_counter() - t0) / n_chunks


def _verdict(flops_s, bytes_s):
    if flops_s is not None and flops_s >= 0.4 * V5E_F32_PEAK:
        return "mxu"
    if bytes_s is not None and bytes_s >= 0.4 * V5E_HBM_BW:
        return "hbm"
    return "latency/overhead"


def _emit(name, per_iter_s, updates, flops_iter, bytes_iter, flop_source):
    flops_s = flops_iter / per_iter_s if flops_iter else None
    bytes_s = bytes_iter / per_iter_s if bytes_iter else None
    rec = {
        "config": name,
        "ms_per_iter": round(per_iter_s * 1e3, 4),
        "updates_per_sec": round(updates / per_iter_s, 1),
        "gflop_per_iter": round(flops_iter / 1e9, 3) if flops_iter else None,
        "flop_source": flop_source,
        "achieved_tflops": round(flops_s / 1e12, 3) if flops_s else None,
        "mfu_bf16_peak": round(flops_s / V5E_BF16_PEAK, 4) if flops_s else None,
        "mfu_f32_effective": round(flops_s / V5E_F32_PEAK, 4) if flops_s else None,
        "hbm_gb_per_s": round(bytes_s / 1e9, 2) if bytes_s else None,
        "hbm_util": round(bytes_s / V5E_HBM_BW, 4) if bytes_s else None,
        "arith_intensity": round(flops_iter / bytes_iter, 2)
        if (flops_iter and bytes_iter) else None,
        "binding": _verdict(flops_s, bytes_s),
    }
    print(json.dumps(rec), flush=True)
    return rec


# ---------------------------------------------------------------- XLA paths

def xla_stoch_gpmp_mfu(name, sampler, cost, state, obs, *, num_samples,
                       opt_iters, n_chunks=3, step_size=0.5,
                       analytic_flops_iter=None):
    from stoch_gpmp_tpu.planners import stoch_gpmp_optimize

    jf = jax.jit(
        lambda sa, c, st, ob: stoch_gpmp_optimize(
            sa, c, st, ob, opt_iters=opt_iters, num_samples=num_samples,
            temperature=1.0, step_size=step_size,
        )
    )
    # compile ONCE and reuse the executable for both the cost analysis and
    # the timed run (a second trace-compile costs minutes through the
    # remote-compile tunnel)
    try:
        run = jf.lower(sampler, cost, state, obs).compile()
        try:
            ca = run.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
            bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
        except Exception:
            flops, bytes_acc = None, None
    except Exception:
        run, flops, bytes_acc = jf, None, None

    def chunk(st):
        st2, _ = run(sampler, cost, st, obs)
        return st2

    out = chunk(state)
    np.asarray(out.particle_means)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = chunk(out)
    np.asarray(out.particle_means)
    per_iter = (time.perf_counter() - t0) / (n_chunks * opt_iters)

    flop_source = "xla_cost_analysis"
    flops_iter = flops / opt_iters if flops else None
    if flops_iter is None and analytic_flops_iter:
        flops_iter, flop_source = analytic_flops_iter, "analytic_matmul"
    bytes_iter = bytes_acc / opt_iters if bytes_acc else None
    p = state.particle_means.shape[0]
    return _emit(name, per_iter, p, flops_iter, bytes_iter, flop_source)


# ------------------------------------------------------------- fused paths

def fused_planar_mfu(name, ppg, num_samples, opt_iters, n_chunks=3):
    """Planar fused-kernel configs; analytic FLOPs (Pallas is opaque to the
    XLA cost model). Per particle per iteration the kernel's MXU work is the
    sampling matmul ``[S, M] @ [M, M]`` plus the two ``[S, M] @ [M, T]``
    coordinate-selection matmuls (ops/pallas/fused_step.py; the quadratic
    runs as the O(T) VPU stencil since round 3's precision-trap fix)."""
    from benchmarks.run import _planar_problem
    from stoch_gpmp_tpu.ops.pallas.fused_step import (
        fused_planar_optimize_batched,
        make_fused_planar_step_batched,
    )

    sampler, cost, state = _planar_problem(ppg=ppg)
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
        lambda m, k: fused_planar_optimize_batched(step, m, k, opt_iters)
    )
    m1, k1 = run(state.particle_means, state.key)
    np.asarray(m1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        m1, k1 = run(m1, k1)
    np.asarray(m1)
    per_iter = (time.perf_counter() - t0) / (n_chunks * opt_iters)

    m = 4 * 64  # state_dim * traj_len
    s = num_samples
    flops_iter = p * (2 * s * m * m + 2 * 2 * s * m * 64)
    # HBM traffic per iter: means in/out + eps generation is in-kernel; the
    # [M, M] constants are re-read per particle block from HBM into VMEM.
    bytes_iter = 4 * (2 * p * m + 2 * m * m * (p // 8 if p >= 8 else 1))
    return _emit(name, per_iter, p, flops_iter, bytes_iter, "analytic_matmul")


def fused_dof_mfu(name, opt_iters=200, n_chunks=5):
    """Config 5 via the fused dof-factored kernel: per iteration the MXU
    work is the ``[N*d, 2T] @ [2T, 2T]`` sampling matmul + the eye-repeat
    segment matmul; the quadratic runs as the O(T) VPU stencil
    (ops/pallas/panda_step_dof.py — no cost-matrix matmul since round 3's
    precision-trap fix)."""
    from benchmarks.run import _timed_fused_panda_dof

    out = _timed_fused_panda_dof(opt_iters=opt_iters, n_chunks=n_chunks)
    if out is None:
        print(json.dumps({"config": name, "skipped": "needs TPU"}), flush=True)
        return None
    ups, ips = out
    per_iter = 1.0 / ips
    p, s, d, t2 = 1280, 8, 7, 256
    n = p * s
    pb = 128  # particles_per_block the factory picks at this shape
    flops_iter = (
        2 * n * d * t2 * t2  # sampling planes matmul
        + 2 * p * pb * s * t2 * d  # eye-repeat segment matmul, per block
    )
    return _emit(name, per_iter, p, flops_iter, None, "analytic_matmul")


def saturation_mfu(n_chunks=3):
    """Deliberately MXU-bound: the planar fused kernel at 2048 ppg
    (P=6144, S=128) — ~206 GFLOP of [S,M]@[M,M] matmuls per iteration,
    enough to amortize scheduling, RNG, and the readback floor; shows the
    sustained compute ceiling of the planner's hot loop."""
    return fused_planar_mfu("saturation-planar-2048ppg", ppg=2048,
                            num_samples=128, opt_iters=100,
                            n_chunks=n_chunks)


def main():
    from benchmarks.run import _panda_problem, _planar_problem

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", nargs="*", default=["1", "3", "4", "5", "saturation"])
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    for c in args.config:
        if c == "1":
            if on_tpu:
                fused_planar_mfu("planar-parity-64ppg (fused)", ppg=64,
                                 num_samples=128, opt_iters=500)
            sampler, cost, state = _planar_problem(ppg=64)
            xla_stoch_gpmp_mfu("planar-parity-64ppg (xla)", sampler, cost,
                               state, {}, num_samples=128, opt_iters=200)
        elif c == "3":
            if on_tpu:
                fused_planar_mfu("planar-dense-512ppg (fused)", ppg=512,
                                 num_samples=128, opt_iters=200)
        elif c == "4":
            sampler, cost, state, obs, s = _panda_problem(num_goals=1, ppg=5)
            xla_stoch_gpmp_mfu("panda-parity (xla flat)", sampler, cost,
                               state, obs, num_samples=s, opt_iters=1000,
                               step_size=0.1)
        elif c == "5":
            sampler, cost, state, obs, s = _panda_problem(
                num_goals=10, ppg=128, traj_len=128, num_samples=8
            )
            xla_stoch_gpmp_mfu("panda-scaling-10x128 (xla dof)", sampler,
                               cost, state, obs, num_samples=s, opt_iters=200,
                               step_size=0.1)
            if on_tpu:
                fused_dof_mfu("panda-scaling-10x128 (fused dof)")
        elif c == "saturation":
            if on_tpu:
                saturation_mfu()
            else:
                print(json.dumps({"config": "saturation",
                                  "skipped": "needs TPU"}), flush=True)


if __name__ == "__main__":
    main()
