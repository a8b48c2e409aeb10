"""StochGPMP: importance-weighted stochastic trajectory optimization.

Capability parity with the reference planner
(``stoch_gpmp/planner.py:18-348``), redesigned TPU-first:

- The per-iteration pipeline (sample -> cost -> importance-correct -> softmax
  -> mean update, reference ``planner.py:239-275``) is ONE pure jitted
  function; ``optimize`` runs it under ``lax.scan`` so a whole optimization
  runs on-device with zero host round-trips (the reference dispatches every
  op from Python each iteration).
- Sampling draws all ``particles x samples`` trajectories with a single
  batched matmul against the structured prior's materialized ``L^{-T}``
  (see ``gp/tridiag.py``) instead of rebuilding a dense
  ``MultivariateNormal`` every iteration
  (reference ``mp_priors_multi.py:106-110``).
- The importance cross-term ``V Sigma^{-1} U`` (reference ``planner.py:236``)
  uses the O(T d^2) block-tridiagonal matvec, never a dense ``M x M`` product.
- Goals, particles and samples are pure batch axes — shardable across a
  device mesh (see ``parallel/sharding.py``).

State layout matches the reference: ``particle_means [P, T, d]`` with
``P = num_goals * num_particles_per_goal`` goal-major, positions in
``[..., :n_dof]`` and velocities in ``[..., n_dof:]``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from stoch_gpmp_tpu.gp.prior import GPPrior, make_gp_prior
from stoch_gpmp_tpu.gp.tridiag import BlockBidiagChol, BlockTridiag


@struct.dataclass
class SamplerModel:
    """The (shared-precision) Gaussian sampler around particle means:
    structured precision + Cholesky + materialized ``L^{-T}``.

    ``precision_dense`` is the dense ``[M, M]`` precision kept alongside the
    structured form: at planner scales (M <= ~1k) applying it as one MXU
    matmul in the hot loop beats the O(T d^2) chain of small block ops (the
    structured form remains the numerically-stable construction path and the
    memory-efficient choice for long horizons)."""

    precision: BlockTridiag
    chol: BlockBidiagChol
    weight_t: jnp.ndarray | None  # [M, M] = L^{-1}; samples = eps @ weight_t
    precision_dense: jnp.ndarray | None  # [M, M]
    # long-horizon mode: parallel-in-time (associative-scan) solver for the
    # sampling substitution — O(log T) depth vs the sequential scan's O(T)
    psolver: object | None = None
    # per-dof factored plane-ordered form (gp/dof_factored.py): the [2T, 2T]
    # shared sampling factor + precision; exact under scalar sigmas
    dof: object | None = None

    @classmethod
    def from_prior(cls, prior: GPPrior) -> "SamplerModel":
        dense = prior.weight_t is not None
        return cls(
            precision=prior.precision,
            chol=prior.chol,
            weight_t=prior.weight_t,
            precision_dense=prior.precision.to_dense() if dense else None,
            psolver=prior.psolver,
            dof=prior.dof,
        )


@struct.dataclass
class StochGPMPState:
    """Checkpointable planner state (SURVEY.md §5: particle means + PRNG key
    are the complete resume state)."""

    particle_means: jnp.ndarray  # [P, T, d]
    key: jax.Array


@struct.dataclass
class StochGPMPAux:
    """Per-call outputs mirroring the reference optimize() return tuple
    (``planner.py:310-317``)."""

    samples: jnp.ndarray  # [P, S, T, d]
    costs: jnp.ndarray  # [P, S]
    weights: jnp.ndarray  # [P, S]
    grad: jnp.ndarray  # [P, T, d]


@struct.dataclass
class IterMetrics:
    """Structured per-iteration observability emitted from inside the scanned
    loop (the reference only prints wall-clock + mean cost every 50 iters,
    ``planner.py:668-672``; SURVEY.md §5 asks for structured metrics)."""

    cost_mean: jnp.ndarray  # [iters]
    cost_min: jnp.ndarray  # [iters]
    weight_entropy: jnp.ndarray  # [iters] mean over particles
    update_norm: jnp.ndarray  # [iters] mean ||step|| over particles

    @classmethod
    def from_aux(cls, aux: StochGPMPAux, step_size: float) -> "IterMetrics":
        w = aux.weights
        entropy = -jnp.sum(w * jnp.log(w + 1e-30), axis=1).mean()
        return cls(
            cost_mean=aux.costs.mean(),
            cost_min=aux.costs.min(),
            weight_entropy=entropy,
            update_norm=(step_size * jnp.linalg.norm(
                aux.grad.reshape(aux.grad.shape[0], -1), axis=-1
            )).mean(),
        )


def stoch_gpmp_step(
    sampler: SamplerModel,
    cost: Any,
    state: StochGPMPState,
    observation: dict,
    *,
    num_samples: int,
    temperature: float,
    step_size: float,
    sample_method: str = "dense",
    shard_samples=None,
    sample_dtype=None,
    plane_stream: bool = False,
) -> tuple[StochGPMPState, StochGPMPAux]:
    """One importance-weighted update of all particle means. Pure function.

    ``shard_samples``: optional callable applying a sharding constraint to the
    ``[P, S, T, d]`` sample batch (see ``parallel/sharding.py``).
    ``sample_dtype``: optional reduced precision (e.g. ``jnp.bfloat16``) for
    the sampling matmul — runs the MXU at 4x the f32 rate at large M, at the
    cost of ~1e-2 relative perturbation of the proposal draws (the algorithm
    remains valid: costs/weights are evaluated on the actual samples).
    ``plane_stream``: draw eps and solve in the plane-major order of the
    long-horizon plane path, so toggling ``collect_metrics``/``shard_samples``
    on a plane-eligible problem does NOT change the planned trajectories
    (``stoch_gpmp_optimize`` sets this from the problem regime, not the
    execution path; tested in ``tests/test_planner_planar.py``).
    """
    means = state.particle_means  # [P, T, d]
    p, t, d = means.shape
    m = t * d
    means_flat = means.reshape(p, m)
    key, sub = jax.random.split(state.key)

    eps_dtype = sample_dtype if sample_dtype is not None else means.dtype
    if plane_stream and sampler.psolver is not None:
        # identical stream + solve as _stoch_gpmp_optimize_planes, then one
        # stack back to the [P, S, T, d] batch this path operates on
        eps = jax.random.normal(sub, (d, p, num_samples, t), dtype=eps_dtype)
        corr_planes = sampler.psolver.solve_LT_planes(
            tuple(eps[i].astype(means.dtype) for i in range(d))
        )
        corr = jnp.stack(corr_planes, axis=-1).reshape(p, num_samples, m)
    else:
        # --- sample: x = mu + eps @ L^{-T}^T (one MXU matmul) ---
        eps = jax.random.normal(sub, (p, num_samples, m), dtype=eps_dtype)
        if shard_samples is not None:
            eps = shard_samples(eps.reshape(p, num_samples, t, d)).reshape(
                p, num_samples, m
            )
        if sample_method == "dense" and sampler.weight_t is not None:
            corr = (eps @ sampler.weight_t.astype(eps_dtype)).astype(means.dtype)
        else:  # long-horizon / explicit scan path: structured solve — parallel
            # in time (O(log T) associative scan) when the solver was built
            solver = sampler.psolver if sampler.psolver is not None else sampler.chol
            corr = solver.solve_LT(
                eps.astype(means.dtype).reshape(p, num_samples, t, d)
            ).reshape(p, num_samples, m)
    flat = means_flat[:, None] + corr  # [P, S, M]
    samples = flat.reshape(p, num_samples, t, d)
    if shard_samples is not None:
        samples = shard_samples(samples)
        flat = samples.reshape(p, num_samples, m)

    # --- cost evaluation (vectorized over the flat batch) ---
    costs = cost.eval(
        samples.reshape(p * num_samples, t, d), observation=observation
    ).reshape(p, num_samples)

    # --- importance-sampling correction: + tau * V Sigma^{-1} U
    # (reference planner.py:234-236). Sigma^{-1} u via the exact O(T)
    # factor-graph stencil when the prior is dof-factored (scalar sigmas —
    # always, for the reference API): the dense [M, M] matmul feeds the
    # ~1e10-scale precision through default bf16 MXU passes on TPU
    # (gp/dof_factored.py); dense/structured forms remain as fallbacks ---
    if sampler.dof is not None and sampler.dof.q_i2 is not None:
        prec_u = sampler.dof.matvec_flat(means).reshape(p, m)
    elif sampler.precision_dense is not None:
        prec_u = means_flat @ sampler.precision_dense  # [P, M]
    else:
        prec_u = sampler.precision.matvec(means).reshape(p, m)
    # elementwise multiply + reduce (VPU-exact), not a dot_general
    costs = costs + temperature * jnp.sum(flat * prec_u[:, None], axis=-1)

    # --- softmax re-weighting and mean update (planner.py:263-275) ---
    weights = jax.nn.softmax(-costs / temperature, axis=1)  # over samples
    # compute the update FLAT: an add in [P, T, d] shape invites a ~9x-padded
    # layout; flat [P, M] reshapes cancel against the flat scan carry
    grad_flat = jnp.einsum("ps,psm->pm", weights, flat - means_flat[:, None])
    new_means = (means_flat + step_size * grad_flat).reshape(p, t, d)

    return (
        StochGPMPState(particle_means=new_means, key=key),
        StochGPMPAux(
            samples=samples, costs=costs, weights=weights,
            grad=grad_flat.reshape(p, t, d),
        ),
    )


def _plane_metrics(costs, weights, grads, step_size) -> IterMetrics:
    """``IterMetrics`` computed directly on plane-layout quantities (no
    ``[.., T, d]`` stacking inside the scanned loop)."""
    entropy = -jnp.sum(weights * jnp.log(weights + 1e-30), axis=1).mean()
    sq = None
    for g in grads:
        term = jnp.sum(g * g, axis=-1)
        sq = term if sq is None else sq + term
    return IterMetrics(
        cost_mean=costs.mean(),
        cost_min=costs.min(),
        weight_entropy=entropy,
        update_norm=(step_size * jnp.sqrt(sq)).mean(),
    )


def _stoch_gpmp_optimize_planes(
    sampler, cost, state, observation, *, opt_iters, num_samples,
    temperature, step_size, collect_metrics=False,
):
    """Long-horizon optimize in PLANE layout: every per-iteration tensor is a
    per-dim time plane ``[P(, S), T]`` — dense (8, 128) tiles — instead of
    ``[.., T, d]``, whose d-wide minor dim pads up to 32x on TPU tiles and
    dominated the long-horizon iteration (see docs/PERFORMANCE.md). Same
    update rule; the eps stream is drawn plane-major, and the legacy path
    draws the SAME stream on plane-eligible problems (``plane_stream`` in
    ``stoch_gpmp_step``), so observability/sharding toggles don't change the
    planned trajectories."""
    p, t, d = state.particle_means.shape
    dtype = state.particle_means.dtype
    psolver = sampler.psolver

    def step(planes, key):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, (d, p, num_samples, t), dtype=dtype)
        corr = psolver.solve_LT_planes(tuple(eps[i] for i in range(d)))
        x = tuple(planes[i][:, None] + corr[i] for i in range(d))
        costs = cost.eval_planes(x, observation=observation)  # [P, S]
        pu = sampler.precision.matvec_planes(planes)  # [P, T] each
        imp = None
        for i in range(d):
            term = jnp.sum(x[i] * pu[i][:, None], axis=-1)
            imp = term if imp is None else imp + term
        costs = costs + temperature * imp
        weights = jax.nn.softmax(-costs / temperature, axis=1)
        grads = tuple(
            jnp.einsum("ps,pst->pt", weights, corr[i]) for i in range(d)
        )
        new_planes = tuple(
            planes[i] + step_size * grads[i] for i in range(d)
        )
        return new_planes, key, costs, weights, grads, x

    means_planes = tuple(state.particle_means[..., i] for i in range(d))

    def body(carry, _):
        planes, key = carry
        new_planes, key, costs, weights, grads, _ = step(planes, key)
        ys = (
            _plane_metrics(costs, weights, grads, step_size)
            if collect_metrics else None
        )
        return (new_planes, key), ys

    (planes, key), metrics = jax.lax.scan(
        body, (means_planes, state.key), None, length=opt_iters - 1
    )
    new_planes, key, costs, weights, grads, x = step(planes, key)
    new_means = jnp.stack(new_planes, axis=-1)  # [P, T, d] — once, at exit
    aux = StochGPMPAux(
        samples=jnp.stack(x, axis=-1),
        costs=costs,
        weights=weights,
        grad=jnp.stack(grads, axis=-1),
    )
    out_state = StochGPMPState(particle_means=new_means, key=key)
    if not collect_metrics:
        return out_state, aux
    last = _plane_metrics(costs, weights, grads, step_size)
    metrics = jax.tree_util.tree_map(
        lambda hist, l: jnp.concatenate([hist, l[None]]), metrics, last
    )
    return out_state, aux, metrics


def _dof_quad_split(cost):
    """Split a dof-capable cost stack into ``(DofQuadraticCost, rest)`` when
    it contains exactly one quadratic component (bare or wrapped with a
    ``dof_form``); ``(None, None)`` otherwise — the fused-quadratic fast
    path then stays off and the composite eval runs unchanged."""
    from stoch_gpmp_tpu.gp.dof_factored import DofQuadraticCost

    comps = list(getattr(cost, "costs", None) or [cost])
    quads = [
        (i, c if isinstance(c, DofQuadraticCost) else c.dof_form)
        for i, c in enumerate(comps)
        if isinstance(c, DofQuadraticCost)
        or getattr(c, "dof_form", None) is not None
    ]
    if len(quads) != 1:
        return None, None
    i, dq = quads[0]
    return dq, [c for j, c in enumerate(comps) if j != i]


def _stoch_gpmp_optimize_dof(
    sampler, cost, state, observation, *, opt_iters, num_samples,
    temperature, step_size, collect_metrics=False, shard_dof=None,
    shard_dof_quad=None,
):
    """Optimize in the per-dof factored PLANE-MAJOR layout
    (``gp/dof_factored.py``): means/samples live as ``[P(, S), d, 2T]``
    planes; sampling and the quadratic/importance terms run per dof against
    the shared ``[2T, 2T]`` factor — a factor-``d`` FLOP reduction over the
    dense ``[M, M]`` matmuls, with the position planes falling straight out
    of the sampling matmul (no selection matmul, no ``[.., T, d]``
    relayouts). This is the d>8 long-horizon/scaling fast path (the d<=8
    plane path keeps the pscan stream; see ``stoch_gpmp_optimize``)."""
    from stoch_gpmp_tpu.gp.dof_factored import from_dof_planes, to_dof_planes

    p, t, d2 = state.particle_means.shape
    dof = sampler.dof
    # On TPU the quadratic + importance fuse into ONE Pallas pass over the
    # [d, N, 2T] sample batch (ops/pallas/stencil.py): left in XLA, the
    # stencil's shifted elementwise passes plus the x.pu reduce each
    # re-stream the whole batch through HBM (measured ~2.4x iteration
    # regression at config 5 — docs/PERFORMANCE.md round 3). Sharded runs
    # reach the same kernel per-shard via shard_map (``shard_dof_quad``,
    # built in parallel/sharding.py — the kernel is per-row independent,
    # so GSPMD's softmax all-reduce over ``s`` stays outside it).
    dq, rest_costs = (
        _dof_quad_split(cost)
        if (shard_dof_quad is not None
            or (shard_dof is None and jax.default_backend() == "tpu"))
        else (None, None)
    )

    def step(mu_planes, key):
        key, sub = jax.random.split(key)
        x, corr = dof.sample_planes(sub, mu_planes, num_samples)  # [d,P,S,2T]
        if shard_dof is not None:
            x, corr = shard_dof(x), shard_dof(corr)
        x_flat = x.reshape(d2 // 2, p * num_samples, 2 * t)
        pu = dof.matvec_planes(mu_planes)  # [d, P, 2T] (exact stencil)
        if shard_dof is not None:
            pu = shard_dof(pu)
        fused = None
        if dq is not None and shard_dof_quad is not None:
            f2 = shard_dof_quad(dq, x, pu, temperature)  # [P, S] | None
            fused = None if f2 is None else f2.reshape(p * num_samples)
        elif dq is not None:
            from stoch_gpmp_tpu.ops.pallas.stencil import dof_quad_eval_pallas

            fused = dof_quad_eval_pallas(
                dq, x_flat, pu=pu, temperature=temperature,
                num_samples=num_samples,
            )
        if fused is not None:
            costs = fused
            for c in rest_costs:
                costs = costs + c.eval_dof_planes(
                    x_flat, observation=observation
                )
            costs = costs.reshape(p, num_samples)
        else:
            costs = cost.eval_dof_planes(
                x_flat, observation=observation,
            ).reshape(p, num_samples)
            # elementwise multiply + reduce (VPU-exact) — an einsum here
            # becomes a dot_general whose default bf16 MXU passes add noise
            # at the ~1e6-scale pu entries
            costs = costs + temperature * jnp.sum(
                x * pu[:, :, None, :], axis=(0, -1)
            )
        weights = jax.nn.softmax(-costs / temperature, axis=1)
        grad = jnp.einsum("ps,dpsk->dpk", weights, corr)
        if shard_dof is not None:
            grad = shard_dof(grad)
        new_mu = mu_planes + step_size * grad
        return new_mu, key, costs, weights, grad, x

    def _metrics(costs, weights, grad):
        entropy = -jnp.sum(weights * jnp.log(weights + 1e-30), axis=1).mean()
        nrm = jnp.sqrt(jnp.sum(grad * grad, axis=(0, -1)))
        return IterMetrics(
            cost_mean=costs.mean(), cost_min=costs.min(),
            weight_entropy=entropy, update_norm=(step_size * nrm).mean(),
        )

    def body(carry, _):
        mu, key = carry
        new_mu, key, costs, weights, grad, _ = step(mu, key)
        ys = _metrics(costs, weights, grad) if collect_metrics else None
        return (new_mu, key), ys

    mu0 = to_dof_planes(state.particle_means)
    (mu, key), metrics = jax.lax.scan(
        body, (mu0, state.key), None, length=opt_iters - 1
    )
    new_mu, key, costs, weights, grad, x = step(mu, key)
    out_state = StochGPMPState(
        particle_means=from_dof_planes(new_mu), key=key
    )
    aux = StochGPMPAux(
        samples=from_dof_planes(x), costs=costs, weights=weights,
        grad=from_dof_planes(grad),
    )
    if not collect_metrics:
        return out_state, aux
    last = _metrics(costs, weights, grad)
    metrics = jax.tree_util.tree_map(
        lambda hist, l: jnp.concatenate([hist, l[None]]), metrics, last
    )
    return out_state, aux, metrics


def stoch_gpmp_optimize(
    sampler: SamplerModel,
    cost: Any,
    state: StochGPMPState,
    observation: dict,
    *,
    opt_iters: int,
    num_samples: int,
    temperature: float,
    step_size: float,
    sample_method: str = "dense",
    shard_samples=None,
    sample_dtype=None,
    collect_metrics: bool = False,
    shard_dof=None,
    shard_dof_quad=None,
) -> tuple[StochGPMPState, StochGPMPAux] | tuple[StochGPMPState, StochGPMPAux, IterMetrics]:
    """Run ``opt_iters`` updates under ``lax.scan``; returns the final state
    and the LAST iteration's aux (matching the reference's return of the
    final iteration's samples/costs, ``planner.py:289-317``). With
    ``collect_metrics`` also returns stacked per-iteration ``IterMetrics``.

    The eps stream is a function of the PROBLEM regime, not the execution
    path: on plane-eligible problems (long-horizon structured sampler, d<=8,
    plane-capable cost) both the plane fast path and the legacy path draw the
    same plane-major stream, so toggling ``collect_metrics``/``shard_samples``
    never changes the planned trajectories at a fixed seed (tested).
    ``sample_dtype`` is inherently a different stream (reduced-precision
    draws)."""

    if opt_iters < 1:
        raise ValueError(f"opt_iters must be >= 1, got {opt_iters}")

    p, t, d = state.particle_means.shape

    # Plane-eligibility of the PROBLEM (exclusive of observability/sharding
    # toggles): structured sampler + plane-capable cost stack, small block
    # dim. Gated to d <= 8: at d=14 the d^2-multiply plane pipelines stop
    # fusing on XLA TPU and memory traffic explodes (measured 7.5x SLOWER
    # than the dense stack at the Panda scaling config — docs/PERFORMANCE.md
    # round 2; the dof-factored fast stack covers that regime instead).
    plane_eligible = (
        d <= 8
        and sampler.weight_t is None
        and sampler.psolver is not None
        and sample_method == "dense"
        and getattr(cost, "supports_planes", lambda: False)()
    )

    # Per-dof factored plane path (gp/dof_factored.py): the fast stack for
    # EVERY dof-capable stack with a 128-aligned horizon and the dof factor
    # built (2T <= 2048), plus an explicit opt-in via sample_method='dof'.
    # Deterministic in the PROBLEM (not in observability toggles), like the
    # plane gate below — but a DIFFERENT eps-stream mapping than the
    # flat/plane paths, so the auto-gate picks the winner per problem, not a
    # stream-stable default. Round-5 hardware A/B
    # (benchmarks/long_horizon.py --planar-dof, v5e, d=2, 15 particles x 32
    # samples, idle host, 1000-iter amortization; updates/s no-obst/obst):
    #   T=128: dof 358/374k  flat 359/322k  pscan 75/71k
    #   T=256: dof 348/285k  flat 285/211k  pscan 65/65k
    #   T=512: dof 231/199k  flat 139/97k   pscan 50/50k
    #   T=1024: dof 108/91k  flat 26/23k    pscan 35/34k
    # dof wins or ties at every eligible horizon (4.2x vs flat at T=1024),
    # so it outranks both the plane path and the flat stack whenever
    # eligible; beyond T=1024 the dof factor isn't built and the pscan
    # plane path below takes over. Auto-routing still requires the
    # 128-aligned horizon: at T=64 the position planes pad 64->128 lanes
    # per dof and the tiny per-dof matmuls lose to the flat stack's single
    # big matmul (latency-bound at 36 us/iter — docs/PERFORMANCE.md).
    dof_eligible = (
        sampler.dof is not None
        and sample_dtype is None
        and getattr(cost, "supports_dof_planes", lambda: False)()
        and (
            (shard_samples is None and (
                sample_method == "dof"
                or (sample_method == "dense" and t % 128 == 0)))
            # multi-chip dof layout: an explicit dof-layout constraint
            # (parallel/sharding.py make_sharded_optimize(layout='dof'))
            # opts in; the legacy shard_samples constraint closes over the
            # [P, S, T, d] layout and must NOT reach the dof planes
            or (shard_dof is not None and shard_samples is None
                and sample_method == "dof")
        )
    )
    if dof_eligible:
        return _stoch_gpmp_optimize_dof(
            sampler, cost, state, observation, opt_iters=opt_iters,
            num_samples=num_samples, temperature=temperature,
            step_size=step_size, collect_metrics=collect_metrics,
            shard_dof=shard_dof, shard_dof_quad=shard_dof_quad,
        )
    if shard_dof is not None:
        raise ValueError(
            "shard_dof requires the dof-factored path: sample_method='dof', "
            "a sampler with .dof, a dof-capable cost stack, and no "
            "shard_samples/sample_dtype"
        )

    if plane_eligible and shard_samples is None and sample_dtype is None:
        return _stoch_gpmp_optimize_planes(
            sampler, cost, state, observation, opt_iters=opt_iters,
            num_samples=num_samples, temperature=temperature,
            step_size=step_size, collect_metrics=collect_metrics,
        )

    def body(carry, _):
        means_flat, key = carry
        new_state, aux = stoch_gpmp_step(
            sampler,
            cost,
            StochGPMPState(particle_means=means_flat.reshape(p, t, d), key=key),
            observation,
            num_samples=num_samples,
            temperature=temperature,
            step_size=step_size,
            sample_method=sample_method,
            shard_samples=shard_samples,
            sample_dtype=sample_dtype,
            plane_stream=plane_eligible and sample_dtype is None,
        )
        ys = IterMetrics.from_aux(aux, step_size) if collect_metrics else None
        # carry the means FLAT: a [P, T, d] carry keeps the 14-wide minor dim,
        # which tiles onto (8, 128) vregs with ~9x padding and made the carry
        # handling itself a measurable cost (docs/PERFORMANCE.md round 2)
        return (new_state.particle_means.reshape(p, t * d), new_state.key), ys

    (means_flat, key), metrics = jax.lax.scan(
        body, (state.particle_means.reshape(p, t * d), state.key), None,
        length=opt_iters - 1,
    )
    state = StochGPMPState(particle_means=means_flat.reshape(p, t, d), key=key)
    final_state, aux = stoch_gpmp_step(
        sampler,
        cost,
        state,
        observation,
        num_samples=num_samples,
        temperature=temperature,
        step_size=step_size,
        sample_method=sample_method,
        shard_samples=shard_samples,
        sample_dtype=sample_dtype,
        plane_stream=plane_eligible and sample_dtype is None,
    )
    if not collect_metrics:
        return final_state, aux
    last = IterMetrics.from_aux(aux, step_size)
    metrics = jax.tree_util.tree_map(
        lambda hist, l: jnp.concatenate([hist, l[None]]), metrics, last
    )
    return final_state, aux, metrics


class StochGPMP:
    """Stateful convenience wrapper with the reference's API surface
    (``__init__`` kwargs, ``reset``, ``optimize``, ``get_recent_samples``,
    ``sample_trajectories`` — reference ``planner.py:18-348``).

    All heavy lifting happens in the pure functions above; this class only
    holds state and the jit cache.
    """

    def __init__(
        self,
        num_particles_per_goal,
        num_samples,
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
        seed: int = 0,
        dtype=jnp.float32,
        sample_method: str = "dense",
        prng_impl: str | None = None,
        mesh=None,
        fused_kernel: bool = False,
        **kwargs,
    ):
        # prng_impl: None -> jax default (threefry: reproducible and stable
        # under sharding). 'rbg'/'unsafe_rbg' use the TPU-native hardware
        # generator — ~2x faster planner iterations, but bit patterns may vary
        # across backends/shardings.
        # mesh: a jax.sharding.Mesh with ('p', 's') axes (parallel/sharding.py
        # make_mesh) — optimize() then runs multi-chip: particles shard over
        # 'p', Monte-Carlo samples over 's' (sample_method='dof' uses the
        # dof-factored sharded layout). Same trajectories as single-device
        # up to f32 all-reduce ordering (tested on the virtual mesh).
        # fused_kernel: opt into the fully-fused single-Pallas-kernel
        # iteration (planners/fused_exec.py) — the Panda dof kernel (~2x
        # the XLA dof path at BASELINE config 5) or the batched planar
        # kernel (the bench.py headline path), auto-matched to the cost
        # stack. Different (hardware-PRNG) eps stream;
        # optimize() keeps the FINAL iteration on the normal path so the
        # reference-shaped aux/samples API is intact. Incompatible with
        # mesh= and ignored when collect_metrics=True (per-iteration
        # metrics need the per-iteration aux).
        if fused_kernel and mesh is not None:
            raise ValueError("fused_kernel=True is single-chip only (no mesh=)")
        self.fused_kernel = fused_kernel
        self._fused_cache: dict = {}
        self.mesh = mesh
        self._sharded_cache: dict = {}
        self.n_dof = n_dof
        self.d_state_opt = 2 * n_dof
        self.dt = dt
        self.traj_len = traj_len
        self.goal_directed = multi_goal_states is not None
        self.num_goals = (
            multi_goal_states.shape[0] if self.goal_directed else 1
        )
        self.num_particles_per_goal = num_particles_per_goal
        self.num_particles = num_particles_per_goal * self.num_goals
        self.num_samples = num_samples
        self.opt_iters = opt_iters
        self.step_size = step_size
        self.temperature = temperature
        self.sigma_start_init = sigma_start_init
        self.sigma_start_sample = sigma_start_sample
        self.sigma_goal_init = sigma_goal_init
        self.sigma_goal_sample = sigma_goal_sample
        self.sigma_gp_init = sigma_gp_init
        self.sigma_gp_sample = sigma_gp_sample
        self.cost = cost
        self.dtype = dtype
        self.sample_method = sample_method
        if prng_impl is None:
            self._key = jax.random.PRNGKey(seed)
        else:
            self._key = jax.random.key(seed, impl=prng_impl)
        self._recent_aux: StochGPMPAux | None = None

        self.reset(start_state, multi_goal_states, initial_particle_means)

    # ------------------------------------------------------------------ #

    def reset(
        self,
        start_state=None,
        multi_goal_states=None,
        initial_particle_means=None,
    ):
        if start_state is not None:
            self.start_state = jnp.asarray(start_state, dtype=self.dtype)
        if multi_goal_states is not None:
            self.multi_goal_states = jnp.asarray(multi_goal_states, dtype=self.dtype)
        elif not self.goal_directed:
            self.multi_goal_states = None

        goals = self.multi_goal_states if self.goal_directed else None

        # Initialization prior (init sigmas) -> initial particle means,
        # reference planner.py:205-215.
        if initial_particle_means is not None:
            if isinstance(initial_particle_means, str):
                if initial_particle_means != "const_vel":
                    raise ValueError(initial_particle_means)
                from stoch_gpmp_tpu.gp.prior import const_vel_means

                means = const_vel_means(
                    self.start_state, goals, self.traj_len - 1, self.dt, self.n_dof
                )
                means = jnp.tile(means[:, None], (1, self.num_particles_per_goal, 1, 1))
            else:
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
        particle_means = means.reshape(
            self.num_particles, self.traj_len, self.d_state_opt
        )

        # Sampling prior (sample sigmas) -> shared structured sampler,
        # reference planner.py:218-227.
        sample_prior = make_gp_prior(
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
        self.sampler = SamplerModel.from_prior(sample_prior)
        self.state = StochGPMPState(particle_means=particle_means, key=self._key)
        self._fused_cache = {}  # executor closes over the sampler/goals
        if self.mesh is not None:
            from stoch_gpmp_tpu.parallel import shard_planner_state

            self.state = shard_planner_state(self.mesh, self.state)
            self._sharded_cache.clear()

        self._jit_optimize = functools.partial(
            jax.jit,
            static_argnames=("opt_iters", "num_samples", "temperature", "step_size",
                             "sample_method", "collect_metrics"),
        )(stoch_gpmp_optimize)
        self.last_metrics: IterMetrics | None = None

    @property
    def particle_means(self) -> jnp.ndarray:
        return self.state.particle_means

    @property
    def Sigma_inv(self) -> BlockTridiag:
        """Structured precision of the sampling distribution (the reference
        exposes the dense ``Sigma_inv``, ``planner.py:226``; call
        ``.to_dense()`` for the dense form)."""
        return self.sampler.precision

    def optimize(self, opt_iters=None, debug=False, observation=None,
                 collect_metrics=False, **obs_kwargs):
        """Run the jitted scan; returns the reference's 6-tuple
        ``(state_particles, control_particles, state_trajectories,
        control_samples, costs, grad)`` (``planner.py:310-317``). With
        ``collect_metrics`` the per-iteration ``IterMetrics`` land in
        ``self.last_metrics``."""
        observation = dict(observation or {})
        observation.update(obs_kwargs)
        iters = self.opt_iters if opt_iters is None else opt_iters

        if self.fused_kernel and not collect_metrics and iters > 1:
            run = self._fused_runner(observation)
            self.state = run(self.state, iters - 1)
            iters = 1  # final iteration on the normal path -> full aux

        if self.mesh is not None:
            out = self._sharded_runner(iters, collect_metrics)(
                self.sampler, self.cost, self.state, observation
            )
        else:
            out = self._jit_optimize(
                self.sampler,
                self.cost,
                self.state,
                observation,
                opt_iters=iters,
                num_samples=self.num_samples,
                temperature=self.temperature,
                step_size=self.step_size,
                sample_method=self.sample_method,
                collect_metrics=collect_metrics,
            )
        if collect_metrics:
            self.state, aux, self.last_metrics = out
        else:
            self.state, aux = out
        self._recent_aux = aux
        n = self.n_dof
        means = self.state.particle_means
        return (
            means[..., :n],  # state_particles (mean positions)
            means[..., n:],  # control_particles (mean velocities)
            aux.samples[..., :n],  # state_trajectories (sample positions)
            aux.samples[..., n:],  # control_samples (sample velocities)
            aux.costs,
            aux.grad,
        )

    def _fused_runner(self, observation: dict):
        """Cached fused-kernel executor (``fused_kernel=True`` mode); keyed
        on the statics the executor bakes in plus the obstacle spheres'
        bytes (they ride into the kernel as a constant operand)."""
        spheres = observation.get("obstacle_spheres", None)
        skey = (None if spheres is None
                else np.asarray(spheres).astype(np.float32).tobytes())
        key = (skey, self.num_samples, self.temperature, self.step_size)
        if key not in self._fused_cache:
            from stoch_gpmp_tpu.planners.fused_exec import (
                build_fused_executor,
            )

            run, reason = build_fused_executor(
                self.sampler, self.cost, observation,
                num_particles=self.num_particles,
                num_samples=self.num_samples,
                temperature=self.temperature,
                step_size=self.step_size,
            )
            if run is None:
                raise ValueError(
                    f"fused_kernel=True but the stack is ineligible: {reason}"
                )
            self._fused_cache[key] = run
        return self._fused_cache[key]

    def _sharded_runner(self, iters: int, collect_metrics: bool):
        """Cached sharded optimize (``mesh=`` mode) for one static config.
        Every static the unsharded path reads fresh per call is part of the
        cache key, so mutating e.g. ``self.temperature`` between optimize()
        calls behaves identically in both modes."""
        key = (iters, collect_metrics, self.num_samples, self.temperature,
               self.step_size, self.sample_method)
        if key not in self._sharded_cache:
            from stoch_gpmp_tpu.parallel import make_sharded_optimize

            layout = "dof" if self.sample_method == "dof" else "flat"
            kw = {} if layout == "dof" else {
                "sample_method": self.sample_method
            }
            self._sharded_cache[key] = make_sharded_optimize(
                self.mesh, layout=layout, opt_iters=iters,
                num_samples=self.num_samples, temperature=self.temperature,
                step_size=self.step_size, collect_metrics=collect_metrics,
                **kw,
            )
        return self._sharded_cache[key]

    def get_recent_samples(self):
        """(sample positions, sample velocities) of the last optimize call,
        shaped ``[P, S, T, n_dof]`` (reference ``planner.py:330-337``)."""
        aux = self._recent_aux
        n = self.n_dof
        return aux.samples[..., :n], aux.samples[..., n:]

    def get_traj(self, mode: str = "best"):
        """Best-weighted sample trajectory or the mean (reference ``_get_traj``,
        ``planner.py:319-328``, generalized to multi-particle: 'best' picks the
        globally highest-weight sample)."""
        if mode == "best":
            aux = self._recent_aux
            flat = aux.weights.reshape(-1)
            idx = int(jnp.argmax(flat))
            p, s = divmod(idx, self.num_samples)
            return aux.samples[p, s]
        if mode == "mean":
            return self.state.particle_means
        raise ValueError(f"unknown mode: {mode}")

    def sample_trajectories(self, num_samples_per_particle: int):
        """Fresh draws around the current means (reference
        ``planner.py:339-348``): returns (positions, velocities)."""
        self._key, sub = jax.random.split(self.state.key)
        means = self.state.particle_means
        p, t, d = means.shape
        eps = jax.random.normal(
            sub, (p, num_samples_per_particle, t, d), dtype=means.dtype
        )
        if self.sampler.weight_t is not None:
            corr = (eps.reshape(p, -1, t * d) @ self.sampler.weight_t).reshape(
                p, -1, t, d
            )
        else:  # long-horizon mode (M > dense threshold): structured O(T d^2)
            solver = (
                self.sampler.psolver
                if self.sampler.psolver is not None
                else self.sampler.chol
            )
            corr = solver.solve_LT(eps)
        samples = means[:, None] + corr
        self.state = self.state.replace(key=self._key)
        n = self.n_dof
        return samples[..., :n], samples[..., n:]
