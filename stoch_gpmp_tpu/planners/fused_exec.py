"""Class-level opt-in executor for the fully-fused dof-factored Panda
iteration kernel (``ops/pallas/panda_step_dof.py``).

The planner's default dof path (``_stoch_gpmp_optimize_dof``) is pure XLA
plus the Pallas stencil-quadratic kernel — ~478-537k particle-updates/s at
BASELINE config 5. The fully-fused kernel — sampling matmul, stencil
quadratic, FK + fields, softmax and the mean update in ONE Pallas call —
sustains 852-920k on the same workload (docs/PERFORMANCE.md round-5
idle-host re-measures), but it is a *different execution contract*:

- the eps stream is the TPU hardware PRNG (a different well-defined stream
  than the XLA dof path — same algorithm and distributions);
- per-iteration aux (samples/weights/grad) is never materialized to HBM —
  that is WHY it is fast.

``StochGPMP(fused_kernel=True)`` therefore runs ``opt_iters - 1``
iterations through this executor and the FINAL iteration through the
normal path, so the reference-shaped 6-tuple / ``get_recent_samples`` /
``get_traj`` API is produced by a real iteration (reference
``planner.py:289-317`` returns the final iteration's samples — exactly the
part kept on the normal path).

Eligibility is the fused kernel's own contract: the config-5-style stack
``CostComposite([QuadraticCost (scalar sigmas, dof form), PlaneFieldsCost])``
with the dof factor built and ``traj_len % 128 == 0``. ``build(...)``
returns None when ineligible so the caller can raise a targeted error.
"""

from __future__ import annotations

import functools

import numpy as np

import jax


def build_fused_dof_executor(
    sampler,
    cost,
    observation: dict,
    *,
    num_particles: int,
    num_samples: int,
    temperature: float,
    step_size: float,
):
    """Build ``run(state, opt_iters) -> state`` executing whole planner
    iterations in the fused dof kernel, or return ``(None, reason)`` if the
    (sampler, cost, observation) triple is outside the kernel's contract.

    Returns ``(run, None)`` on success."""
    from stoch_gpmp_tpu.costs import CostComposite
    from stoch_gpmp_tpu.costs.fused_fields import PlaneFieldsCost
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.gp.dof_factored import from_dof_planes, to_dof_planes
    from stoch_gpmp_tpu.ops.pallas.panda_step_dof import (
        fused_panda_dof_optimize,
        make_fused_panda_dof_step,
    )

    if sampler.dof is None:
        return None, "sampler has no dof factor (needs scalar sigmas, 2T <= 2048)"
    if not isinstance(cost, CostComposite) or len(cost.costs) != 2:
        return None, "cost must be CostComposite([QuadraticCost, PlaneFieldsCost])"
    quad = next((c for c in cost.costs if isinstance(c, QuadraticCost)), None)
    fields = next((c for c in cost.costs if isinstance(c, PlaneFieldsCost)), None)
    if quad is None or fields is None:
        return None, "cost must be CostComposite([QuadraticCost, PlaneFieldsCost])"
    if getattr(quad, "dof_form", None) is None:
        return None, "QuadraticCost has no dof form (needs scalar sigmas)"
    t = fields.traj_len
    if t % 128 != 0:
        return None, f"traj_len={t} not a multiple of 128 (plane lanes)"
    spheres = (observation or {}).get("obstacle_spheres", None)
    if spheres is None:
        return None, "observation['obstacle_spheres'] required"
    if quad.dof_form.num_goals and num_particles % quad.dof_form.num_goals:
        return None, "num_particles must divide evenly across goals"
    # last gate so stack problems surface first on any backend: the kernel
    # seeds the TPU hardware PRNG (pltpu.prng_seed), which has no CPU
    # interpret lowering — unlike the stencil-only kernel, the full fused
    # iteration cannot run off-chip at all
    if jax.default_backend() != "tpu":
        return None, "fused_kernel needs the TPU backend (hardware PRNG)"

    step = make_fused_panda_dof_step(
        chain=fields.chain,
        dof_prior=sampler.dof,
        dof_quad=quad.dof_form,
        num_particles=num_particles,
        spheres=spheres,
        target_h=np.asarray(fields.target_h, dtype=np.float64),
        n_dof=fields.n_dof,
        traj_len=t,
        num_samples=num_samples,
        margin=fields.margin,
        w_self=1.0 / fields.sigma_self**2,
        w_obst=(1.0 / fields.sigma_coll**2),
        w_goal=1.0 / fields.sigma_goal**2,
        w_pos=fields.w_pos,
        w_rot=fields.w_rot,
        temperature=temperature,
        step_size=step_size,
    )

    @functools.partial(jax.jit, static_argnums=(2,))
    def _run(mu, key, opt_iters):
        return fused_panda_dof_optimize(step, mu, key, opt_iters)

    def run(state, opt_iters: int):
        mu, key = _run(to_dof_planes(state.particle_means), state.key, opt_iters)
        return state.replace(
            particle_means=from_dof_planes(mu).astype(state.particle_means.dtype),
            key=key,
        )

    return run, None


def build_fused_planar_executor(
    sampler,
    cost,
    observation: dict,
    *,
    num_particles: int,
    num_samples: int,
    temperature: float,
    step_size: float,
):
    """Planar counterpart of ``build_fused_dof_executor``: the batched
    single-kernel planar iteration (``ops/pallas/fused_step.py`` — the
    ``bench.py`` headline path) for the stack
    ``CostComposite([QuadraticCost, CostCollision(RasterPrimitive2DField)])``
    at d=2. Returns ``(run, None)`` or ``(None, reason)``."""
    from stoch_gpmp_tpu.costs import CostCollision, CostComposite
    from stoch_gpmp_tpu.costs.fields import RasterPrimitive2DField
    from stoch_gpmp_tpu.costs.quadratic import QuadraticCost
    from stoch_gpmp_tpu.ops.pallas.fused_step import (
        fused_planar_optimize_batched,
        make_fused_planar_step_batched,
    )

    if not isinstance(cost, CostComposite) or len(cost.costs) != 2:
        return None, ("cost must be CostComposite([QuadraticCost, "
                      "CostCollision(RasterPrimitive2DField)])")
    quad = next((c for c in cost.costs if isinstance(c, QuadraticCost)), None)
    coll = next((c for c in cost.costs if isinstance(c, CostCollision)), None)
    if quad is None or coll is None or not isinstance(
        coll.field, RasterPrimitive2DField
    ):
        return None, ("cost must be CostComposite([QuadraticCost, "
                      "CostCollision(RasterPrimitive2DField)])")
    if getattr(quad, "dof_form", None) is None:
        return None, "QuadraticCost has no dof form (needs scalar sigmas)"
    if coll.n_dof != 2:
        return None, "planar fused kernel is d=2 only"
    if sampler.weight_t is None:
        return None, "sampler has no dense factor (long-horizon mode)"
    if sampler.dof is None:
        return None, "sampler has no dof factor (needs scalar sigmas)"
    t = cost.traj_len
    if coll.traj_range != (1, t):
        return None, ("collision slice must be the reference default (1, T) "
                      "— the kernel's tmask masks exactly t=0")
    if (4 * t) % 128 != 0:
        return None, f"traj_len={t} not a multiple of 32 (M=4T kernel lanes)"
    if jax.default_backend() != "tpu":
        return None, "fused_kernel needs the TPU backend (hardware PRNG)"

    field = coll.field
    step = make_fused_planar_step_batched(
        weight_t=sampler.weight_t,
        dof_prior=sampler.dof,
        dof_quad=quad.dof_form,
        num_particles=num_particles,
        rect_bounds=field.rect_bounds,
        circles=field.circles,
        cell_size=field.cell_size,
        nx=field.nx,
        ny=field.ny,
        traj_len=t,
        state_dim=4,
        num_samples=num_samples,
        k_coll=1.0 / coll.sigma_coll**2,
        temperature=temperature,
        step_size=step_size,
    )

    @functools.partial(jax.jit, static_argnums=(2,))
    def _run(means, key, opt_iters):
        return fused_planar_optimize_batched(step, means, key, opt_iters)

    def run(state, opt_iters: int):
        means, key = _run(state.particle_means, state.key, opt_iters)
        return state.replace(
            particle_means=means.astype(state.particle_means.dtype), key=key
        )

    return run, None


def build_fused_executor(sampler, cost, observation, **kw):
    """Try every fused-kernel executor for this stack; returns
    ``(run, None)`` on the first match or ``(None, combined reasons)``."""
    run, r_panda = build_fused_dof_executor(sampler, cost, observation, **kw)
    if run is not None:
        return run, None
    run, r_planar = build_fused_planar_executor(sampler, cost, observation, **kw)
    if run is not None:
        return run, None
    return None, f"panda kernel: {r_panda}; planar kernel: {r_planar}"
