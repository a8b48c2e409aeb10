"""Multi-chip sharding of the planner over a device mesh.

The reference is strictly single-process/single-device (SURVEY.md §2.3); its
parallel axes are batch dimensions. Here those axes become mesh axes:

- ``p`` (goals x particles, data-parallel): each device owns a slice of the
  particle means; the per-particle update is embarrassingly parallel.
- ``s`` (Monte-Carlo samples, reduction-parallel): each device draws a slice
  of the samples; the softmax normalization and the weighted-mean reduction
  over samples become XLA all-reduces over ``s`` (this is the axis that
  actually exercises ICI collectives).

We annotate shardings with ``NamedSharding``/``with_sharding_constraint`` and
let GSPMD insert collectives — the scaling-book recipe — rather than writing
explicit ``psum``s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from stoch_gpmp_tpu.planners.stoch_gpmp import (
    StochGPMPState,
    stoch_gpmp_optimize,
)


def make_mesh(n_devices: int | None = None, axis_shape=None, axis_names=("p", "s")) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    Default shape: ``(n // 2, 2)`` for even ``n`` (particles x samples),
    else ``(n, 1)``.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axis_shape is None:
        axis_shape = (n_devices // 2, 2) if n_devices % 2 == 0 and n_devices > 1 else (n_devices, 1)
    dev_array = np.asarray(devices).reshape(axis_shape)
    return Mesh(dev_array, axis_names)


def shard_planner_state(mesh: Mesh, state: StochGPMPState) -> StochGPMPState:
    """Place particle means sharded over the ``p`` axis; replicate the key."""
    means_sh = NamedSharding(mesh, PartitionSpec("p", None, None))
    key_sh = NamedSharding(mesh, PartitionSpec())
    return StochGPMPState(
        particle_means=jax.device_put(state.particle_means, means_sh),
        key=jax.device_put(state.key, key_sh),
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (sampler weights, cost constants) across the mesh."""
    sh = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def make_sharded_optimize(mesh: Mesh, layout: str = "flat", **static_kwargs):
    """Build a jitted multi-chip optimize: means sharded over ``p``, samples
    over ``(p, s)`` (softmax/weighted-mean reductions over ``s`` ride ICI).

    ``layout='dof'`` shards the dof-factored fast path instead (the d>8 /
    config-5 layout, ``gp/dof_factored.py``): dof planes stay replicated on
    their leading axis while particles/samples shard over the mesh —
    ``[d, P, S, 2T]`` as ``(None, p, s, None)``. Requires a dof-capable
    problem (the planner raises otherwise); the per-dof sampling matmul runs
    fully data-parallel and the same softmax/weighted-mean all-reduces ride
    the ``s`` axis. The fused quadratic+importance Pallas kernel
    (``ops/pallas/stencil.py``) runs per-shard under ``jax.shard_map`` —
    it is per-row independent, so no collective crosses it; only the
    softmax reduction over ``s`` rides ICI, outside the kernel.

    Returns ``fn(sampler, cost, state, observation) -> (state, aux)``.
    """
    if layout == "dof":
        x_spec = NamedSharding(mesh, PartitionSpec(None, "p", "s", None))
        plane_spec = NamedSharding(mesh, PartitionSpec(None, "p", None))

        def shard_dof(x):
            spec = x_spec if x.ndim == 4 else plane_spec
            return jax.lax.with_sharding_constraint(x, spec)

        kwargs = dict(
            static_kwargs, sample_method="dof", shard_dof=shard_dof,
            shard_dof_quad=_make_shard_dof_quad(mesh),
        )
    else:
        sample_spec = NamedSharding(mesh, PartitionSpec("p", "s", None, None))

        def shard_samples(x):
            return jax.lax.with_sharding_constraint(x, sample_spec)

        kwargs = dict(static_kwargs, shard_samples=shard_samples)

    def run(sampler, cost, state, observation):
        return stoch_gpmp_optimize(sampler, cost, state, observation, **kwargs)

    out_state_sh = StochGPMPState(
        particle_means=NamedSharding(mesh, PartitionSpec("p", None, None)),
        key=NamedSharding(mesh, PartitionSpec()),
    )
    out_sh = (
        (out_state_sh, None, None)
        if static_kwargs.get("collect_metrics")
        else (out_state_sh, None)
    )
    return jax.jit(run, out_shardings=out_sh)


def _make_shard_dof_quad(mesh: Mesh):
    """Per-shard fused quadratic+importance eval for the sharded dof path.

    Returns ``f(dq, x [d, P, S, 2T], pu [d, P, 2T], temperature) ->
    [P, S] | None``: the single-pass Pallas stencil kernel
    (``ops/pallas/stencil.py dof_quad_eval_pallas``) applied to each
    shard's local rows via ``jax.shard_map``. The kernel is per-row
    independent, so shards need no collectives; anchor rows are built
    GLOBALLY per particle and sharded alongside (a shard's rows are a
    particle slice — the kernel's goal-major reconstruction from the local
    batch size would assign wrong goals). Returns None (trace-time) when a
    shard's local shapes are kernel-ineligible; the planner then keeps the
    XLA stencil, which GSPMD partitions trivially."""
    from stoch_gpmp_tpu.ops.pallas.stencil import (
        _pick_batch_block,
        dof_anchor_rows,
        dof_quad_eval_pallas,
    )

    n_p = mesh.shape["p"]
    n_s = mesh.shape["s"]

    def shard_dof_quad(dq, x, pu, temperature):
        d, p, s, t2 = x.shape
        if (dq.q_i2 is None or p % n_p or s % n_s or p % dq.num_goals
                or dq.traj_len % 128 or x.dtype != jnp.float32):
            return None
        s_loc = s // n_s
        if _pick_batch_block((p // n_p) * s_loc, s_loc, with_pu=True) is None:
            return None
        anch = dof_anchor_rows(dq, p)  # [d, P, 4], goal-major particles

        def body(dq_l, x_l, pu_l, anch_l):
            d_, p_l, s_l, _ = x_l.shape
            out = dof_quad_eval_pallas(
                dq_l, x_l.reshape(d_, p_l * s_l, t2), pu=pu_l,
                temperature=temperature, num_samples=s_l,
                anchors=jnp.repeat(anch_l, s_l, axis=1),
            )
            assert out is not None  # eligibility pre-checked above
            return out.reshape(p_l, s_l)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(None, "p", "s", None),
                PartitionSpec(None, "p", None),
                PartitionSpec(None, "p", None),
            ),
            out_specs=PartitionSpec("p", "s"),
            check_vma=False,
        )(dq, x, pu, anch)

    return shard_dof_quad


def make_sharded_gpmp_optimize(mesh: Mesh, **static_kwargs):
    """Multi-chip Gauss-Newton: particles (and their per-particle structured
    Cholesky solves) shard over the ``p`` axis; the trust-region damping's
    particle-mean reduction becomes an all-reduce.

    Internal sharding constraints (``shard_particles``) pin the means, the GN
    linearization blocks, and the solved step to the ``p`` axis — mirroring the
    StochGPMP path — so GSPMD cannot decide to replicate the per-particle
    solves."""
    from stoch_gpmp_tpu.planners.gpmp import GPMPState, gpmp_optimize

    def shard_p(x):
        spec = PartitionSpec("p", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def run(cost, state, observation):
        return gpmp_optimize(
            cost, state, observation, shard_particles=shard_p, **static_kwargs
        )

    out_sh = GPMPState(
        particle_means=NamedSharding(mesh, PartitionSpec("p", None, None)),
        key=NamedSharding(mesh, PartitionSpec()),
    )
    return jax.jit(run, out_shardings=out_sh)


def shard_gpmp_state(mesh: Mesh, state):
    from stoch_gpmp_tpu.planners.gpmp import GPMPState

    return GPMPState(
        particle_means=jax.device_put(
            state.particle_means, NamedSharding(mesh, PartitionSpec("p", None, None))
        ),
        key=jax.device_put(state.key, NamedSharding(mesh, PartitionSpec())),
    )
