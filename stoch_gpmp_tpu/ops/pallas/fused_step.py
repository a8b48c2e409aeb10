"""The fully-fused StochGPMP iteration as one Pallas TPU kernel.

BASELINE.json's north star asks for the importance-weighted stochastic update
fused into Pallas kernels. This kernel executes the ENTIRE planar iteration
per particle without touching HBM between stages:

  1. draw eps ~ N(0, I) in-kernel (hardware PRNG bits -> Box-Muller),
  2. samples  x = mu_p + eps @ L^{-T}^T           (MXU),
  3. quadratic (GP + anchors) cost, conditioning-gated (stencil.py):
     the exact lane-roll STENCIL when weights are extreme enough that bf16
     MXU passes would corrupt the quadratic, the overlapping MXU matmul at
     mild (planar) conditioning,
  4. positions via constant selection matrices     (MXU; avoids strided
     lane-slicing, which Mosaic lowers poorly),
  5. rasterized collision field on snapped cells   (VPU, grid-parity rule),
  6. importance term  tau * x . (Sigma^{-1} mu_p)  (VPU; prec_u from the
     exact stencil matvec outside the kernel),
  7. softmax over samples + weighted mean update   (VPU + MXU).

Grid = particles; per-program VMEM ~1 MB (W, the [S, M] sample block).
The sample stream differs from `jax.random` (hardware PRNG + Box-Muller), so
this is an opt-in execution path: same algorithm, same distributions, a
different (still counter-based, reproducible-per-seed) stream. Moment tests
+ a descent test validate it; ``fused_planar_optimize`` wraps it in a scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


TWO_PI = 6.283185307179586


def _box_muller(n: int, m: int) -> jnp.ndarray:
    """``[n, m]`` standard normals from the seeded hardware PRNG.

    Uses BOTH Box-Muller outputs (``r cos`` and ``r sin`` land in different
    row halves — a fixed assignment of iid draws), halving the PRNG traffic
    and the log/sqrt work. Top 24 bits as non-negative int32 (Mosaic lacks
    uint32->f32); ``u1`` offset into (0, 1] avoids log(0).
    """
    rows = n // 2 if n % 2 == 0 else n
    bits1 = pltpu.bitcast(pltpu.prng_random_bits((rows, m)), jnp.int32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits((rows, m)), jnp.int32)
    u1 = jax.lax.shift_right_logical(bits1, 8).astype(jnp.float32) * (
        1.0 / 16777216.0
    ) + (0.5 / 16777216.0)
    u2 = jax.lax.shift_right_logical(bits2, 8).astype(jnp.float32) * (
        1.0 / 16777216.0
    )
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = TWO_PI * u2
    if n % 2 == 0:
        return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    return r * jnp.cos(theta)


def _kernel(
    seed_ref,  # [1, 1, 2] int32
    mean_ref,  # [1, 1, M] (3D so Mosaic's last-two-dims tiling rule holds)
    prec_u_ref,  # [1, 1, M]
    w_ref,  # [M, M] = L^{-1} (samples = eps @ W)
    anchors_ref,  # [1, 1, M] start/goal anchor values on their lanes
    masks_ref,  # [3, M] stencil lane masks
    sel_x_ref,  # [M, T] selection matrix extracting x coords
    sel_y_ref,  # [M, T]
    rects_ref,  # [R, 4] int32 cell bounds
    circles_ref,  # [C, 3]
    tmask_ref,  # [1, T] collision time mask (0 at t=0)
    new_mean_ref,  # out [1, 1, M]
    costs_ref,  # out [1, 1, S]
    *,
    num_samples,
    n_dof,
    quad_stencil,
    use_stencil,
    n_rects,
    n_circles,
    cell_size,
    nx,
    ny,
    k_coll,
    temperature,
    step_size,
):
    from stoch_gpmp_tpu.ops.pallas.stencil import flat_quad_cost

    s = num_samples
    m = mean_ref.shape[-1]
    mean = mean_ref[0]  # [1, M]
    prec_u = prec_u_ref[0]

    # --- 1. in-kernel N(0,1) via hardware PRNG + Box-Muller ---------------
    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    eps = _box_muller(s, m)

    # --- 2. samples ---------------------------------------------------------
    x = mean + jnp.dot(eps, w_ref[:], preferred_element_type=jnp.float32)

    # --- 3. quadratic cost: conditioning-gated form (stencil.py) -------------
    if use_stencil:  # exact lane-roll residual form; no [M, M] matmul
        cost = flat_quad_cost(x, anchors_ref[0], masks_ref, quad_stencil, n_dof)
    else:  # mild weights: the MXU matmul is accurate AND overlaps the VPU
        xa = jnp.dot(x, masks_ref[:], preferred_element_type=jnp.float32)
        quad = jnp.sum(xa * x, axis=1, keepdims=True)
        lin = jnp.sum(x * anchors_ref[0], axis=1, keepdims=True)
        cost = quad - 2.0 * lin  # per-particle constant cancels in softmax

    # --- 4./5. collision field ----------------------------------------------
    px = jnp.dot(x, sel_x_ref[:], preferred_element_type=jnp.float32)  # [S, T]
    py = jnp.dot(x, sel_y_ref[:], preferred_element_type=jnp.float32)
    ox = nx // 2
    oy = ny // 2
    jc = jnp.clip(jnp.floor(px / cell_size + ox).astype(jnp.int32), 0, nx - 1)
    ic = jnp.clip(jnp.floor(py / cell_size + oy).astype(jnp.int32), 0, ny - 1)
    occ = jnp.zeros_like(px)
    for r in range(n_rects):
        inside = (
            (jc >= rects_ref[r, 0])
            & (jc < rects_ref[r, 1])
            & (ic >= rects_ref[r, 2])
            & (ic < rects_ref[r, 3])
        )
        occ = occ + inside.astype(px.dtype)
    if n_circles:
        wx = (jc - ox).astype(px.dtype) * cell_size
        wy = (ic - oy).astype(px.dtype) * cell_size
        for c in range(n_circles):
            dx = wx - circles_ref[c, 0]
            dy = wy - circles_ref[c, 1]
            occ = occ + (jnp.sqrt(dx * dx + dy * dy) <= circles_ref[c, 2]).astype(px.dtype)
    coll = jnp.sum(occ * tmask_ref[:], axis=1, keepdims=True)  # skip t=0
    cost = cost + k_coll * coll

    # --- 6. importance term ---------------------------------------------------
    cost = cost + temperature * jnp.sum(x * prec_u, axis=1, keepdims=True)

    # --- 7. softmax over samples + mean update --------------------------------
    neg = -cost / temperature  # [S, 1]
    neg = neg - jnp.max(neg, axis=0, keepdims=True)
    w = jnp.exp(neg)
    w = w / jnp.sum(w, axis=0, keepdims=True)
    grad = jnp.dot(w.T, x - mean, preferred_element_type=jnp.float32)  # [1, M]
    new_mean_ref[0] = mean + step_size * grad
    costs_ref[0] = cost.T


def make_fused_planar_step(
    *,
    weight_t: jnp.ndarray,  # [M, M]
    dof_prior,  # DofFactoredPrior (exact stencil Sigma^{-1} matvec)
    dof_quad,  # DofQuadraticCost (stencil params + start/goal anchors)
    num_particles: int,
    rect_bounds: jnp.ndarray,  # [R, 4] int32
    circles: jnp.ndarray,  # [C, 3]
    cell_size: float,
    nx: int,
    ny: int,
    traj_len: int,
    state_dim: int,
    num_samples: int,
    k_coll: float,
    temperature: float,
    step_size: float,
):
    """Build ``step(means [P, T, d], seeds [P, 2] int32) -> (new_means, costs)``
    executing the whole iteration as one Pallas call (grid over particles)."""
    from stoch_gpmp_tpu.ops.pallas.stencil import (
        anchor_rows_and_masks,
        dense_quad_from_dof,
        needs_stencil,
        quad_stencil_consts,
    )

    m = traj_len * state_dim
    p = num_particles
    n_dof = state_dim // 2
    quad_stencil = quad_stencil_consts(dof_quad)
    use_stencil = needs_stencil(dof_quad)
    if use_stencil:
        anchors, masks = anchor_rows_and_masks(dof_quad, p, traj_len, n_dof)
    else:
        # mild conditioning: matmul quadratic — the anchors slot carries the
        # per-particle b rows and the masks slot carries A [M, M]
        masks, b_g = dense_quad_from_dof(dof_quad, traj_len, n_dof)
        anchors = jnp.repeat(b_g, p // dof_quad.num_goals, axis=0)
    # selection matrices: column t of sel_x is one-hot at flat index t*d + 0
    sel_x = np.zeros((m, traj_len), dtype=np.float32)
    sel_y = np.zeros((m, traj_len), dtype=np.float32)
    for t in range(traj_len):
        sel_x[t * state_dim + 0, t] = 1.0
        sel_y[t * state_dim + 1, t] = 1.0
    tmask = np.ones((1, traj_len), dtype=np.float32)
    tmask[0, 0] = 0.0  # reference skips timestep 0 (cost_functions.py:244)

    n_rects = int(rect_bounds.shape[0])
    n_circles = int(circles.shape[0])
    rects_in = rect_bounds if n_rects else jnp.zeros((1, 4), dtype=jnp.int32)
    circles_in = circles if n_circles else jnp.zeros((1, 3), dtype=jnp.float32)

    kernel = functools.partial(
        _kernel,
        num_samples=num_samples,
        n_dof=n_dof,
        quad_stencil=quad_stencil,
        use_stencil=use_stencil,
        n_rects=n_rects,
        n_circles=n_circles,
        cell_size=cell_size,
        nx=nx,
        ny=ny,
        k_coll=k_coll,
        temperature=temperature,
        step_size=step_size,
    )

    const = lambda i: (0, 0)  # noqa: E731
    per_p3 = lambda i: (i, 0, 0)  # noqa: E731

    call = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), per_p3, memory_space=pltpu.VMEM),  # seeds
            pl.BlockSpec((1, 1, m), per_p3, memory_space=pltpu.VMEM),  # mean
            pl.BlockSpec((1, 1, m), per_p3, memory_space=pltpu.VMEM),  # prec_u
            pl.BlockSpec((m, m), const, memory_space=pltpu.VMEM),  # W
            pl.BlockSpec((1, 1, m), per_p3, memory_space=pltpu.VMEM),  # anchors/b
            pl.BlockSpec(tuple(masks.shape), const, memory_space=pltpu.VMEM),  # masks/A
            pl.BlockSpec((m, traj_len), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, traj_len), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(rects_in.shape), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(circles_in.shape), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, traj_len), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, m), per_p3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_samples), per_p3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, num_samples), jnp.float32),
        ),
        interpret=_interpret(),
    )

    sel_x = jnp.asarray(sel_x)
    sel_y = jnp.asarray(sel_y)
    tmask_j = jnp.asarray(tmask)

    anchors3 = anchors.reshape(p, 1, m)

    def step(means: jnp.ndarray, seeds: jnp.ndarray):
        means_flat = means.reshape(p, m)
        # exact O(T) stencil matvec — NOT the [M, M] precision matmul
        prec_u = dof_prior.matvec_flat(
            means_flat.reshape(p, traj_len, state_dim)
        ).reshape(p, m)
        new_flat, costs = call(
            seeds.reshape(p, 1, 2),
            means_flat.reshape(p, 1, m),
            prec_u.reshape(p, 1, m),
            weight_t,
            anchors3,
            masks,
            sel_x,
            sel_y,
            rects_in,
            circles_in,
            tmask_j,
        )
        return new_flat.reshape(p, traj_len, state_dim), costs.reshape(p, num_samples)

    return step


def fused_planar_optimize(step, means, key, opt_iters: int):
    """Scan the fused step; per-iteration seeds derived from the key."""
    p = means.shape[0]

    def body(carry, _):
        m, k = carry
        k, sub = jax.random.split(k)
        seeds = jax.random.bits(sub, (p, 2), dtype=jnp.uint32).astype(jnp.int32)
        new_m, costs = step(m, seeds)
        return (new_m, k), None

    (means, key), _ = jax.lax.scan(body, (means, key), None, length=opt_iters)
    return means, key


def fused_planar_optimize_batched(step, means, key, opt_iters: int):
    """Scan wrapper for the batched step (one seed pair per particle block
    per iteration)."""
    n_blocks = getattr(step, "n_blocks", 1)

    def body(carry, _):
        m, k = carry
        k, sub = jax.random.split(k)
        seeds = jax.random.bits(sub, (n_blocks, 2), dtype=jnp.uint32).astype(jnp.int32)
        new_m, costs = step(m, seeds)
        return (new_m, k), None

    (means, key), _ = jax.lax.scan(body, (means, key), None, length=opt_iters)
    return means, key


def _kernel_batched(
    seed_ref,  # [1, 1, 2] int32 (per particle-block)
    means_ref,  # [PB, M] (particle block)
    prec_u_ref,  # [PB, M]
    w_ref,  # [M, M]
    anchors_ref,  # [PB, M] start/goal anchor values on their lanes
    masks_ref,  # [3, M] stencil lane masks
    sel_x_ref,  # [M, T]
    sel_y_ref,  # [M, T]
    rects_ref,
    circles_ref,
    tmask_ref,  # [1, T]
    new_means_ref,  # out [P, M]
    costs_ref,  # out [P, S]
    *,
    num_particles,
    num_samples,
    n_dof,
    quad_stencil,
    use_stencil,
    n_rects,
    n_circles,
    cell_size,
    nx,
    ny,
    k_coll,
    temperature,
    step_size,
):
    from stoch_gpmp_tpu.ops.pallas.stencil import flat_quad_cost

    p, s = num_particles, num_samples
    n = p * s
    m = means_ref.shape[-1]

    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    eps = _box_muller(n, m)

    # per-row particle replication of means/anchors/prec_u via static blocks
    corr = jnp.dot(eps, w_ref[:], preferred_element_type=jnp.float32)  # [N, M]
    mean_rows = jnp.repeat(means_ref[:], s, axis=0)
    x = mean_rows + corr

    # quadratic: conditioning-gated form (stencil.py)
    if use_stencil:  # exact lane-roll residual form; no [M, M] cost matmul
        anch_rows = jnp.repeat(anchors_ref[:], s, axis=0)
        cost = flat_quad_cost(x, anch_rows, masks_ref, quad_stencil, n_dof)
    else:  # mild weights: the MXU matmul is accurate AND overlaps the VPU
        xa = jnp.dot(x, masks_ref[:], preferred_element_type=jnp.float32)
        cost = jnp.sum(xa * x, axis=1, keepdims=True)
        b_rows = jnp.repeat(anchors_ref[:], s, axis=0)
        cost = cost - 2.0 * jnp.sum(x * b_rows, axis=1, keepdims=True)

    px = jnp.dot(x, sel_x_ref[:], preferred_element_type=jnp.float32)
    py = jnp.dot(x, sel_y_ref[:], preferred_element_type=jnp.float32)
    ox = nx // 2
    oy = ny // 2
    jc = jnp.clip(jnp.floor(px / cell_size + ox).astype(jnp.int32), 0, nx - 1)
    ic = jnp.clip(jnp.floor(py / cell_size + oy).astype(jnp.int32), 0, ny - 1)
    occ = jnp.zeros_like(px)
    for r in range(n_rects):
        inside = (
            (jc >= rects_ref[r, 0])
            & (jc < rects_ref[r, 1])
            & (ic >= rects_ref[r, 2])
            & (ic < rects_ref[r, 3])
        )
        occ = occ + inside.astype(px.dtype)
    if n_circles:
        wx = (jc - ox).astype(px.dtype) * cell_size
        wy = (ic - oy).astype(px.dtype) * cell_size
        for c in range(n_circles):
            dx = wx - circles_ref[c, 0]
            dy = wy - circles_ref[c, 1]
            occ = occ + (jnp.sqrt(dx * dx + dy * dy) <= circles_ref[c, 2]).astype(px.dtype)
    cost = cost + k_coll * jnp.sum(occ * tmask_ref[:], axis=1, keepdims=True)

    prec_rows = jnp.repeat(prec_u_ref[:], s, axis=0)
    cost = cost + temperature * jnp.sum(x * prec_rows, axis=1, keepdims=True)

    # segmented softmax over each particle's contiguous S-row block:
    # reshape [N, 1] -> [P, S] (the relayout costs_ref does below), softmax
    # each row, reshape back — whole-block VPU ops instead of the P-piece
    # unrolled loop + concatenate (round 5; bit-equal, on-chip tested)
    c2 = cost.reshape(p, s)
    neg = -c2 / temperature
    neg = neg - jnp.max(neg, axis=1, keepdims=True)
    e = jnp.exp(neg)
    wts = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(p * s, 1)

    # grad_p = sum_s w_ps (x_ps - mean_p): one segment matmul via block one-hot
    seg = jnp.repeat(
        jnp.eye(p, dtype=jnp.float32), s, axis=0
    )  # [N, P] constant-foldable
    weighted = wts * (x - mean_rows)  # [N, M]
    grad = jnp.dot(seg.T, weighted, preferred_element_type=jnp.float32)  # [P, M]
    new_means_ref[:] = means_ref[:] + step_size * grad
    costs_ref[:] = cost.reshape(p, s)


def make_fused_planar_step_batched(
    *,
    weight_t,
    dof_prior,
    dof_quad,
    num_particles,
    rect_bounds,
    circles,
    cell_size,
    nx,
    ny,
    traj_len,
    state_dim,
    num_samples,
    k_coll,
    temperature,
    step_size,
    particles_per_block: int | None = None,
):
    """Batched variant: whole particle blocks per kernel program (big MXU
    matmuls; segmented softmax in-kernel). For small P one program handles
    everything; for large particle counts ``particles_per_block`` bounds the
    per-program VMEM ([PB*S, M] sample block) and the kernel grids over
    blocks."""
    from stoch_gpmp_tpu.ops.pallas.stencil import (
        anchor_rows_and_masks,
        dense_quad_from_dof,
        needs_stencil,
        quad_stencil_consts,
    )

    m = traj_len * state_dim
    p = num_particles
    n_dof = state_dim // 2
    quad_stencil = quad_stencil_consts(dof_quad)
    use_stencil = needs_stencil(dof_quad)
    if use_stencil:
        anchors, masks = anchor_rows_and_masks(dof_quad, p, traj_len, n_dof)
    else:
        # mild conditioning: matmul quadratic — the anchors slot carries the
        # per-particle b rows and the masks slot carries A [M, M]
        masks, b_g = dense_quad_from_dof(dof_quad, traj_len, n_dof)
        anchors = jnp.repeat(b_g, p // dof_quad.num_goals, axis=0)
    if particles_per_block is None:
        # ~6-8 [PB*S, M] f32 buffers live at once (eps, x, xa, px/py, occ, ...);
        # keep ONE such buffer around ~1 MB so the total stays under the
        # ~16 MB scoped-VMEM limit. Mosaic also requires the particle block
        # dim be a multiple of 8 (sublane tiling) or equal to P.
        budget = max(1, (1024 * 1024) // (4 * m * num_samples))
        candidates = [
            pb for pb in range(1, p + 1)
            if p % pb == 0 and (pb % 8 == 0 or pb == p)
        ]
        fitting = [pb for pb in candidates if pb <= budget]
        particles_per_block = max(fitting) if fitting else min(candidates)
    pb = particles_per_block
    assert p % pb == 0, "num particles must divide into blocks"
    n_blocks = p // pb
    sel_x = np.zeros((m, traj_len), dtype=np.float32)
    sel_y = np.zeros((m, traj_len), dtype=np.float32)
    for t in range(traj_len):
        sel_x[t * state_dim + 0, t] = 1.0
        sel_y[t * state_dim + 1, t] = 1.0
    tmask = np.ones((1, traj_len), dtype=np.float32)
    tmask[0, 0] = 0.0

    n_rects = int(rect_bounds.shape[0])
    n_circles = int(circles.shape[0])
    rects_in = rect_bounds if n_rects else jnp.zeros((1, 4), dtype=jnp.int32)
    circles_in = circles if n_circles else jnp.zeros((1, 3), dtype=jnp.float32)

    kernel = functools.partial(
        _kernel_batched,
        num_particles=pb, num_samples=num_samples,
        n_dof=n_dof, quad_stencil=quad_stencil, use_stencil=use_stencil,
        n_rects=n_rects, n_circles=n_circles,
        cell_size=cell_size, nx=nx, ny=ny,
        k_coll=k_coll, temperature=temperature, step_size=step_size,
    )
    vm = pltpu.VMEM
    const = lambda i: (0, 0)  # noqa: E731
    per_b = lambda i: (i, 0)  # noqa: E731
    per_b3 = lambda i: (i, 0, 0)  # noqa: E731
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), per_b3, memory_space=vm),  # seeds
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # means
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # prec_u
            pl.BlockSpec((m, m), const, memory_space=vm),  # W
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # anchors/b
            pl.BlockSpec(tuple(masks.shape), const, memory_space=vm),  # masks/A
            pl.BlockSpec((m, traj_len), const, memory_space=vm),
            pl.BlockSpec((m, traj_len), const, memory_space=vm),
            pl.BlockSpec(tuple(rects_in.shape), const, memory_space=vm),
            pl.BlockSpec(tuple(circles_in.shape), const, memory_space=vm),
            pl.BlockSpec((1, traj_len), const, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((pb, m), per_b, memory_space=vm),
            pl.BlockSpec((pb, num_samples), per_b, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, m), jnp.float32),
            jax.ShapeDtypeStruct((p, num_samples), jnp.float32),
        ),
        interpret=_interpret(),
    )

    sel_x = jnp.asarray(sel_x)
    sel_y = jnp.asarray(sel_y)
    tmask_j = jnp.asarray(tmask)

    def step(means, seeds):
        """``seeds``: [n_blocks, 2] int32 (one hardware-PRNG seed pair per
        particle block)."""
        means_flat = means.reshape(p, m)
        # exact O(T) stencil matvec — NOT the [M, M] precision matmul
        prec_u = dof_prior.matvec_flat(
            means_flat.reshape(p, traj_len, state_dim)
        ).reshape(p, m)
        new_flat, costs = call(
            seeds.reshape(n_blocks, 1, 2), means_flat, prec_u, weight_t,
            anchors, masks, sel_x, sel_y, rects_in, circles_in, tmask_j,
        )
        return new_flat.reshape(p, traj_len, state_dim), costs

    step.n_blocks = n_blocks
    return step
