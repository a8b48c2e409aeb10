"""Pallas TPU kernels for the collision-field hot path.

Profiling the planner on v5e shows the per-iteration cost is dominated by the
collision-field evaluation (~81 of ~95 us/iter on the planar parity workload):
both the XLA gather and the one-hot-matmul formulations materialize
batch-sized intermediates in HBM. These kernels keep everything in VMEM:

- ``grid_lookup``: occupancy-grid reads ``grid[y, x]`` on a VMEM-resident
  (padded square) grid — semantics identical to
  ``OccupancyGridField(lookup='gather')``. Mosaic's ``dynamic_gather`` is
  vreg-local (<= 128 lanes; a 256-wide lane gather fails to lower —
  measured on v5e round 3), so the decomposition keeps every gather inside
  a vreg: points ride 128-lane rows; the column pick
  ``g0[i, c] = grid[i, cx[c]]`` runs as one lane-local
  ``take_along_axis`` per 128-column block of the grid with a lane-range
  select between blocks; the row pick is an EXACT masked sublane reduction
  ``out[c] = sum_i g0[i, c] * (i == cy[c])`` (single nonzero term — no
  gather, no rounding).
- ``primitive_field_cost``: analytic rect/circle occupancy counts, unrolled
  over primitives, zero HBM intermediates.

Both kernels run in interpreter mode automatically off-TPU so the same code
path is testable on CPU.
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


# --------------------------------------------------------------------------- #
# occupancy-grid lookup
# --------------------------------------------------------------------------- #


def _grid_lookup_kernel(grid_ref, cy_ref, cx_ref, out_ref, *, rows):
    n = grid_ref.shape[0]  # padded square side (multiple of 128)
    grid = grid_ref[:]
    n_blk = n // 128
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)  # sublane index
    for r in range(rows):  # unrolled: 128 points per row
        cx = jnp.broadcast_to(cx_ref[r : r + 1, :], (n, 128))
        cy = jnp.broadcast_to(cy_ref[r : r + 1, :], (n, 128))
        # column pick, one vreg-local lane gather per 128-column grid block
        g0 = jnp.zeros((n, 128), dtype=grid.dtype)
        for h in range(n_blk):
            idx = jnp.clip(cx - 128 * h, 0, 127)
            gh = jnp.take_along_axis(
                grid[:, 128 * h : 128 * (h + 1)], idx, axis=1
            )
            in_blk = jnp.logical_and(cx >= 128 * h, cx < 128 * (h + 1))
            g0 = jnp.where(in_blk, gh, g0)  # g0[i, c] = grid[i, cx[c]]
        # row pick: exact masked sublane reduction (one nonzero term)
        sel = (sub == cy).astype(grid.dtype)
        out_ref[r, :] = jnp.sum(g0 * sel, axis=0)


@functools.partial(jax.jit, static_argnames=("cell_size",))
def grid_lookup(grid: jnp.ndarray, points: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    """Occupancy lookup ``grid[cell(y), cell(x)]`` for ``points [..., 2]``.

    Matches ``OccupancyGridField(lookup='gather').compute_cost`` exactly
    (tested); executes as a Pallas kernel with the grid resident in VMEM.
    """
    ny, nx = grid.shape
    n = int(np.ceil(max(ny, nx) / 128) * 128)  # padded square side, lane-aligned
    batch_shape = points.shape[:-1]
    num = int(np.prod(batch_shape)) if batch_shape else 1

    offset = jnp.asarray([nx // 2, ny // 2], dtype=points.dtype)
    cells = jnp.floor(points.reshape(-1, 2) / cell_size + offset).astype(jnp.int32)
    cx = jnp.clip(cells[:, 0], 0, nx - 1)
    cy = jnp.clip(cells[:, 1], 0, ny - 1)

    rows = 8  # sublane-aligned rows of 128 points per program
    per_tile = rows * 128
    n_tiles = -(-num // per_tile)
    pad = n_tiles * per_tile - num
    cx = jnp.pad(cx, (0, pad)).reshape(n_tiles * rows, 128)
    cy = jnp.pad(cy, (0, pad)).reshape(n_tiles * rows, 128)
    grid_pad = jnp.pad(grid, ((0, n - ny), (0, n - nx)))

    out = pl.pallas_call(
        functools.partial(_grid_lookup_kernel, rows=rows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, 128), grid.dtype),
        interpret=_interpret(),
    )(grid_pad, cy, cx)
    return out.reshape(-1)[:num].reshape(batch_shape)


# --------------------------------------------------------------------------- #
# analytic primitive field
# --------------------------------------------------------------------------- #


def _raster_kernel(
    xs_ref, ys_ref, rects_ref, circles_ref, out_ref,
    *, n_rects, n_circles, cell_size, nx, ny,
):
    """Rasterized-grid-parity field (see ``costs.fields.RasterPrimitive2DField``):
    snap query points to clamped cell coordinates, then test the analytic
    rasterization rule per primitive. Everything stays in VMEM/vregs."""
    x = xs_ref[:]
    y = ys_ref[:]
    ox = nx // 2
    oy = ny // 2
    jc = jnp.clip(jnp.floor(x / cell_size + ox).astype(jnp.int32), 0, nx - 1)
    ic = jnp.clip(jnp.floor(y / cell_size + oy).astype(jnp.int32), 0, ny - 1)
    acc = jnp.zeros_like(x)
    for r in range(n_rects):
        inside = (
            (jc >= rects_ref[r, 0])
            & (jc < rects_ref[r, 1])
            & (ic >= rects_ref[r, 2])
            & (ic < rects_ref[r, 3])
        )
        acc = acc + inside.astype(x.dtype)
    if n_circles:
        px = (jc - ox).astype(x.dtype) * cell_size
        py = (ic - oy).astype(x.dtype) * cell_size
        for c in range(n_circles):
            dx = px - circles_ref[c, 0]
            dy = py - circles_ref[c, 1]
            inside = jnp.sqrt(dx * dx + dy * dy) <= circles_ref[c, 2]
            acc = acc + inside.astype(x.dtype)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("cell_size", "nx", "ny"))
def raster_primitive_cost(
    rect_bounds: jnp.ndarray,
    circles: jnp.ndarray,
    points: jnp.ndarray,
    *,
    cell_size: float,
    nx: int,
    ny: int,
) -> jnp.ndarray:
    """Pallas execution of ``RasterPrimitive2DField.compute_cost``."""
    batch_shape = points.shape[:-1]
    num = int(np.prod(batch_shape)) if batch_shape else 1
    rows, tile = 8, 1024
    per_tile = rows * tile
    n_tiles = -(-num // per_tile)
    pad = n_tiles * per_tile - num
    flat = points.reshape(-1, 2)
    xs = jnp.pad(flat[:, 0], (0, pad)).reshape(n_tiles * rows, tile)
    ys = jnp.pad(flat[:, 1], (0, pad)).reshape(n_tiles * rows, tile)

    n_rects = int(rect_bounds.shape[0])
    n_circles = int(circles.shape[0])
    rects_in = rect_bounds if n_rects else jnp.zeros((1, 4), dtype=jnp.int32)
    circles_in = circles if n_circles else jnp.zeros((1, 3), dtype=points.dtype)

    kernel = functools.partial(
        _raster_kernel,
        n_rects=n_rects, n_circles=n_circles,
        cell_size=cell_size, nx=nx, ny=ny,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rects_in.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(circles_in.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, tile), points.dtype),
        interpret=_interpret(),
    )(xs, ys, rects_in, circles_in)
    return out.reshape(-1)[:num].reshape(batch_shape)


def _primitive_kernel(xs_ref, ys_ref, rects_ref, circles_ref, out_ref, *, n_rects, n_circles):
    x = xs_ref[:]
    y = ys_ref[:]
    acc = jnp.zeros_like(x)
    for r in range(n_rects):
        cx = rects_ref[r, 0]
        cy = rects_ref[r, 1]
        hw = 0.5 * rects_ref[r, 2]
        hh = 0.5 * rects_ref[r, 3]
        inside = (jnp.abs(x - cx) <= hw) & (jnp.abs(y - cy) <= hh)
        acc = acc + inside.astype(x.dtype)
    for c in range(n_circles):
        cx = circles_ref[c, 0]
        cy = circles_ref[c, 1]
        r2 = circles_ref[c, 2] * circles_ref[c, 2]
        d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
        acc = acc + (d2 <= r2).astype(x.dtype)
    out_ref[:] = acc


@jax.jit
def primitive_field_cost(
    rects: jnp.ndarray, circles: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Count of primitives containing each point — the Pallas execution of
    ``Primitive2DField.compute_cost`` (squared-distance circle membership, so
    results match the analytic field exactly)."""
    batch_shape = points.shape[:-1]
    num = int(np.prod(batch_shape)) if batch_shape else 1
    rows, tile = 8, 1024
    per_tile = rows * tile
    n_tiles = -(-num // per_tile)
    pad = n_tiles * per_tile - num
    flat = points.reshape(-1, 2)
    xs = jnp.pad(flat[:, 0], (0, pad)).reshape(n_tiles * rows, tile)
    ys = jnp.pad(flat[:, 1], (0, pad)).reshape(n_tiles * rows, tile)

    n_rects = int(rects.shape[0])
    n_circles = int(circles.shape[0])
    # pallas wants non-empty refs; pad params to at least one row
    rects_in = rects if n_rects else jnp.zeros((1, 4), dtype=points.dtype)
    circles_in = circles if n_circles else jnp.zeros((1, 3), dtype=points.dtype)

    kernel = functools.partial(
        _primitive_kernel, n_rects=n_rects, n_circles=n_circles
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                rects_in.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                circles_in.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((rows, tile), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, tile), points.dtype),
        interpret=_interpret(),
    )(xs, ys, rects_in, circles_in)
    return out.reshape(-1)[:num].reshape(batch_shape)
