"""Fused link-field Pallas kernel: self-collision RBF + obstacle-sphere RBF
computed in one VMEM pass over link positions.

The separate field evaluations materialize ``[B*T, L, L]`` and ``[B*T, L, O]``
intermediates in HBM; with L=9 links that's ~10x the size of the positions
themselves. This kernel consumes positions laid out as coordinate planes
``[L, N]`` and emits the weighted sum of both field values per point — zero
HBM intermediates, unrolled over the (static) link pairs and obstacles.

Exactly equal (tested) to
``w_self * LinkSelfDistanceField(margin).compute_cost
 + w_obst * LinkDistanceField('rbf').compute_cost``.
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


def _kernel(xs_ref, ys_ref, zs_ref, spheres_ref, out_ref, *, n_links, n_obst,
            margin, w_self, w_obst):
    x = xs_ref[:]  # [L, TILE]
    y = ys_ref[:]
    z = zs_ref[:]
    tile = x.shape[1]
    acc = jnp.zeros((1, tile), dtype=x.dtype)

    if w_self != 0.0:
        # full-matrix sum like the reference (fields.py:124): diagonal terms
        # are exp(0) = 1 (constant n_links), off-diagonal pairs counted twice.
        inv = 1.0 / (2.0 * margin * margin)
        s = jnp.zeros((1, tile), dtype=x.dtype)
        for i in range(n_links):
            for j in range(i + 1, n_links):
                dx = x[i] - x[j]
                dy = y[i] - y[j]
                dz = z[i] - z[j]
                d2 = dx * dx + dy * dy + dz * dz
                s = s + 2.0 * jnp.exp(-d2 * inv)[None]
        acc = acc + w_self * (s + float(n_links))

    if w_obst != 0.0 and n_obst:
        o = jnp.zeros((1, tile), dtype=x.dtype)
        for l in range(n_links):
            for k in range(n_obst):
                cx = spheres_ref[k, 0]
                cy = spheres_ref[k, 1]
                cz = spheres_ref[k, 2]
                r = spheres_ref[k, 3]
                dx = x[l] - cx
                dy = y[l] - cy
                dz = z[l] - cz
                d2 = dx * dx + dy * dy + dz * dz
                o = o + jnp.exp(-0.5 * d2 / (r * r))[None]
        acc = acc + w_obst * o

    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("margin", "w_self", "w_obst")
)
def fused_link_fields_cost(
    positions: jnp.ndarray,  # [..., L, 3]
    obstacle_spheres: jnp.ndarray | None,  # [O, 4] (or [1, O, 4])
    *,
    margin: float,
    w_self: float,
    w_obst: float,
) -> jnp.ndarray:
    """Weighted self-RBF + obstacle-RBF field value per point: ``[...]``."""
    batch_shape = positions.shape[:-2]
    l = positions.shape[-2]
    num = int(np.prod(batch_shape)) if batch_shape else 1
    flat = positions.reshape(num, l, 3)

    tile = 1024
    n_tiles = -(-num // tile)
    pad = n_tiles * tile - num
    planes = jnp.moveaxis(flat, 0, -1)  # [L, 3, N]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, pad)))
    xs, ys, zs = planes[:, 0], planes[:, 1], planes[:, 2]  # [L, Npad]

    if obstacle_spheres is None:
        spheres = jnp.zeros((1, 4), dtype=positions.dtype)
        n_obst = 0
    else:
        spheres = obstacle_spheres.reshape(-1, 4).astype(positions.dtype)
        n_obst = int(spheres.shape[0])

    kernel = functools.partial(
        _kernel,
        n_links=l, n_obst=n_obst, margin=margin, w_self=w_self, w_obst=w_obst,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((l, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(spheres.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * tile), positions.dtype),
        interpret=_interpret(),
    )(xs, ys, zs, spheres)
    return out[0, :num].reshape(batch_shape)


# --------------------------------------------------------------------------- #
# FK-in-kernel variant: joint angles in, field values out.
# --------------------------------------------------------------------------- #


def _fk_fields_kernel(q_ref, spheres_ref, out_ref, *, chain, n_dof, n_obst,
                      margin, w_self, w_obst):
    """Per tile of points: run the FK scalar-plane composition IN VMEM (the
    same trace-time-folded algebra as ``KinematicChain.fk_planes_from_scalars``
    — sin/cos + elementwise VPU math) and immediately reduce the link
    positions into the self-collision and obstacle RBF field sums. Nothing of
    size ``[N, L, 3]`` ever exists: the only HBM traffic is the joint-angle
    planes in and the field values out.

    ``q_ref``: ``[n_dof, BR, BC]`` — each dof's plane a full ``[BR, BC]``
    2D tile (all 8 sublanes utilized; a ``[1, N]`` layout runs the VPU at
    1/8 occupancy)."""
    qs = [q_ref[i] for i in range(n_dof)]  # [BR, BC] planes
    planes = chain.fk_planes_from_scalars(qs)
    pos = [p for (_, p) in planes]
    l = len(pos)
    acc = jnp.zeros(qs[0].shape, dtype=out_ref.dtype)

    if w_self != 0.0:
        # all-ordered-pairs sum like the reference (fields.py:124): diagonal
        # exp(0)=1 terms contribute the constant l, symmetric pairs twice.
        inv = 1.0 / (2.0 * margin * margin)
        s = None
        for i in range(l):
            for j in range(i + 1, l):
                dx = pos[i][0] - pos[j][0]
                dy = pos[i][1] - pos[j][1]
                dz = pos[i][2] - pos[j][2]
                d2 = dx * dx + dy * dy + dz * dz
                e = 2.0 * jnp.exp(-d2 * inv)
                s = e if s is None else s + e
        acc = acc + w_self * (s + float(l))

    if w_obst != 0.0 and n_obst:
        o = None
        for li in range(l):
            for k in range(n_obst):
                dx = pos[li][0] - spheres_ref[k, 0]
                dy = pos[li][1] - spheres_ref[k, 1]
                dz = pos[li][2] - spheres_ref[k, 2]
                r = spheres_ref[k, 3]
                d2 = dx * dx + dy * dy + dz * dz
                e = jnp.exp(-0.5 * d2 / (r * r))
                o = e if o is None else o + e
        acc = acc + w_obst * o

    out_ref[:] = acc


def fk_link_fields_cost(
    chain,
    q: jnp.ndarray,  # [N, n_dof]
    obstacle_spheres: jnp.ndarray | None,  # [O, 4]-reshapable
    *,
    margin: float,
    w_self: float,
    w_obst: float,
    block_rows: int = 8,
    cols: int = 1024,
) -> jnp.ndarray:
    """Weighted self-RBF + obstacle-RBF per configuration, FK fused in-kernel.

    Exactly the same field values as ``fused_link_fields_cost`` on
    ``chain.fk_compact(q).positions``, minus the ``[N, L, 3]`` link tensor:
    profiling on v5e showed that tensor's materialization (3-wide minor dim —
    ~42x tile padding) costing ~13 ms/iter at the 1.3M-point Panda scaling
    config, 60% of the whole planner step.

    Layout: the point stream is reshaped to ``[n_dof, R, cols]`` so every
    in-kernel plane is a dense 2D ``[block_rows, cols]`` tile.
    """
    n, n_dof = q.shape
    per_block = block_rows * cols
    n_blocks = -(-n // per_block)
    npad = n_blocks * per_block - n
    qp = jnp.pad(q, ((0, npad), (0, 0)))  # [Npad, n_dof]
    qp = qp.T.reshape(n_dof, n_blocks * block_rows, cols)

    if obstacle_spheres is None:
        spheres = jnp.zeros((1, 4), dtype=q.dtype)
        n_obst = 0
    else:
        spheres = obstacle_spheres.reshape(-1, 4).astype(q.dtype)
        n_obst = int(spheres.shape[0])

    kernel = functools.partial(
        _fk_fields_kernel,
        chain=chain, n_dof=n_dof, n_obst=n_obst,
        margin=margin, w_self=w_self, w_obst=w_obst,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (n_dof, block_rows, cols), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(tuple(spheres.shape), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, cols), q.dtype),
        interpret=_interpret(),
    )(qp, spheres)
    return out.reshape(-1)[:n]


# --------------------------------------------------------------------------- #
# Flat-layout variant: samples stay [B, M]; joint planes come from one MXU
# selection matmul; FK + fields + time-masking happen in-kernel.
# --------------------------------------------------------------------------- #


def _fk_fields_rows_kernel(q_ref, spheres_ref, tmask_ref, out_ref, *, chain,
                           n_dof, tpad, n_obst, margin, w_self, w_obst):
    """``q_ref``: ``[BR, n_dof*TPAD]`` — dof ``d``'s time-plane in lanes
    ``[d*TPAD, (d+1)*TPAD)`` (128-aligned slices). Emits per-(row, timestep)
    field values, time-masked (t=0 and padding zeroed)."""
    qs = [q_ref[:, d * tpad : (d + 1) * tpad] for d in range(n_dof)]
    planes = chain.fk_planes_from_scalars(qs)
    pos = [p for (_, p) in planes]
    l = len(pos)
    acc = jnp.zeros(qs[0].shape, dtype=out_ref.dtype)

    if w_self != 0.0:
        inv = 1.0 / (2.0 * margin * margin)
        s = None
        for i in range(l):
            for j in range(i + 1, l):
                dx = pos[i][0] - pos[j][0]
                dy = pos[i][1] - pos[j][1]
                dz = pos[i][2] - pos[j][2]
                d2 = dx * dx + dy * dy + dz * dz
                e = 2.0 * jnp.exp(-d2 * inv)
                s = e if s is None else s + e
        acc = acc + w_self * (s + float(l))

    if w_obst != 0.0 and n_obst:
        o = None
        for li in range(l):
            for k in range(n_obst):
                dx = pos[li][0] - spheres_ref[k, 0]
                dy = pos[li][1] - spheres_ref[k, 1]
                dz = pos[li][2] - spheres_ref[k, 2]
                r = spheres_ref[k, 3]
                d2 = dx * dx + dy * dy + dz * dz
                e = jnp.exp(-0.5 * d2 / (r * r))
                o = e if o is None else o + e
        acc = acc + w_obst * o

    out_ref[:] = acc * tmask_ref[:]


def make_traj_selection(n_dof: int, state_dim: int, traj_len: int, tpad: int):
    """Selection matrix ``[traj_len*state_dim, n_dof*tpad]`` mapping a flat
    ``[T, d]``-ordered trajectory to per-dof contiguous time planes, plus the
    time mask zeroing t=0 (reference skips it, ``cost_functions.py:244``) and
    the padding columns."""
    m = traj_len * state_dim
    sel = np.zeros((m, n_dof * tpad), dtype=np.float32)
    for t in range(traj_len):
        for d in range(n_dof):
            sel[t * state_dim + d, d * tpad + t] = 1.0
    tmask = np.zeros((1, tpad), dtype=np.float32)
    tmask[0, 1:traj_len] = 1.0
    return jnp.asarray(sel), jnp.asarray(tmask)


def fk_link_fields_cost_flat(
    chain,
    x: jnp.ndarray,  # [B, M] flat [T, d]-ordered trajectories
    sel: jnp.ndarray,  # [M, n_dof*TPAD] from make_traj_selection
    tmask: jnp.ndarray,  # [1, TPAD]
    obstacle_spheres: jnp.ndarray | None,
    *,
    n_dof: int,
    tpad: int,
    margin: float,
    w_self: float,
    w_obst: float,
    block_rows: int = 64,
) -> jnp.ndarray:
    """Per-trajectory summed self+obstacle field cost ``[B]`` without EVER
    re-laying-out the sample batch: the ``[..., T, d]`` view of a trajectory
    pads its 14-wide minor dim ~9x on TPU tiles, and profiling showed that
    relayout (not the field math) costing ~13 of the 22 ms Panda-scaling
    iteration. Here one MXU matmul against a constant selection matrix
    produces 128-aligned per-dof time planes, and the Pallas kernel fuses
    FK + both RBF fields + the t=0 mask in VMEM."""
    b = x.shape[0]
    qsel = jnp.dot(x, sel, preferred_element_type=x.dtype)  # [B, n_dof*TPAD]
    return fk_link_fields_cost_rows(
        chain, qsel, tmask, obstacle_spheres, n_dof=n_dof, tpad=tpad,
        margin=margin, w_self=w_self, w_obst=w_obst, block_rows=block_rows,
    )


def fk_link_fields_cost_rows(
    chain,
    qrows: jnp.ndarray,  # [B, n_dof*TPAD] per-dof contiguous time planes
    tmask: jnp.ndarray,  # [1, TPAD]
    obstacle_spheres: jnp.ndarray | None,
    *,
    n_dof: int,
    tpad: int,
    margin: float,
    w_self: float,
    w_obst: float,
    block_rows: int = 64,
) -> jnp.ndarray:
    """The rows kernel of ``fk_link_fields_cost_flat`` without the selection
    matmul — for callers whose samples already live as per-dof time planes
    (the plane-layout planner pipeline)."""
    b = qrows.shape[0]
    bpad = block_rows * (-(-b // block_rows)) - b
    if bpad:
        qrows = jnp.pad(qrows, ((0, bpad), (0, 0)))
    n_blocks = qrows.shape[0] // block_rows

    if obstacle_spheres is None:
        spheres = jnp.zeros((1, 4), dtype=qrows.dtype)
        n_obst = 0
    else:
        spheres = obstacle_spheres.reshape(-1, 4).astype(qrows.dtype)
        n_obst = int(spheres.shape[0])

    kernel = functools.partial(
        _fk_fields_rows_kernel,
        chain=chain, n_dof=n_dof, tpad=tpad, n_obst=n_obst,
        margin=margin, w_self=w_self, w_obst=w_obst,
    )
    vals = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, n_dof * tpad), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(tuple(spheres.shape), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, tpad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_rows, tpad), qrows.dtype),
        interpret=_interpret(),
    )(qrows, spheres, tmask)
    return jnp.sum(vals[:b], axis=-1)
