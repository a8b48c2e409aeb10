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
