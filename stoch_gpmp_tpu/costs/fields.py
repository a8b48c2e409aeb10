"""Distance fields: task-space collision and goal costs.

Capability parity with reference ``stoch_gpmp/costs/fields.py`` plus the 2D
occupancy-grid field (reference ``stoch_gpmp/envs/obst_map.py:164-185``, which
acts as a field via duck typing). All fields are immutable pytree dataclasses
whose ``compute_cost`` is pure and fully batched — safe under ``jit``/``vmap``.

The external-dependency surface the reference leaves to ``torch_robotics``
(``SE3_distance``, reference ``fields.py:4``) is provided natively by
``stoch_gpmp_tpu.kinematics.se3``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.kinematics.se3 import se3_distance


def _link_pos(link_tensor) -> jnp.ndarray:
    """Link positions from either homogeneous ``[..., L, 4, 4]`` poses or the
    compact ``kinematics.chain.LinkState`` (the low-traffic FK output)."""
    if hasattr(link_tensor, "positions"):
        return link_tensor.positions
    return link_tensor[..., :3, -1]


def _ee_pose(link_tensor) -> jnp.ndarray:
    """End-effector pose ``[..., 4, 4]`` from either representation."""
    if hasattr(link_tensor, "ee_pose"):
        return link_tensor.ee_pose()
    return link_tensor[..., -1, :, :]


def _interpolate_links(
    link_pos: jnp.ndarray, num_interpolate: int, interpolate_range: Sequence[int]
) -> jnp.ndarray:
    """Append ``num_interpolate`` points along each consecutive link segment in
    ``interpolate_range`` (reference ``fields.py:68-74``).

    ``link_pos``: ``[..., L, 3]`` -> ``[..., L + n_extra, 3]``.
    """
    if num_interpolate <= 0:
        return link_pos
    alpha = jnp.linspace(0.0, 1.0, num_interpolate + 2, dtype=link_pos.dtype)
    alpha = alpha[1 : num_interpolate + 1][:, None]  # [n, 1]
    extras = []
    for i in range(interpolate_range[0], interpolate_range[1]):
        x1 = link_pos[..., i, None, :]
        x2 = link_pos[..., i + 1, None, :]
        extras.append(x1 + (x2 - x1) * alpha)
    return jnp.concatenate([link_pos] + extras, axis=-2)


@struct.dataclass
class LinkDistanceField:
    """Robot-link vs obstacle-sphere field (reference ``fields.py:30-89``).

    ``field_type``: 'rbf' (Gaussian bumps summed), 'sdf' (max signed
    penetration, optional clamp), or 'occupancy' (count of links inside).
    """

    field_type: str = struct.field(pytree_node=False, default="rbf")
    clamp_sdf: bool = struct.field(pytree_node=False, default=False)
    num_interpolate: int = struct.field(pytree_node=False, default=0)
    link_interpolate_range: tuple = struct.field(
        pytree_node=False, default=(5, 7)
    )

    def _link_positions(self, link_tensor) -> jnp.ndarray:
        pos = _link_pos(link_tensor)
        return _interpolate_links(
            pos, self.num_interpolate, self.link_interpolate_range
        )

    def distances(
        self, link_tensor, obstacle_spheres: jnp.ndarray
    ) -> jnp.ndarray:
        """Signed center distances minus radii: ``[..., L, n_obst]``."""
        link_pos = _link_pos(link_tensor)[..., None, :]
        centers = obstacle_spheres[..., :3]
        radii = obstacle_spheres[..., 3]
        return jnp.linalg.norm(link_pos - centers, axis=-1) - radii

    def compute_collision(
        self,
        link_tensor: jnp.ndarray,
        obstacle_spheres: jnp.ndarray | None = None,
        buffer: float = 0.02,
    ) -> jnp.ndarray:
        if obstacle_spheres is None:
            return jnp.zeros(_link_pos(link_tensor).shape[:-2], dtype=bool)
        d = self.distances(link_tensor, obstacle_spheres)
        return jnp.any(d < buffer, axis=(-2, -1))

    def compute_distance(
        self, link_tensor: jnp.ndarray, obstacle_spheres: jnp.ndarray | None = None, **kw
    ) -> jnp.ndarray:
        if obstacle_spheres is None:
            return jnp.asarray(1e10, dtype=_link_pos(link_tensor).dtype)
        return self.distances(link_tensor, obstacle_spheres).sum((-1, -2))

    def compute_cost(
        self,
        link_tensor: jnp.ndarray,
        obstacle_spheres: jnp.ndarray | None = None,
        **kw,
    ) -> jnp.ndarray:
        """``link_tensor``: ``[..., L, 4, 4]`` homogeneous link poses;
        ``obstacle_spheres``: ``[..., n_obst, 4]`` (center xyz, radius).
        Returns ``[...]`` (reduced over links and obstacles)."""
        if obstacle_spheres is None:
            lp = _link_pos(link_tensor)
            return jnp.zeros(lp.shape[:-2], dtype=lp.dtype)
        link_pos = self._link_positions(link_tensor)[..., None, :]  # [..., L, 1, 3]
        centers = obstacle_spheres[..., :3]
        radii = obstacle_spheres[..., 3]
        if self.field_type == "rbf":
            sq = jnp.sum(jnp.square(link_pos - centers), axis=-1)
            return jnp.exp(-0.5 * sq / jnp.square(radii)).sum((-1, -2))
        if self.field_type == "sdf":
            sdf = -jnp.linalg.norm(link_pos - centers, axis=-1) + radii
            if self.clamp_sdf:
                sdf = jnp.clip(sdf, max=0.0)
            return sdf.max((-1, -2))
        if self.field_type == "occupancy":
            inside = jnp.linalg.norm(link_pos - centers, axis=-1) < radii
            return inside.sum((-1, -2)).astype(link_pos.dtype)
        raise ValueError(f"unknown field_type: {self.field_type}")


@struct.dataclass
class MeshSphereDistanceField:
    """Obstacle field evaluated at a sphere decomposition of the robot's
    COLLISION MESHES (``kinematics/panda_collision.py``) instead of link
    origins — planning against the real arm volume, matching the geometry of
    the env's contact check (and of the reference's PyBullet
    ``getClosestPoints``, ``panda.py:453-481``).

    Same RBF family as ``LinkDistanceField`` (reference ``fields.py:78-79``)
    but measured from the robot SURFACE: each mesh sphere (center ``c`` in
    its link frame, radius ``r_s``) contributes
    ``exp(-0.5 * max(||R c + p - o|| - r_s, 0)^2 / r_o^2)`` per obstacle.

    Center transforms are expanded elementwise (no ``[.., 3, 3]`` batched
    tiny matmuls — the known MXU trap). Static-base spheres are excluded
    (constant in q — no planning gradient).
    """

    link_indices: tuple = struct.field(pytree_node=False)
    centers: tuple  # per link group: [K_i, 3]
    radii: tuple  # per link group: [K_i]

    @classmethod
    def for_panda(cls, chain, dtype=jnp.float32) -> "MeshSphereDistanceField":
        from stoch_gpmp_tpu.kinematics.panda_collision import (
            PANDA_COLLISION_SPHERES,
        )

        names = list(chain.link_names)
        idxs, cs, rs = [], [], []
        for frame, sph in PANDA_COLLISION_SPHERES.items():
            if frame in names:
                idxs.append(names.index(frame))
                cs.append(jnp.asarray(sph[:, :3], dtype=dtype))
                rs.append(jnp.asarray(sph[:, 3], dtype=dtype))
        return cls(link_indices=tuple(idxs), centers=tuple(cs), radii=tuple(rs))

    def world_spheres(self, link_tensor):
        """``[..., N, 3]`` world centers + ``[N]`` radii of all mesh
        spheres."""
        cws, rws = [], []
        for idx, c, r in zip(self.link_indices, self.centers, self.radii):
            h = link_tensor[..., idx, :, :]
            rot = h[..., :3, :3]  # [.., 3, 3]
            pw = h[..., :3, 3]
            # cw[k, i] = sum_j rot[i, j] c[k, j] + p[i] — elementwise expand
            cw = jnp.sum(
                rot[..., None, :, :] * c[:, None, :], axis=-1
            ) + pw[..., None, :]  # [.., K, 3]
            cws.append(cw)
            rws.append(r)
        return jnp.concatenate(cws, axis=-2), jnp.concatenate(rws)

    def compute_cost(self, link_tensor, obstacle_spheres=None, **kw):
        if obstacle_spheres is None:
            lp = _link_pos(link_tensor)
            return jnp.zeros(lp.shape[:-2], dtype=lp.dtype)
        cw, rw = self.world_spheres(link_tensor)  # [.., N, 3], [N]
        o_c = obstacle_spheres[..., :3]
        o_r = obstacle_spheres[..., 3]
        d = jnp.linalg.norm(cw[..., :, None, :] - o_c[..., None, :, :], axis=-1)
        d_surf = jnp.maximum(d - rw[..., :, None], 0.0)
        return jnp.exp(-0.5 * jnp.square(d_surf) / jnp.square(o_r)).sum((-1, -2))

    def compute_collision(self, link_tensor, obstacle_spheres=None, buffer=0.0,
                          **kw):
        if obstacle_spheres is None:
            lp = _link_pos(link_tensor)
            return jnp.zeros(lp.shape[:-2], dtype=bool)
        cw, rw = self.world_spheres(link_tensor)
        o_c = obstacle_spheres[..., :3]
        o_r = obstacle_spheres[..., 3]
        d = jnp.linalg.norm(cw[..., :, None, :] - o_c[..., None, :, :], axis=-1)
        return jnp.any(
            d - rw[..., :, None] - o_r[..., None, :] < buffer, axis=(-1, -2)
        )


@struct.dataclass
class MeshSphereFloorField:
    """Floor-avoidance field on the mesh-sphere decomposition: RBF of the
    clamped clearance between each robot sphere's lowest point and the floor
    plane. Pairs with the env's conservative mesh-sphere floor check (which
    flags contact when any sphere touches z = floor) so plans keep the whole
    arm VOLUME clear — the reference stack has no floor cost because its
    bullet check sees the true (tighter) meshes."""

    mesh: MeshSphereDistanceField
    floor_z: float = struct.field(pytree_node=False, default=0.0)
    width: float = struct.field(pytree_node=False, default=0.05)

    def compute_cost(self, link_tensor, **kw):
        cw, rw = self.mesh.world_spheres(link_tensor)
        clear = jnp.maximum(cw[..., 2] - rw - self.floor_z, 0.0)
        return jnp.exp(-0.5 * jnp.square(clear) / self.width**2).sum(-1)


@struct.dataclass
class LinkSelfDistanceField:
    """Self-collision RBF field between all link-pair positions
    (reference ``fields.py:92-127``)."""

    margin: float = struct.field(pytree_node=False, default=0.03)
    num_interpolate: int = struct.field(pytree_node=False, default=0)
    link_interpolate_range: tuple = struct.field(
        pytree_node=False, default=(5, 7)
    )

    def distances(self, link_tensor) -> jnp.ndarray:
        pos = _link_pos(link_tensor)
        return jnp.linalg.norm(pos[..., None, :] - pos[..., None, :, :], axis=-1)

    def compute_collision(
        self, link_tensor: jnp.ndarray, buffer: float = 0.05
    ) -> jnp.ndarray:
        d = self.distances(link_tensor)
        below = d < buffer
        # strictly-lower triangle excluding adjacent links (tril diagonal=-2,
        # reference fields.py:106)
        l = d.shape[-1]
        rows = jnp.arange(l)[:, None]
        cols = jnp.arange(l)[None, :]
        mask = rows >= cols + 2
        return jnp.any(below & mask, axis=(-2, -1))

    def compute_distance(self, link_tensor: jnp.ndarray) -> jnp.ndarray:
        return self.distances(link_tensor).sum((-1, -2))

    def compute_cost(self, link_tensor, **kw) -> jnp.ndarray:
        pos = _link_pos(link_tensor)
        pos = _interpolate_links(pos, self.num_interpolate, self.link_interpolate_range)
        sq = jnp.sum(
            jnp.square(pos[..., None, :] - pos[..., None, :, :]), axis=-1
        )
        return jnp.exp(sq / (-(self.margin**2) * 2.0)).sum((-1, -2))


@struct.dataclass
class EESE3DistanceField:
    """End-effector SE(3) pose distance to a target transform
    (reference ``fields.py:130-153``; the last link is the EE)."""

    target_h: jnp.ndarray  # [4, 4]
    w_pos: float = struct.field(pytree_node=False, default=1.0)
    w_rot: float = struct.field(pytree_node=False, default=1.0)
    square: bool = struct.field(pytree_node=False, default=True)

    def update_target(self, target_h: jnp.ndarray) -> "EESE3DistanceField":
        return self.replace(target_h=target_h)

    def compute_distance(self, link_tensor) -> jnp.ndarray:
        return se3_distance(
            _ee_pose(link_tensor), self.target_h, w_pos=self.w_pos, w_rot=self.w_rot
        )

    def compute_cost(self, link_tensor, **kw) -> jnp.ndarray:
        dist = self.compute_distance(link_tensor)
        return jnp.square(dist) if self.square else dist


@struct.dataclass
class OccupancyGridField:
    """2D occupancy-grid lookup field (reference ``obst_map.py:164-185``).

    ``grid``: ``[ny, nx]`` cost values; world frame centered at the map center.
    Lookup: floor(world / cell_size) + center offset, clamped to bounds, then
    read ``grid[y, x]``.

    ``lookup`` selects the TPU execution strategy (identical results):
    - ``'gather'``: direct XLA gather — fine on CPU, slow on TPU (scalar
      gathers don't vectorize onto the VPU/MXU).
    - ``'onehot'``: one-hot matmul ``onehot(y) @ grid`` then a masked row
      reduction — turns the lookup into MXU work; ~an order of magnitude
      faster on TPU for planner-scale batches.
    """

    grid: jnp.ndarray
    cell_size: float = struct.field(pytree_node=False, default=1.0)
    lookup: str = struct.field(pytree_node=False, default="gather")

    def _cells(self, x: jnp.ndarray):
        ny, nx = self.grid.shape
        offset = jnp.asarray([nx // 2, ny // 2], dtype=x.dtype)
        cells = jnp.floor(x / self.cell_size + offset).astype(jnp.int32)
        cx = jnp.clip(cells[..., 0], 0, nx - 1)
        cy = jnp.clip(cells[..., 1], 0, ny - 1)
        return cy, cx

    def compute_cost(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        """``x``: ``[..., 2]`` world positions -> ``[...]`` occupancy cost."""
        cy, cx = self._cells(x)
        if self.lookup == "gather":
            return self.grid[cy, cx]
        if self.lookup == "onehot":
            ny, nx = self.grid.shape
            batch_shape = cy.shape
            cyf = cy.reshape(-1)
            cxf = cx.reshape(-1)
            dtype = self.grid.dtype
            oh_y = (
                cyf[:, None] == jnp.arange(ny, dtype=jnp.int32)[None, :]
            ).astype(dtype)
            rows = oh_y @ self.grid  # [N, nx] — MXU
            oh_x = cxf[:, None] == jnp.arange(nx, dtype=jnp.int32)[None, :]
            vals = jnp.sum(rows * oh_x.astype(dtype), axis=-1)
            return vals.reshape(batch_shape)
        raise ValueError(f"unknown lookup strategy: {self.lookup}")

    def compute_collision(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return self.compute_cost(x) > 0

    def compute_distance(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return -self.compute_cost(x)


@struct.dataclass
class RasterPrimitive2DField:
    """Gather-free field with EXACT rasterized-occupancy-grid semantics.

    TPU gathers are slow and Mosaic's ``dynamic_gather`` is vreg-local, so a
    table lookup can't be made fast. But the grid is a rasterization of known
    primitives, and the rasterization rule is analytic in the snapped cell
    coordinates: a rectangle's footprint is an integer cell-range test
    (reference ``obst_map.py:59-72``) and a circle's footprint is a
    norm-vs-radius test of the cell's world point (``obst_map.py:99-104``).
    Evaluating those tests directly — on the clamped cell index of each query
    point (``obst_map.py:173-181``) — reproduces ``grid[y, x]`` EXACTLY
    (overlaps add, boundary cells match; verified against the reference) with
    pure elementwise math. ~8x faster than the one-hot grid lookup on v5e,
    further accelerated by the Pallas kernel in ``ops/pallas/fields.py``.

    Build from an obstacle list + map geometry via ``from_map``.
    """

    rect_bounds: jnp.ndarray  # [R, 4] int32 — x0, x1, y0, y1 cell ranges
    circles: jnp.ndarray  # [C, 3] float — cx, cy, r (world units)
    cell_size: float = struct.field(pytree_node=False)
    nx: int = struct.field(pytree_node=False)
    ny: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def from_map(cls, obst_map, obstacles, dtype=jnp.float32, use_pallas=True):
        """``obst_map``: an ``envs.ObstacleMap``; ``obstacles``: the primitive
        list it was rasterized from (``generate_obstacle_map`` returns both)."""
        from math import ceil

        from stoch_gpmp_tpu.envs.obst_map import ObstacleCircle, ObstacleRectangle

        cs = obst_map.cell_size
        ox, oy = obst_map.origin_xi, obst_map.origin_yi
        rects, circles = [], []
        for o in obstacles:
            if isinstance(o, ObstacleRectangle):
                w = ceil(o.width / cs)
                h = ceil(o.height / cs)
                c_x = ceil(o.center_x / cs)
                c_y = ceil(o.center_y / cs)
                rects.append(
                    [
                        c_x - ceil(w / 2.0) + ox,
                        c_x + ceil(w / 2.0) + ox,
                        c_y - ceil(h / 2.0) + oy,
                        c_y + ceil(h / 2.0) + oy,
                    ]
                )
            elif isinstance(o, ObstacleCircle):
                circles.append([o.center_x, o.center_y, o.radius])
            else:
                raise TypeError(f"unsupported obstacle type {type(o)}")
        import numpy as np

        return cls(
            rect_bounds=jnp.asarray(np.asarray(rects, dtype=np.int32).reshape(-1, 4)),
            circles=jnp.asarray(np.asarray(circles, dtype=float).reshape(-1, 3), dtype=dtype),
            cell_size=cs,
            nx=obst_map.x_dim,
            ny=obst_map.y_dim,
            use_pallas=use_pallas,
        )

    def _cells(self, x: jnp.ndarray):
        offset = jnp.asarray([self.nx // 2, self.ny // 2], dtype=x.dtype)
        cells = jnp.floor(x / self.cell_size + offset).astype(jnp.int32)
        jc = jnp.clip(cells[..., 0], 0, self.nx - 1)
        ic = jnp.clip(cells[..., 1], 0, self.ny - 1)
        return ic, jc

    def compute_cost(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        if self.use_pallas:
            from stoch_gpmp_tpu.ops.pallas.fields import raster_primitive_cost

            return raster_primitive_cost(
                self.rect_bounds, self.circles, x,
                cell_size=self.cell_size, nx=self.nx, ny=self.ny,
            )
        ic, jc = self._cells(x)
        total = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        if self.rect_bounds.shape[0]:
            rb = self.rect_bounds
            in_x = (jc[..., None] >= rb[:, 0]) & (jc[..., None] < rb[:, 1])
            in_y = (ic[..., None] >= rb[:, 2]) & (ic[..., None] < rb[:, 3])
            total = total + (in_x & in_y).astype(x.dtype).sum(-1)
        if self.circles.shape[0]:
            px = (jc - self.nx // 2).astype(x.dtype) * self.cell_size
            py = (ic - self.ny // 2).astype(x.dtype) * self.cell_size
            d = jnp.sqrt(
                jnp.square(px[..., None] - self.circles[:, 0])
                + jnp.square(py[..., None] - self.circles[:, 1])
            )
            total = total + (d <= self.circles[:, 2]).astype(x.dtype).sum(-1)
        return total

    def compute_cost_planes(self, x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
        """``compute_cost`` on separate coordinate planes ``[..., T]`` —
        the long-horizon plane-layout path. Unrolled over the (static-count)
        primitives so no ``[..., 2]`` or ``[..., R]`` minor dim is ever
        materialized (2-wide minors pad 64x on TPU tiles)."""
        ox, oy = self.nx // 2, self.ny // 2
        jc = jnp.clip(jnp.floor(x / self.cell_size + ox).astype(jnp.int32), 0, self.nx - 1)
        ic = jnp.clip(jnp.floor(y / self.cell_size + oy).astype(jnp.int32), 0, self.ny - 1)
        total = jnp.zeros(x.shape, dtype=x.dtype)
        for r in range(int(self.rect_bounds.shape[0])):
            inside = (
                (jc >= self.rect_bounds[r, 0])
                & (jc < self.rect_bounds[r, 1])
                & (ic >= self.rect_bounds[r, 2])
                & (ic < self.rect_bounds[r, 3])
            )
            total = total + inside.astype(x.dtype)
        if int(self.circles.shape[0]):
            wx = (jc - ox).astype(x.dtype) * self.cell_size
            wy = (ic - oy).astype(x.dtype) * self.cell_size
            for c in range(int(self.circles.shape[0])):
                dx = wx - self.circles[c, 0]
                dy = wy - self.circles[c, 1]
                hit = jnp.sqrt(dx * dx + dy * dy) <= self.circles[c, 2]
                total = total + hit.astype(x.dtype)
        return total

    def compute_collision(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return self.compute_cost(x) > 0

    def compute_distance(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return -self.compute_cost(x)


@struct.dataclass
class Primitive2DField:
    """Analytic 2D obstacle field over rectangle/circle primitives.

    A gather-free alternative to the rasterized ``OccupancyGridField``: the
    occupancy indicator is evaluated directly against the primitive parameters
    (pure VPU elementwise math, no table lookup — the fastest TPU path).
    Semantically equivalent to the grid up to cell quantization; build one
    from a generated obstacle list via ``from_obstacles``.
    """

    rects: jnp.ndarray  # [R, 4] — cx, cy, width, height (R may be 0)
    circles: jnp.ndarray  # [C, 3] — cx, cy, radius (C may be 0)

    @classmethod
    def from_obstacles(cls, obstacles, dtype=jnp.float32) -> "Primitive2DField":
        from stoch_gpmp_tpu.envs.obst_map import ObstacleCircle, ObstacleRectangle

        rects, circles = [], []
        for o in obstacles:
            if isinstance(o, ObstacleRectangle):
                rects.append([o.center_x, o.center_y, o.width, o.height])
            elif isinstance(o, ObstacleCircle):
                circles.append([o.center_x, o.center_y, o.radius])
            else:
                raise TypeError(f"unsupported obstacle type {type(o)}")
        return cls(
            rects=jnp.asarray(rects, dtype=dtype).reshape(-1, 4),
            circles=jnp.asarray(circles, dtype=dtype).reshape(-1, 3),
        )

    def compute_cost(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        """``x``: ``[..., 2]`` -> number of primitives containing each point."""
        total = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        if self.rects.shape[0]:
            dxy = jnp.abs(x[..., None, :] - self.rects[:, :2])  # [..., R, 2]
            inside = jnp.all(dxy <= 0.5 * self.rects[:, 2:4], axis=-1)
            total = total + inside.astype(x.dtype).sum(-1)
        if self.circles.shape[0]:
            d2 = jnp.sum(
                jnp.square(x[..., None, :] - self.circles[:, :2]), axis=-1
            )
            inside = d2 <= jnp.square(self.circles[:, 2])
            total = total + inside.astype(x.dtype).sum(-1)
        return total

    def compute_collision(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return self.compute_cost(x) > 0

    def compute_distance(self, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return -self.compute_cost(x)
