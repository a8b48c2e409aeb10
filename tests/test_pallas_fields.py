"""Pallas field kernels (interpret mode on CPU) vs pure-JAX references."""

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.costs.fields import (
    OccupancyGridField,
    Primitive2DField,
    RasterPrimitive2DField,
)
from stoch_gpmp_tpu.envs import generate_obstacle_map
from stoch_gpmp_tpu.ops.pallas import (
    grid_lookup,
    primitive_field_cost,
    raster_primitive_cost,
)


def test_grid_lookup_kernel_parity():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.random((200, 200)), dtype=jnp.float32)
    pts = jnp.asarray(rng.uniform(-11, 11, (3, 457, 2)), dtype=jnp.float32)
    ref = OccupancyGridField(grid=grid, cell_size=0.1).compute_cost(pts)
    got = grid_lookup(grid, pts, 0.1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_primitive_kernel_parity():
    rng = np.random.default_rng(1)
    rects = jnp.asarray(rng.uniform(-5, 5, (4, 4)), dtype=jnp.float32).at[:, 2:].set(2.0)
    circles = jnp.asarray(rng.uniform(-5, 5, (3, 3)), dtype=jnp.float32).at[:, 2].set(1.5)
    f = Primitive2DField(rects=rects, circles=circles)
    pts = jnp.asarray(rng.uniform(-8, 8, (1234, 2)), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(primitive_field_cost(rects, circles, pts)),
        np.asarray(f.compute_cost(pts)),
    )


def test_raster_field_exact_grid_parity():
    """The gather-free rasterized field reproduces grid[y, x] EXACTLY on a
    randomly generated map — both the pure-JAX and the Pallas paths."""
    obst_map, obst_list = generate_obstacle_map(
        map_dim=(20, 20),
        cell_size=0.1,
        random_gen=True,
        num_obst=15,
        rand_limits=[[-7.5, 7.5], [-7.5, 7.5]],
        rand_rect_shape=[2, 2],
        rng=7,
        dtype=jnp.float32,
    )
    grid_field = obst_map.as_field()
    rng = np.random.default_rng(2)
    # random points incl. out-of-bounds (clamping parity)
    pts = jnp.asarray(rng.uniform(-12, 12, (5000, 2)), dtype=jnp.float32)
    want = np.asarray(grid_field.compute_cost(pts))

    raster_xla = RasterPrimitive2DField.from_map(obst_map, obst_list, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(raster_xla.compute_cost(pts)), want)

    raster_pl = RasterPrimitive2DField.from_map(obst_map, obst_list, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(raster_pl.compute_cost(pts)), want)


def test_raster_kernel_empty_primitive_classes():
    # rect-only and circle-only maps
    from stoch_gpmp_tpu.envs import ObstacleCircle, ObstacleMap, ObstacleRectangle

    for obstacles in ([ObstacleRectangle(1.0, 1.0, 2.0, 2.0)], [ObstacleCircle(0.0, 0.0, 2.0)]):
        m = ObstacleMap((10, 10), 0.25)
        for o in obstacles:
            o.add_to_map(m)
        m.convert_map()
        f = RasterPrimitive2DField.from_map(m, obstacles, use_pallas=True)
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-6, 6, (500, 2)), dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(f.compute_cost(pts)), np.asarray(m.as_field().compute_cost(pts))
        )
