"""Occupancy map construction and map generator."""

import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.envs import (
    ObstacleCircle,
    ObstacleMap,
    ObstacleRectangle,
    generate_obstacle_map,
)


def test_rectangle_rasterization():
    m = ObstacleMap((10, 10), 1.0)
    ObstacleRectangle(0, 0, 4, 2).add_to_map(m)
    # footprint: x cells [5-2, 5+2), y cells [5-1, 5+1)
    assert m.map.sum() == 4 * 2
    assert m.map[4:6, 3:7].sum() == 8


def test_circle_rasterization_matches_percell_oracle():
    m = ObstacleMap((20, 20), 0.5)
    c = ObstacleCircle(1.0, -2.0, 1.5)
    c.add_to_map(m)
    # per-cell oracle with the same convention (reference obst_map.py:99-104)
    want = np.zeros_like(m.map)
    for i in range(m.map.shape[0]):
        for j in range(m.map.shape[1]):
            p = np.array([(j - m.origin_xi) * 0.5, (i - m.origin_yi) * 0.5])
            if np.linalg.norm(p - np.array([1.0, -2.0])) <= 1.5:
                want[i, j] = 1
    np.testing.assert_array_equal(m.map, want)


def test_map_lookup_roundtrip():
    m = ObstacleMap((20, 20), 0.1)
    ObstacleRectangle(3.0, 4.0, 2.0, 2.0).add_to_map(m)
    m.convert_map()
    inside = jnp.asarray([[3.0, 4.0]])
    outside = jnp.asarray([[-5.0, -5.0]])
    assert float(m.compute_cost(inside)[0]) >= 1.0
    assert float(m.compute_cost(outside)[0]) == 0.0


def test_generate_obstacle_map_seeded():
    kwargs = dict(
        map_dim=(20, 20),
        obst_list=[ObstacleRectangle(0, 0, 2, 3)],
        cell_size=0.1,
        random_gen=True,
        num_obst=8,
        rand_limits=[[-5, 5], [-5, 5]],
        rand_rect_shape=[2, 2],
        rand_circle_radius=1.0,
        rng=42,
    )
    m1, l1 = generate_obstacle_map(**kwargs)
    m2, l2 = generate_obstacle_map(**kwargs)
    np.testing.assert_array_equal(m1.map, m2.map)  # deterministic under a seed
    assert len(l1) == len(l2)
    assert np.all(m1.map <= 1)  # rejection sampling forbids overlap
    assert len(l1) >= 1


def test_grid_field_is_jittable():
    import jax

    m = ObstacleMap((10, 10), 0.5)
    ObstacleCircle(0, 0, 1.0).add_to_map(m)
    field = m.as_field()

    @jax.jit
    def f(x):
        return field.compute_cost(x)

    x = jnp.zeros((3, 7, 2))
    assert f(x).shape == (3, 7)
    assert float(f(x)[0, 0]) >= 1.0
