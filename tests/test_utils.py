"""Utils: paths, timer/print_info, checkpoint save/load."""

import jax
import jax.numpy as jnp
import numpy as np

from stoch_gpmp_tpu.planners import StochGPMPState
from stoch_gpmp_tpu.utils import (
    Timer,
    get_assets_path,
    get_root_path,
    load_planner_state,
    print_info,
    save_planner_state,
)


def test_paths():
    root = get_root_path()
    assert (root / "stoch_gpmp_tpu").is_dir()
    assert get_assets_path().name == "assets"


def test_print_info_smoke(capsys):
    import time

    print_info(10, 100, time.time(), time.time(), np.ones((3, 4)))
    out = capsys.readouterr().out
    assert "Iteration:" in out and "Cost:" in out


def test_timer_laps():
    t = Timer()
    with t.lap("a"):
        sum(range(1000))
    assert t.laps["a"] >= 0
    assert t.total() >= t.laps["a"]


def test_checkpoint_roundtrip(tmp_path):
    state = StochGPMPState(
        particle_means=jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 4))),
        key=jax.random.PRNGKey(7),
    )
    path = str(tmp_path / "ckpt.npz")
    save_planner_state(path, state)
    zero = StochGPMPState(
        particle_means=jnp.zeros((4, 8, 4), dtype=state.particle_means.dtype),
        key=jax.random.PRNGKey(0),
    )
    loaded = load_planner_state(path, zero)
    np.testing.assert_array_equal(
        np.asarray(loaded.particle_means), np.asarray(state.particle_means)
    )
    # key restored: same randoms
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(loaded.key, (5,))),
        np.asarray(jax.random.normal(state.key, (5,))),
    )


def test_checkpoint_resume_equivalence(tmp_path):
    """Saving mid-run and resuming reproduces the exact trajectory of a
    continuous run."""
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import StochGPMP

    dtype = jnp.float64
    n_dof, traj_len, dt = 2, 8, 0.1
    start = jnp.zeros(4, dtype=dtype)
    goals = jnp.ones((2, 4), dtype=dtype)
    cost = CostComposite.create(
        n_dof,
        traj_len,
        [
            CostGP.create(n_dof, traj_len, start, dt, {"sigma_start": 0.01, "sigma_gp": 1.0}, dtype=dtype),
            CostGoalPrior.create(n_dof, traj_len, goals, sigma_goal_prior=0.01, dtype=dtype),
        ],
    )
    kwargs = dict(
        num_particles_per_goal=2, num_samples=8, traj_len=traj_len, dt=dt,
        n_dof=n_dof, opt_iters=1, start_state=start, multi_goal_states=goals,
        cost=cost, sigma_start_init=0.01, sigma_goal_init=0.01, sigma_gp_init=2.0,
        sigma_start_sample=0.01, sigma_goal_sample=0.01, sigma_gp_sample=0.5,
        seed=3, dtype=dtype,
    )
    p1 = StochGPMP(**kwargs)
    p1.optimize(opt_iters=3)
    path = str(tmp_path / "mid.npz")
    save_planner_state(path, p1.state)
    p1.optimize(opt_iters=4)
    final_continuous = np.asarray(p1.particle_means)

    p2 = StochGPMP(**kwargs)
    p2.state = load_planner_state(path, p2.state)
    p2.optimize(opt_iters=4)
    np.testing.assert_array_equal(np.asarray(p2.particle_means), final_continuous)
