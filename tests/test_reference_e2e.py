"""Behavioral parity: run the actual PyTorch reference planner and ours on the
same planar problem and compare outcomes (RNGs differ, so parity is
behavioral — goal-reaching and cost scale — not bitwise)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from stoch_gpmp.costs.cost_functions import (
        CostComposite as RefComposite,
        CostGP as RefCostGP,
        CostGoalPrior as RefGoalPrior,
    )
    from stoch_gpmp.planner import StochGPMP as RefStochGPMP

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")

TA = {"device": torch.device("cpu"), "dtype": torch.float64}

N_DOF = 2
TRAJ_LEN = 24
DT = 0.02
NUM_SAMPLES = 48
PPG = 3
ITERS = 120
START = np.asarray([-9.0, -9.0, 0.0, 0.0])
GOALS = np.asarray([[9.0, 6.0, 0.0, 0.0], [-3.0, 9.0, 0.0, 0.0]])
SIGMAS = dict(
    sigma_start_init=1e-3, sigma_goal_init=1e-3, sigma_gp_init=20.0,
    sigma_start_sample=1e-3, sigma_goal_sample=1e-3, sigma_gp_sample=3.0,
)
COST_SIGMAS = {"sigma_start": 0.001, "sigma_gp": 0.1}
SIGMA_GOAL_PRIOR = 0.001


def _run_reference(seed=0):
    start = torch.from_numpy(START)
    goals = torch.from_numpy(GOALS)
    cost_prior = RefCostGP(N_DOF, TRAJ_LEN, start, DT, COST_SIGMAS, TA)
    cost_goal = RefGoalPrior(
        N_DOF, TRAJ_LEN, multi_goal_states=goals,
        num_particles_per_goal=PPG, num_samples=NUM_SAMPLES,
        sigma_goal_prior=SIGMA_GOAL_PRIOR, tensor_args=TA,
    )
    cost = RefComposite(N_DOF, TRAJ_LEN, [cost_prior, cost_goal], tensor_args=TA)
    planner = RefStochGPMP(
        num_particles_per_goal=PPG,
        num_samples=NUM_SAMPLES,
        traj_len=TRAJ_LEN,
        opt_iters=1,
        dt=DT,
        n_dof=N_DOF,
        step_size=0.5,
        temperature=1.0,
        start_state=start,
        multi_goal_states=goals,
        cost=cost,
        seed=seed,
        tensor_args=TA,
        **SIGMAS,
    )
    for _ in range(ITERS):
        planner.optimize()
    means = planner.particle_means.reshape(2, PPG, TRAJ_LEN, 4).numpy()
    return means


def _run_ours(seed=0):
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import StochGPMP

    dtype = jnp.float64
    start = jnp.asarray(START, dtype=dtype)
    goals = jnp.asarray(GOALS, dtype=dtype)
    cost = CostComposite.create(
        N_DOF,
        TRAJ_LEN,
        [
            CostGP.create(N_DOF, TRAJ_LEN, start, DT, COST_SIGMAS, dtype=dtype),
            CostGoalPrior.create(
                N_DOF, TRAJ_LEN, goals, sigma_goal_prior=SIGMA_GOAL_PRIOR, dtype=dtype
            ),
        ],
    )
    planner = StochGPMP(
        num_particles_per_goal=PPG,
        num_samples=NUM_SAMPLES,
        traj_len=TRAJ_LEN,
        opt_iters=1,
        dt=DT,
        n_dof=N_DOF,
        step_size=0.5,
        temperature=1.0,
        start_state=start,
        multi_goal_states=goals,
        cost=cost,
        seed=seed,
        dtype=dtype,
        **SIGMAS,
    )
    planner.optimize(opt_iters=ITERS)
    return np.asarray(planner.particle_means).reshape(2, PPG, TRAJ_LEN, 4)


def _metrics(means):
    """(mean final-state goal distance, mean start distance) per goal batch."""
    end_err = np.linalg.norm(means[:, :, -1, :2] - GOALS[:, None, :2], axis=-1)
    start_err = np.linalg.norm(means[:, :, 0, :2] - START[:2], axis=-1)
    return end_err, start_err


def test_behavioral_parity_planar():
    ref_means = _run_reference(seed=0)
    our_means = _run_ours(seed=0)
    ref_end, ref_start = _metrics(ref_means)
    our_end, our_start = _metrics(our_means)
    # both planners must anchor starts and reach their goals comparably
    assert our_end.max() < max(2 * ref_end.max(), 0.5), (our_end, ref_end)
    assert our_start.max() < max(2 * ref_start.max(), 0.2), (our_start, ref_start)
    # trajectory scale comparable: mean absolute velocity within 2x
    ref_v = np.abs(ref_means[..., 2:]).mean()
    our_v = np.abs(our_means[..., 2:]).mean()
    assert 0.5 < our_v / ref_v < 2.0, (our_v, ref_v)
