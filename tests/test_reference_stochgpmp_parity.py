"""Deterministic StochGPMP update-rule parity: with IDENTICAL injected
samples, the cost evaluation (incl. the importance cross-term) and the
softmax mean update must match the reference exactly (the only RNG use is
drawing the samples, which we bypass)."""

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


def test_update_rule_matches_reference_on_same_samples():
    n_dof, traj_len, dt = 2, 8, 0.05
    d = 2 * n_dof
    ppg, num_samples = 2, 4
    temperature, step_size = 1.3, 0.4
    rng = np.random.default_rng(0)
    start = np.zeros(d)
    goals = np.asarray([[2.0, 1.0, 0, 0], [-1.0, 2.0, 0, 0]])
    num_particles = 2 * ppg
    init_means = rng.standard_normal((2, ppg, traj_len, d))
    samples = init_means.reshape(num_particles, 1, traj_len, d) + 0.1 * rng.standard_normal(
        (num_particles, num_samples, traj_len, d)
    )
    cost_sigmas = {"sigma_start": 0.02, "sigma_gp": 0.5}
    sigma_goal_prior = 0.05
    planner_sigmas = dict(
        sigma_start_init=0.01, sigma_goal_init=0.01, sigma_gp_init=1.0,
        sigma_start_sample=0.02, sigma_goal_sample=0.03, sigma_gp_sample=0.7,
    )

    # --- reference: inject samples, evaluate costs + update ---
    t_start = torch.from_numpy(start)
    t_goals = torch.from_numpy(goals)
    ref_cost = RefComposite(
        n_dof, traj_len,
        [
            RefCostGP(n_dof, traj_len, t_start, dt, cost_sigmas, TA),
            RefGoalPrior(n_dof, traj_len, multi_goal_states=t_goals,
                         num_particles_per_goal=ppg, num_samples=num_samples,
                         sigma_goal_prior=sigma_goal_prior, tensor_args=TA),
        ],
        tensor_args=TA,
    )
    ref = RefStochGPMP(
        num_particles_per_goal=ppg, num_samples=num_samples, traj_len=traj_len,
        opt_iters=1, dt=dt, n_dof=n_dof, step_size=step_size,
        temperature=temperature, start_state=t_start, multi_goal_states=t_goals,
        initial_particle_means=torch.from_numpy(init_means.copy()),
        cost=ref_cost, seed=0, tensor_args=TA, **planner_sigmas,
    )
    ref.state_samples = torch.from_numpy(samples.copy())
    ref_costs = ref._get_costs()
    ref_grad = ref._update_distribution(ref_costs, ref.state_samples)
    ref_means = ref.particle_means.detach().numpy().copy()

    # --- ours: same injected samples through the same update math ---
    from stoch_gpmp_tpu.costs import CostComposite, CostGP, CostGoalPrior
    from stoch_gpmp_tpu.planners import StochGPMP

    cost = CostComposite.create(
        n_dof, traj_len,
        [
            CostGP.create(n_dof, traj_len, jnp.asarray(start), dt, cost_sigmas,
                          dtype=jnp.float64),
            CostGoalPrior.create(n_dof, traj_len, jnp.asarray(goals),
                                 sigma_goal_prior, dtype=jnp.float64),
        ],
    )
    ours = StochGPMP(
        num_particles_per_goal=ppg, num_samples=num_samples, traj_len=traj_len,
        opt_iters=1, dt=dt, n_dof=n_dof, step_size=step_size,
        temperature=temperature, start_state=jnp.asarray(start),
        multi_goal_states=jnp.asarray(goals),
        initial_particle_means=jnp.asarray(
            init_means.reshape(num_particles, traj_len, d)
        ),
        cost=cost, dtype=jnp.float64, **planner_sigmas,
    )
    x = jnp.asarray(samples)
    flat = x.reshape(num_particles, num_samples, -1)
    means_flat = ours.state.particle_means.reshape(num_particles, -1)
    costs = cost.eval(x.reshape(num_particles * num_samples, traj_len, d)).reshape(
        num_particles, num_samples
    )
    prec_u = means_flat @ ours.sampler.precision_dense
    costs = costs + temperature * jnp.einsum("psm,pm->ps", flat, prec_u)
    np.testing.assert_allclose(np.asarray(costs), ref_costs.numpy(), rtol=1e-9)

    import jax

    weights = jax.nn.softmax(-costs / temperature, axis=1)
    grad = jnp.einsum("ps,psm->pm", weights, flat - means_flat[:, None])
    new_means = means_flat + step_size * grad
    np.testing.assert_allclose(
        np.asarray(grad).reshape(num_particles, traj_len, d),
        ref_grad.numpy(), rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(new_means).reshape(num_particles, traj_len, d),
        ref_means, rtol=1e-9, atol=1e-12,
    )
