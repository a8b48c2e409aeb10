"""GP core: lift matrices, block-tridiagonal ops, structured Cholesky, prior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stoch_gpmp_tpu.gp import (
    BlockTridiag,
    build_precision,
    const_vel_means,
    make_gp_prior,
    phi_matrix,
    q_inv_block,
    unary_weight,
)
from tests.oracles import dense_precision_np, phi_np, q_inv_np

# Sigma ranges from the reference examples:
# planar (examples/planar_environment.py:88-93) and panda
# (examples/panda_environment.py:113-118).
SIGMA_CASES = [
    # (dof, traj_len, dt, sigma_start, sigma_gp, sigma_goal)
    (2, 64, 0.02, 1e-3, 3.0, 1e-3),  # planar sampling sigmas
    (2, 64, 0.02, 1e-3, 20.0, 1e-3),  # planar init sigmas
    (7, 64, 0.05, 1e-3, 0.1, 0.07),  # panda sampling sigmas
    (7, 64, 0.05, 1e-4, 0.8, 0.1),  # panda init sigmas
    (2, 16, 0.1, 0.01, 1.0, None),  # goal-free
]


def test_phi_matches_oracle():
    phi = phi_matrix(3, 0.05, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(phi), phi_np(3, 0.05))


def test_q_inv_matches_oracle():
    q = q_inv_block(3, 0.05, sigma=0.7, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(q), q_inv_np(3, 0.05, 0.7), rtol=1e-12)


@pytest.mark.parametrize("case", SIGMA_CASES)
def test_precision_blocks_match_dense_oracle(case):
    dof, traj_len, dt, s_start, s_gp, s_goal = case
    d = 2 * dof
    k_s = unary_weight(d, s_start, dtype=jnp.float64)
    q = q_inv_block(dof, dt, sigma=s_gp, dtype=jnp.float64)
    k_g = None if s_goal is None else unary_weight(d, s_goal, dtype=jnp.float64)
    bt = build_precision(dof, traj_len, dt, k_s, q, k_g_inv=k_g, dtype=jnp.float64)
    dense = np.asarray(bt.to_dense())
    oracle = dense_precision_np(dof, traj_len, dt, s_start, s_gp, s_goal)
    np.testing.assert_allclose(dense, oracle, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("case", SIGMA_CASES)
def test_structured_cholesky_matches_dense(case):
    dof, traj_len, dt, s_start, s_gp, s_goal = case
    d = 2 * dof
    k_s = unary_weight(d, s_start, dtype=jnp.float64)
    q = q_inv_block(dof, dt, sigma=s_gp, dtype=jnp.float64)
    k_g = None if s_goal is None else unary_weight(d, s_goal, dtype=jnp.float64)
    bt = build_precision(dof, traj_len, dt, k_s, q, k_g_inv=k_g, dtype=jnp.float64)
    chol = bt.cholesky()
    l_dense = np.asarray(chol.to_dense())
    oracle_l = np.linalg.cholesky(
        dense_precision_np(dof, traj_len, dt, s_start, s_gp, s_goal)
    )
    np.testing.assert_allclose(l_dense, oracle_l, rtol=1e-7, atol=1e-7)


def test_cholesky_survives_float32_at_reference_sigmas():
    """The headline numerical claim: the structured factorization stays PD in
    float32 at the sigma ratios where the reference needs float64
    (reference README.md:33-35)."""
    for case in SIGMA_CASES:
        dof, traj_len, dt, s_start, s_gp, s_goal = case
        d = 2 * dof
        k_s = unary_weight(d, s_start, dtype=jnp.float32)
        q = q_inv_block(dof, dt, sigma=s_gp, dtype=jnp.float32)
        k_g = None if s_goal is None else unary_weight(d, s_goal, dtype=jnp.float32)
        bt = build_precision(dof, traj_len, dt, k_s, q, k_g_inv=k_g, dtype=jnp.float32)
        chol = bt.cholesky()
        assert bool(jnp.all(jnp.isfinite(chol.diag))), f"NaN in f32 Cholesky for {case}"
        assert bool(jnp.all(jnp.isfinite(chol.lower)))
        diags = jnp.diagonal(chol.diag, axis1=-2, axis2=-1)
        assert bool(jnp.all(diags > 0))


def test_solve_and_matvec_roundtrip():
    rng = np.random.default_rng(0)
    dof, traj_len, dt = 2, 12, 0.05
    d = 2 * dof
    bt = build_precision(
        dof,
        traj_len,
        dt,
        unary_weight(d, 0.01, dtype=jnp.float64),
        q_inv_block(dof, dt, sigma=0.5, dtype=jnp.float64),
        k_g_inv=unary_weight(d, 0.02, dtype=jnp.float64),
        dtype=jnp.float64,
    )
    x = jnp.asarray(rng.standard_normal((3, 5, traj_len, d)))
    # matvec vs dense
    dense = np.asarray(bt.to_dense())
    flat = np.asarray(x).reshape(15, -1)
    np.testing.assert_allclose(
        np.asarray(bt.matvec(x)).reshape(15, -1), flat @ dense.T, rtol=1e-9, atol=1e-9
    )
    # solve roundtrip
    chol = bt.cholesky()
    y = chol.solve(bt.matvec(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-7, atol=1e-8)
    # L / L^T solves vs dense triangular solves
    l_dense = np.asarray(chol.to_dense())
    b = np.asarray(x).reshape(15, traj_len, d)
    got = np.asarray(chol.solve_L(jnp.asarray(b))).reshape(15, -1)
    want = np.linalg.solve(l_dense, b.reshape(15, -1).T).T
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)
    got_t = np.asarray(chol.solve_LT(jnp.asarray(b))).reshape(15, -1)
    want_t = np.linalg.solve(l_dense.T, b.reshape(15, -1).T).T
    np.testing.assert_allclose(got_t, want_t, rtol=1e-8, atol=1e-9)


def test_dense_inv_transpose():
    dof, traj_len, dt = 1, 8, 0.1
    d = 2 * dof
    bt = build_precision(
        dof,
        traj_len,
        dt,
        unary_weight(d, 0.1, dtype=jnp.float64),
        q_inv_block(dof, dt, sigma=1.0, dtype=jnp.float64),
        dtype=jnp.float64,
    )
    chol = bt.cholesky()
    w = np.asarray(chol.dense_inv_transpose())
    l_dense = np.asarray(chol.to_dense())
    np.testing.assert_allclose(w, np.linalg.inv(l_dense).T, rtol=1e-8, atol=1e-10)
    # W W^T must equal the covariance
    np.testing.assert_allclose(
        w @ w.T, np.linalg.inv(np.asarray(bt.to_dense())), rtol=1e-6, atol=1e-9
    )


def test_const_vel_means():
    start = jnp.array([0.0, 1.0, 0.0, 0.0], dtype=jnp.float64)
    goals = jnp.array([[4.0, 1.0, 0.0, 0.0], [0.0, 9.0, 0.0, 0.0]], dtype=jnp.float64)
    num_steps, dt = 4, 0.5
    means = const_vel_means(start, goals, num_steps, dt, dof=2)
    assert means.shape == (2, 5, 4)
    # endpoint positions
    np.testing.assert_allclose(np.asarray(means[0, 0, :2]), [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(means[0, -1, :2]), [4.0, 1.0])
    np.testing.assert_allclose(np.asarray(means[1, -1, :2]), [0.0, 9.0])
    # constant velocity = (goal - start) / (num_steps * dt)
    np.testing.assert_allclose(np.asarray(means[0, :, 2:]), np.tile([2.0, 0.0], (5, 1)))
    # linear interpolation in position
    np.testing.assert_allclose(np.asarray(means[0, 2, :2]), [2.0, 1.0])


def test_prior_sample_moments_match_dense_mvn():
    """Distributional parity: sample mean/covariance converge to the dense
    N(mu, Sigma) the reference's MultivariateNormal would produce."""
    dof, traj_len, dt = 1, 6, 0.1
    d = 2 * dof
    start = jnp.array([0.5, 0.0], dtype=jnp.float64)
    goals = jnp.array([[1.5, 0.0]], dtype=jnp.float64)
    prior = make_gp_prior(
        dof, traj_len, dt, start, 0.1, 1.0, sigma_goal=0.2, goal_states=goals,
        dtype=jnp.float64,
    )
    n = 200_000
    samples = prior.sample(jax.random.PRNGKey(0), n)  # [1, n, T, d]
    flat = np.asarray(samples).reshape(n, traj_len * d)
    mu = np.asarray(prior.means).reshape(-1)
    cov = np.linalg.inv(dense_precision_np(dof, traj_len, dt, 0.1, 1.0, 0.2))
    np.testing.assert_allclose(flat.mean(0), mu, atol=5e-3 * np.sqrt(cov.max()))
    emp_cov = np.cov(flat.T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.02 * cov.max())


def test_prior_sample_methods_agree():
    dof, traj_len, dt = 2, 10, 0.1
    start = jnp.zeros(4, dtype=jnp.float64)
    goals = jnp.ones((3, 4), dtype=jnp.float64)
    prior = make_gp_prior(
        dof, traj_len, dt, start, 0.05, 0.8, sigma_goal=0.1, goal_states=goals,
        dtype=jnp.float64,
    )
    key = jax.random.PRNGKey(42)
    s_dense = prior.sample(key, 7, method="dense")
    s_scan = prior.sample(key, 7, method="scan")
    assert s_dense.shape == (3, 7, traj_len, 4)
    np.testing.assert_allclose(np.asarray(s_dense), np.asarray(s_scan), rtol=1e-8, atol=1e-10)


def test_log_prob_matches_dense_gaussian():
    dof, traj_len, dt = 1, 5, 0.2
    d = 2 * dof
    start = jnp.zeros(2, dtype=jnp.float64)
    prior = make_gp_prior(dof, traj_len, dt, start, 0.3, 1.2, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 1, traj_len, d)))
    lp = np.asarray(prior.log_prob(x))
    prec = dense_precision_np(dof, traj_len, dt, 0.3, 1.2, None)
    cov = np.linalg.inv(prec)
    mu = np.asarray(prior.means).reshape(-1)
    from scipy.stats import multivariate_normal

    want = multivariate_normal(mean=mu, cov=cov).logpdf(
        np.asarray(x).reshape(4, -1)
    )
    np.testing.assert_allclose(lp.reshape(4), want, rtol=1e-8)


def test_precision_matvec_importance_term():
    """The importance cross-term V Sigma^{-1} U (reference planner.py:236)
    computed via structured matvec must match the dense product."""
    dof, traj_len, dt = 2, 8, 0.1
    d = 2 * dof
    start = jnp.zeros(d, dtype=jnp.float64)
    goals = jnp.ones((2, d), dtype=jnp.float64)
    prior = make_gp_prior(
        dof, traj_len, dt, start, 0.1, 1.0, sigma_goal=0.2, goal_states=goals,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(1)
    v = rng.standard_normal((2, 5, traj_len, d))  # [P, S, T, d]
    u = rng.standard_normal((2, traj_len, d))  # [P, T, d]
    got = np.asarray(
        jnp.sum(jnp.asarray(v) * prior.precision_matvec(jnp.asarray(u))[:, None], axis=(-2, -1))
    )
    dense = np.asarray(prior.precision.to_dense())
    want = np.einsum("psm,mn,pn->ps", v.reshape(2, 5, -1), dense, u.reshape(2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-9)


# --------------------------------------------------------------------------- #
# Parallel-in-time (associative-scan) triangular solves
# --------------------------------------------------------------------------- #


class TestParallelBidiagSolver:
    def _chol(self, dof, t, dtype=jnp.float64):
        from stoch_gpmp_tpu.gp.lift import q_inv_block, unary_weight
        from stoch_gpmp_tpu.gp.prior import build_precision

        d = 2 * dof
        prec = build_precision(
            dof, t, 0.02,
            unary_weight(d, 1e-3, dtype=dtype),
            q_inv_block(dof, 0.02, sigma=0.1, dtype=dtype),
            k_g_inv=unary_weight(d, 1e-3, dtype=dtype),
            dtype=dtype,
        )
        return prec.cholesky()

    @pytest.mark.parametrize("dof,t", [(2, 1), (2, 7), (2, 64), (7, 33)])
    def test_matches_sequential_solves(self, dof, t):
        from stoch_gpmp_tpu.gp.tridiag import ParallelBidiagSolver

        chol = self._chol(dof, t)
        ps = ParallelBidiagSolver.from_chol(chol)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.normal(size=(3, 5, t, 2 * dof)))
        for name in ("solve_L", "solve_LT", "solve"):
            ref = np.asarray(getattr(chol, name)(b))
            par = np.asarray(getattr(ps, name)(b))
            np.testing.assert_allclose(par, ref, rtol=1e-10, atol=1e-12)

    def test_long_horizon_prior_auto_uses_pscan(self):
        """make_gp_prior beyond M=2048 builds the parallel solver and 'auto'
        sampling routes through it; draws match the sequential scan draws
        bitwise-closely (same eps, reassociated sums)."""
        from stoch_gpmp_tpu.gp.prior import make_gp_prior

        t = 600  # M = 2400 > 2048 -> long-horizon mode
        prior = make_gp_prior(
            2, t, 0.02, jnp.zeros(4), 1e-3, 0.5, sigma_goal=1e-3,
            goal_states=jnp.asarray([[1.0, 1.0, 0.0, 0.0]]),
            dtype=jnp.float32,
        )
        assert prior.weight_t is None and prior.psolver is not None
        key = jax.random.PRNGKey(0)
        auto = np.asarray(prior.sample(key, 4))
        pscan = np.asarray(prior.sample(key, 4, method="pscan"))
        scan = np.asarray(prior.sample(key, 4, method="scan"))
        np.testing.assert_array_equal(auto, pscan)
        scale = np.abs(scan).max()
        np.testing.assert_allclose(pscan, scan, atol=2e-4 * scale)

    def test_matvec_planes_matches_matvec(self):
        from stoch_gpmp_tpu.gp.lift import q_inv_block, unary_weight
        from stoch_gpmp_tpu.gp.prior import build_precision

        prec = build_precision(
            2, 17, 0.02,
            unary_weight(4, 1e-3, dtype=jnp.float64),
            q_inv_block(2, 0.02, sigma=0.1, dtype=jnp.float64),
            k_g_inv=unary_weight(4, 1e-3, dtype=jnp.float64),
            dtype=jnp.float64,
        )
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 5, 17, 4)))
        ref = np.asarray(prec.matvec(x))
        planes = tuple(x[..., i] for i in range(4))
        out = prec.matvec_planes(planes)
        par = np.stack([np.asarray(o) for o in out], axis=-1)
        np.testing.assert_allclose(par, ref, rtol=1e-12, atol=1e-14)


def test_set_sigma_inv_rebuilds_factors():
    """GPPrior.set_sigma_inv (reference set_Sigma_invs,
    mp_priors_multi.py:124-128): swapping the precision rebuilds the
    sampling factor so draws match a prior built directly with the new
    sigmas."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stoch_gpmp_tpu.gp.prior import make_gp_prior

    start = jnp.zeros(4, jnp.float64)
    goals = jnp.asarray([[1.0, 2.0, 0, 0]], jnp.float64)
    a = make_gp_prior(2, 12, 0.05, start, 1e-3, 0.5, sigma_goal=1e-3,
                      goal_states=goals, dtype=jnp.float64)
    b = make_gp_prior(2, 12, 0.05, start, 1e-2, 0.9, sigma_goal=1e-2,
                      goal_states=goals, dtype=jnp.float64)
    swapped = a.set_sigma_inv(b.precision)
    np.testing.assert_allclose(
        np.asarray(swapped.weight_t), np.asarray(b.weight_t), rtol=1e-9
    )
    s1 = swapped.sample(jax.random.PRNGKey(0), 3)
    s2 = b.sample(jax.random.PRNGKey(0), 3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-9)
