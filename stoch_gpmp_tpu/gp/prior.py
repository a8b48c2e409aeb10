"""Multi-modal constant-velocity GP trajectory prior in structured form.

Capability parity with the reference ``MultiMPPrior``
(``stoch_gpmp/costs/factors/mp_priors_multi.py:14-210``), redesigned TPU-first:

- The precision ``Sigma^{-1} = A^T Q^{-1} A`` (reference ``:170-202``) is built
  directly in block-tridiagonal form (never dense):
    diag[0]    = K_s^{-1} + Phi^T Q^{-1} Phi
    diag[t]    = Q^{-1}   + Phi^T Q^{-1} Phi      (1 <= t <= T-2)
    diag[T-1]  = Q^{-1} (+ K_g^{-1} if goal-directed)
    lower[t]   = -Q^{-1} Phi                       (block (t+1, t))
- One structured Cholesky at construction (O(T d^3) instead of O(T^3 d^3)),
  stable in float32.
- Sampling is ``x = mu + eps @ W^T`` with ``W = L^{-T}`` materialized once —
  a single MXU matmul per draw batch, replacing the reference's per-iteration
  dense MultivariateNormal rebuild (``mp_priors_multi.py:106-110,120-123``).
- All modes share the precision (same assumption as reference ``:97``); means
  differ per mode.

Sample shape convention matches the reference (``mp_priors_multi.py:204-207``):
``sample(key, n) -> [num_modes, n, traj_len, state_dim]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.gp.lift import phi_matrix, q_inv_block, unary_weight
from stoch_gpmp_tpu.gp.tridiag import (
    BlockBidiagChol,
    BlockTridiag,
    ParallelBidiagSolver,
)


def build_precision(
    dof: int,
    traj_len: int,
    dt: float,
    k_s_inv: jnp.ndarray,
    q_inv: jnp.ndarray,
    k_g_inv: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> BlockTridiag:
    """Block-tridiagonal ``Sigma^{-1}`` of the lifted constant-velocity system.

    Equivalent to the dense ``A^T Q^{-1} A`` of the reference
    (``mp_priors_multi.py:170-202``) — verified against it in tests — but with
    O(T d^2) storage.
    """
    d = 2 * dof
    phi = phi_matrix(dof, dt, dtype=dtype)
    q_inv = jnp.asarray(q_inv, dtype=dtype)
    k_s_inv = jnp.asarray(k_s_inv, dtype=dtype)
    pqp = phi.T @ q_inv @ phi

    diag = jnp.tile(q_inv + pqp, (traj_len, 1, 1))
    diag = diag.at[0].set(k_s_inv + pqp)
    last = q_inv if k_g_inv is None else q_inv + jnp.asarray(k_g_inv, dtype=dtype)
    diag = diag.at[traj_len - 1].set(last)
    lower = jnp.tile(-(q_inv @ phi), (traj_len - 1, 1, 1))
    return BlockTridiag(diag=diag, lower=lower)


def const_vel_trajectory(
    start_state: jnp.ndarray,
    goal_state: jnp.ndarray,
    num_steps: int,
    dt: float,
    dof: int,
) -> jnp.ndarray:
    """Straight-line position interpolation with constant mean velocity.

    Matches reference ``MultiMPPrior.const_vel_trajectory``
    (``mp_priors_multi.py:130-144``): positions linearly interpolated over
    ``num_steps + 1`` states, velocity constant at
    ``(goal - start) / (num_steps * dt)``. Shape ``[num_steps+1, 2*dof]``.
    """
    dtype = start_state.dtype
    alpha = jnp.linspace(0.0, 1.0, num_steps + 1, dtype=dtype)[:, None]
    pos = start_state[:dof][None] * (1.0 - alpha) + goal_state[:dof][None] * alpha
    vel = jnp.tile(
        (goal_state[:dof] - start_state[:dof])[None] / (num_steps * dt),
        (num_steps + 1, 1),
    )
    return jnp.concatenate([pos, vel], axis=-1)


def const_vel_means(
    start_state: jnp.ndarray,
    goal_states: jnp.ndarray | None,
    num_steps: int,
    dt: float,
    dof: int,
) -> jnp.ndarray:
    """Per-mode straight-line means ``[num_modes, num_steps+1, 2*dof]``.

    Goal-free case repeats the start state (reference
    ``mp_priors_multi.py:168``).
    """
    if goal_states is None:
        return jnp.tile(start_state[None, None, :], (1, num_steps + 1, 1))
    return jax.vmap(
        lambda g: const_vel_trajectory(start_state, g, num_steps, dt, dof)
    )(goal_states)


@struct.dataclass
class GPPrior:
    """Batched Gaussians over trajectories with a shared structured precision.

    ``means``: ``[num_modes, T, d]``; ``precision``: BlockTridiag shared by all
    modes; ``chol``: its block Cholesky; ``weight_t``: dense ``W^T = L^{-1}``
    (``[M, M]``) used for the one-matmul sampling path.
    """

    means: jnp.ndarray
    precision: BlockTridiag
    chol: BlockBidiagChol
    weight_t: jnp.ndarray | None  # dense L^{-1}, or None in long-horizon mode
    # parallel-in-time solver (built in long-horizon mode): associative-scan
    # triangular solves, O(log T) depth — the sequence-parallel sampling path
    psolver: ParallelBidiagSolver | None = None
    # per-dof factored (plane-ordered) form — the Gaussian factorizes exactly
    # across dofs under scalar sigmas (gp/dof_factored.py); built whenever the
    # per-dof [2T, 2T] factor is small enough to materialize
    dof: object | None = None

    @property
    def num_modes(self) -> int:
        return self.means.shape[0]

    @property
    def traj_len(self) -> int:
        return self.means.shape[-2]

    @property
    def state_dim(self) -> int:
        return self.means.shape[-1]

    def set_means(self, means: jnp.ndarray) -> "GPPrior":
        """Functional analogue of reference ``set_mean``
        (``mp_priors_multi.py:120-123``) — O(1), no dense dist rebuild."""
        return self.replace(means=means.reshape(self.means.shape))

    def set_sigma_inv(self, precision: BlockTridiag) -> "GPPrior":
        """Functional analogue of reference ``set_Sigma_invs``
        (``mp_priors_multi.py:124-128``): swap the sampling precision and
        rebuild the derived factors (Cholesky, dense ``L^{-1}`` or the
        parallel-in-time solver — whichever form this prior was using).
        The per-dof factored form cannot be rebuilt from an arbitrary
        precision (it exists only under per-dof-decoupled weights), so it is
        dropped; rebuild via ``make_gp_prior`` to restore it."""
        chol = precision.cholesky()
        if self.weight_t is not None:
            return self.replace(
                precision=precision, chol=chol,
                weight_t=chol.dense_inv_transpose().T, psolver=None, dof=None,
            )
        return self.replace(
            precision=precision, chol=chol, weight_t=None,
            psolver=ParallelBidiagSolver.from_chol(chol), dof=None,
        )

    def sample(self, key: jax.Array, num_samples: int, method: str = "auto") -> jnp.ndarray:
        """Draw ``[num_modes, num_samples, T, d]`` samples.

        ``method='dense'``: one batched matmul against the materialized
        ``L^{-T}`` (MXU path; requires ``materialize_dense``).
        ``method='scan'``: structured backward substitution (sequential
        ``lax.scan``, O(T) depth).
        ``method='pscan'``: parallel-in-time associative-scan substitution
        (O(log T) depth; the long-horizon default).
        ``'auto'`` picks dense when available, else pscan.
        """
        t, d = self.traj_len, self.state_dim
        eps = jax.random.normal(
            key, (self.num_modes, num_samples, t, d), dtype=self.means.dtype
        )
        if method == "auto":
            if self.weight_t is not None:
                method = "dense"
            else:
                method = "pscan" if self.psolver is not None else "scan"
        if method == "dense":
            if self.weight_t is None:
                raise ValueError("dense sampling requires materialize_dense=True")
            flat = eps.reshape(self.num_modes, num_samples, t * d)
            corr = (flat @ self.weight_t).reshape(self.num_modes, num_samples, t, d)
        elif method == "scan":
            corr = self.chol.solve_LT(eps)
        elif method == "pscan":
            solver = (
                self.psolver if self.psolver is not None
                else ParallelBidiagSolver.from_chol(self.chol)
            )
            corr = solver.solve_LT(eps)
        else:
            raise ValueError(f"unknown sampling method: {method}")
        return self.means[:, None] + corr

    def precision_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply ``Sigma^{-1}`` to ``x [..., T, d]`` in O(T d^2)."""
        return self.precision.matvec(x)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Gaussian log-density of ``x [..., num_modes, T, d]`` under each mode.

        Parity with reference ``MultiMPPrior.log_prob``
        (``mp_priors_multi.py:209-210``).
        """
        t, d = self.traj_len, self.state_dim
        m = t * d
        diff = x - self.means
        quad = jnp.sum(diff * self.precision.matvec(diff), axis=(-2, -1))
        return 0.5 * (self.chol.logdet() - m * jnp.log(2.0 * jnp.pi) - quad)


def make_gp_prior(
    dof: int,
    traj_len: int,
    dt: float,
    start_state: jnp.ndarray,
    sigma_start: float,
    sigma_gp: float,
    sigma_goal: float | None = None,
    goal_states: jnp.ndarray | None = None,
    means: jnp.ndarray | None = None,
    dtype=jnp.float32,
    materialize_dense: bool | None = None,
) -> GPPrior:
    """Build a ready-to-sample GP prior from sigma hyper-parameters.

    Mirrors the construction flow of reference ``StochGPMP.get_prior_dist``
    (``stoch_gpmp/planner.py:157-179``): unary start/goal weights ``I/sigma^2``
    and the closed-form CV-GP ``Q^{-1}``, assembled into the (structured)
    precision, plus straight-line constant-velocity means when none given.

    ``materialize_dense``: whether to materialize ``L^{-T}`` as a dense
    ``[M, M]`` matrix for one-matmul MXU sampling. Defaults to auto: dense for
    ``M <= 2048`` (planner-scale horizons), structured-only beyond — the
    long-horizon regime where O(M^2) memory would dominate and the O(T d^2)
    scan sampler wins (the reference's dense MVN is O(T^3) there,
    ``mp_priors_multi.py:106-110``).
    """
    d = 2 * dof
    m = d * traj_len
    if materialize_dense is None:
        materialize_dense = m <= 2048
    k_s_inv = unary_weight(d, sigma_start, dtype=dtype)
    q_inv = q_inv_block(dof, dt, sigma=sigma_gp, dtype=dtype)
    k_g_inv = None
    if goal_states is not None:
        if sigma_goal is None:
            raise ValueError("sigma_goal required when goal_states given")
        k_g_inv = unary_weight(d, sigma_goal, dtype=dtype)

    precision = build_precision(
        dof, traj_len, dt, k_s_inv, q_inv, k_g_inv=k_g_inv, dtype=dtype
    )
    chol = precision.cholesky()
    psolver = None
    if materialize_dense:
        weight_t = chol.dense_inv_transpose().T  # [M, M] = L^{-1}
    else:
        weight_t = None
        psolver = ParallelBidiagSolver.from_chol(chol)

    # per-dof factored form (exact under the scalar sigmas of this API):
    # the [2T, 2T] shared block is cheap up to T~1024 and unlocks the
    # dof-factored fast paths (gp/dof_factored.py)
    dof_factor = None
    if 2 * traj_len <= 2048:
        from stoch_gpmp_tpu.gp.dof_factored import make_dof_factored_prior

        dof_factor = make_dof_factored_prior(
            traj_len, dt, sigma_start, sigma_gp,
            sigma_goal=sigma_goal if goal_states is not None else None,
            dtype=dtype,
        )

    if means is None:
        means = const_vel_means(
            jnp.asarray(start_state, dtype=dtype),
            None if goal_states is None else jnp.asarray(goal_states, dtype=dtype),
            traj_len - 1,
            dt,
            dof,
        )
    else:
        means = jnp.asarray(means, dtype=dtype).reshape(-1, traj_len, d)

    return GPPrior(
        means=means, precision=precision, chol=chol, weight_t=weight_t,
        psolver=psolver, dof=dof_factor,
    )
