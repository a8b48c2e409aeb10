"""Constant-velocity (white-noise-on-acceleration) GP lift matrices.

Closed-form state-transition and inverse one-step covariance for the
LTV-SDE trajectory prior of GPMP2 (Mukadam et al., IJRR 2018).

Parity notes (reference: anindex/stoch_gpmp):
- transition ``Phi = [[I, dt*I], [0, I]]`` matches
  ``stoch_gpmp/costs/factors/gp_factor.py:36-42``.
- inverse one-step covariance blocks ``12/dt^3 Qc^-1, -6/dt^2 Qc^-1,
  4/dt Qc^-1`` match ``stoch_gpmp/costs/factors/gp_factor.py:44-52``.
- unary anchor weight ``K = I / sigma^2`` matches
  ``stoch_gpmp/costs/factors/unary_factor.py:19``.

Everything here is a pure function of static shapes returning small dense
matrices; they are assembled once at planner construction and become XLA
constants inside the jitted planner loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def phi_matrix(dof: int, dt: float, dtype=jnp.float32) -> jnp.ndarray:
    """State transition over one step: ``[[I, dt*I], [0, I]]``.

    Shape: ``[2*dof, 2*dof]`` ordered (position, velocity).
    """
    eye = jnp.eye(dof, dtype=dtype)
    zero = jnp.zeros((dof, dof), dtype=dtype)
    top = jnp.concatenate([eye, dt * eye], axis=1)
    bot = jnp.concatenate([zero, eye], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def qc_inv_matrix(dof: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse power-spectral-density of the white-noise acceleration: ``I / sigma^2``."""
    return jnp.eye(dof, dtype=dtype) / (sigma ** 2)


def q_inv_block(
    dof: int,
    dt: float,
    sigma: float | None = None,
    qc_inv: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Closed-form inverse one-step covariance ``Q^{-1}`` of the CV-GP factor.

    ``Q^{-1} = [[12/dt^3 Qc^-1, -6/dt^2 Qc^-1], [-6/dt^2 Qc^-1, 4/dt Qc^-1]]``

    Shape: ``[2*dof, 2*dof]``.
    """
    if qc_inv is None:
        if sigma is None:
            raise ValueError("one of sigma / qc_inv is required")
        qc_inv = qc_inv_matrix(dof, sigma, dtype=dtype)
    qc_inv = jnp.asarray(qc_inv, dtype=dtype)
    m1 = 12.0 * (dt ** -3.0) * qc_inv
    m2 = -6.0 * (dt ** -2.0) * qc_inv
    m3 = 4.0 * (dt ** -1.0) * qc_inv
    top = jnp.concatenate([m1, m2], axis=-1)
    bot = jnp.concatenate([m2, m3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def unary_weight(dim: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Isotropic Gaussian anchor weight ``K = I / sigma^2``. Shape ``[dim, dim]``."""
    return jnp.eye(dim, dtype=dtype) / (sigma ** 2)
