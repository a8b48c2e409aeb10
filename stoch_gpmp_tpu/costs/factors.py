"""Probabilistic factor evaluators as pure functions.

Capability parity with the reference factor classes
(``stoch_gpmp/costs/factors/gp_factor.py``, ``unary_factor.py``,
``field_factor.py``), re-expressed as stateless batched functions. Sign
conventions follow the reference exactly:

- unary error is ``mean - x`` (``unary_factor.py:23``),
- GP error is ``x_{t+1} - Phi x_t`` (``gp_factor.py:54-58``),
- Gauss-Newton matrices use ``A = -dE/dx`` (so unary rows carry ``+I`` and GP
  rows carry ``(+Phi, -I)``, matching ``gp_factor.py:31-34``).
"""

from __future__ import annotations

import jax.numpy as jnp


def gp_error(trajs: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity transition errors ``e_t = x_{t+1} - Phi x_t``.

    ``trajs``: ``[..., T, d]`` -> ``[..., T-1, d]``.
    """
    pred = jnp.einsum("ij,...tj->...ti", phi, trajs[..., :-1, :])
    return trajs[..., 1:, :] - pred


def unary_error(x: jnp.ndarray, mean: jnp.ndarray) -> jnp.ndarray:
    """Anchor error ``mean - x`` (broadcasting over leading axes)."""
    return mean - x


def quadratic_cost(err: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """``e^T W e`` over the last axis: ``[..., d] -> [...]``."""
    return jnp.einsum("...i,ij,...j->...", err, weight, err)


def gp_quadratic_cost(
    trajs: jnp.ndarray, phi: jnp.ndarray, q_inv: jnp.ndarray
) -> jnp.ndarray:
    """Summed GP smoothness cost ``sum_t e_t^T Q^{-1} e_t`` -> ``[...]``.

    Matches reference ``CostGP.eval`` GP term
    (``stoch_gpmp/costs/cost_functions.py:137-142``).
    """
    err = gp_error(trajs, phi)
    return jnp.sum(quadratic_cost(err, q_inv), axis=-1)
