"""Damped-least-squares inverse kinematics in JAX.

Replaces the reference's only remaining PyBullet dependency on the planning
path: goal-configuration IK (``examples/panda_environment.py:61`` calls
``Panda.solveInverseKinematics`` wrapping bullet). Pure-JAX Gauss-Newton on
the 6D pose error with joint-limit clamping; jittable and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stoch_gpmp_tpu.kinematics.chain import KinematicChain


def pose_error(h: jnp.ndarray, target_h: jnp.ndarray) -> jnp.ndarray:
    """6D error (translation, SO(3) log-map rotation vector) between poses
    ``[..., 4, 4]``.

    The rotation error is the full log map ``theta * axis`` — the bare skew
    part ``sin(theta) * axis`` vanishes at 180-degree flips, which lets IK
    silently accept orientation-flipped solutions.
    """
    dt = target_h[..., :3, 3] - h[..., :3, 3]
    r_err = target_h[..., :3, :3] @ jnp.swapaxes(h[..., :3, :3], -1, -2)
    skew = 0.5 * jnp.stack(
        [
            r_err[..., 2, 1] - r_err[..., 1, 2],
            r_err[..., 0, 2] - r_err[..., 2, 0],
            r_err[..., 1, 0] - r_err[..., 0, 1],
        ],
        axis=-1,
    )  # = sin(theta) * axis
    tr = r_err[..., 0, 0] + r_err[..., 1, 1] + r_err[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    # log-map scaling theta/sin(theta); near theta=pi the skew direction
    # degrades but stays nonzero under the eps clamps, so GN keeps a usable
    # descent direction instead of a spurious fixed point.
    w = skew * (theta / sin)[..., None]
    return jnp.concatenate([dt, w], axis=-1)


def solve_ik(
    chain: KinematicChain,
    target_h: jnp.ndarray,
    q_init: jnp.ndarray,
    *,
    num_iters: int = 100,
    damping: float = 1e-2,
    step_size: float = 1.0,
    clamp_limits: bool = True,
) -> jnp.ndarray:
    """Solve ``fk(q) ~= target_h`` from ``q_init [n_dof]`` (or batched)."""

    def err_fn(q):
        return pose_error(chain.ee_pose(q), target_h)

    eye = jnp.eye(chain.n_dofs, dtype=q_init.dtype)

    def body(_, q):
        e = err_fn(q)
        j = jax.jacfwd(err_fn)(q)  # [6, n_dof] — J = de/dq
        jtj = j.T @ j + damping * eye
        # Gauss-Newton on 1/2 ||e||^2: step = -(J^T J + lambda I)^{-1} J^T e
        dq = -jnp.linalg.solve(jtj, j.T @ e)
        q = q + step_size * dq
        if clamp_limits:
            q = jnp.clip(q, chain.limits_lower, chain.limits_upper)
        return q

    return jax.lax.fori_loop(0, num_iters, body, q_init)


def solve_ik_multistart(
    chain: KinematicChain,
    target_h: jnp.ndarray,
    key: jax.Array,
    *,
    num_starts: int = 16,
    q_init: jnp.ndarray | None = None,
    num_iters: int = 100,
    damping: float = 1e-2,
    step_size: float = 1.0,
) -> jnp.ndarray:
    """Batched random-restart IK: vmapped Gauss-Newton from ``num_starts``
    uniformly-sampled configurations (plus ``q_init`` if given), returning the
    configuration with the lowest pose error. Robust to the local minima that
    trap single-start damped least squares on a 7-DOF arm."""
    lo = jnp.where(jnp.isfinite(chain.limits_lower), chain.limits_lower, -jnp.pi)
    hi = jnp.where(jnp.isfinite(chain.limits_upper), chain.limits_upper, jnp.pi)
    dtype = lo.dtype
    starts = lo + (hi - lo) * jax.random.uniform(
        key, (num_starts, chain.n_dofs), dtype=dtype
    )
    if q_init is not None:
        starts = jnp.concatenate([q_init[None].astype(dtype), starts], axis=0)

    solve = jax.vmap(
        lambda q0: solve_ik(
            chain, target_h, q0,
            num_iters=num_iters, damping=damping, step_size=step_size,
        )
    )
    qs = solve(starts)

    def true_err(q):
        # geodesic SE(3) distance (sees 180-degree flips, unlike the raw
        # skew-part error)
        from stoch_gpmp_tpu.kinematics.se3 import se3_distance

        return se3_distance(chain.ee_pose(q), target_h)

    errs = jax.vmap(true_err)(qs)
    if q_init is None:
        return qs[jnp.argmin(errs)]
    # Among near-best solutions, prefer the one closest to q_init in joint
    # space: a distant elbow-flipped optimum forces wide swings through the
    # workspace (observed: hand sweeping the floor). This also mirrors the
    # reference's bullet IK, which iterates FROM the current state and so
    # returns nearby solutions (objects.py:349-353).
    best = errs.min()
    ok = errs <= best + 0.05
    jdist = jnp.linalg.norm(qs - q_init[None].astype(qs.dtype), axis=-1)
    score = jnp.where(ok, jdist, jnp.inf)
    return qs[jnp.argmin(score)]
