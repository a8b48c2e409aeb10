"""Dense float64 numpy oracles replicating the reference implementation's math.

These re-derive (in numpy, from the published GPMP2 closed forms) exactly what
the reference assembles with torch:
- the lifted-system matrix ``A`` (block lower-bidiagonal + optional goal row,
  ``stoch_gpmp/costs/factors/mp_priors_multi.py:179-190``),
- the block-diagonal weight ``Q^{-1}`` (``:192-196``),
- the dense precision ``Sigma^{-1} = A^T Q^{-1} A`` (``:198``).

Used to validate the structured block-tridiagonal path against the dense math.
"""

import numpy as np


def phi_np(dof: int, dt: float) -> np.ndarray:
    d = 2 * dof
    phi = np.eye(d)
    phi[:dof, dof:] = dt * np.eye(dof)
    return phi


def q_inv_np(dof: int, dt: float, sigma: float) -> np.ndarray:
    qc_inv = np.eye(dof) / sigma**2
    m1 = 12.0 * dt**-3 * qc_inv
    m2 = -6.0 * dt**-2 * qc_inv
    m3 = 4.0 * dt**-1 * qc_inv
    return np.block([[m1, m2], [m2, m3]])


def dense_precision_np(
    dof: int,
    traj_len: int,
    dt: float,
    sigma_start: float,
    sigma_gp: float,
    sigma_goal: float | None = None,
) -> np.ndarray:
    """Dense ``Sigma^{-1}`` exactly as the reference assembles it."""
    d = 2 * dof
    m = d * traj_len
    num_steps = traj_len - 1
    phi = phi_np(dof, dt)

    a = np.eye(m)
    for t in range(num_steps):
        a[(t + 1) * d : (t + 2) * d, t * d : (t + 1) * d] += -phi

    goal_directed = sigma_goal is not None
    if goal_directed:
        goal_row = np.zeros((d, m))
        goal_row[:, -d:] = np.eye(d)
        a = np.concatenate([a, goal_row], axis=0)

    blocks = [np.eye(d) / sigma_start**2]
    blocks += [q_inv_np(dof, dt, sigma_gp)] * num_steps
    if goal_directed:
        blocks.append(np.eye(d) / sigma_goal**2)
    q = np.zeros((a.shape[0], a.shape[0]))
    off = 0
    for b in blocks:
        q[off : off + d, off : off + d] = b
        off += d

    return a.T @ q @ a
