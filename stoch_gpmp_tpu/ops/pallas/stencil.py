"""Shared in-kernel factor-graph (stencil) quadratic for the fused kernels.

The GP + start/goal-anchor quadratic must NEVER be evaluated as
``x A x - 2 b x + c`` on the MXU: at the reference's sigmas the precision
entries reach ~2e11 and the default bf16 passes corrupt the massively-
cancelling quadratic (measured on v5e; docs/PERFORMANCE.md "bf16-matmul
precision trap"). Inside a Mosaic kernel the residual form runs on lane
rolls: for the flat t-major row layout (lane ``t*2d + j`` = pos_j(t), lane
``t*2d + d + j`` = vel_j(t)), left-shifts by ``d``/``2d``/``3d`` lanes align
``vel(t)``, ``pos(t+1)``, ``vel(t+1)`` with ``pos(t)``, and masked local
quadratics give the exact energy — O(M) VPU work, no ``[M, M]`` constant in
VMEM.

Used by ``ops/pallas/fused_step.py`` (planar, d=2) and
``ops/pallas/panda_step.py`` (Panda, d=7); the dof-factored kernel
(``panda_step_dof.py``) uses the plane-layout variant inline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu


def quad_stencil_consts(dof_quad):
    """Python-constant stencil parameters baked into a kernel:
    ``(q_i2, k_s2, k_g2, dt)`` as float64 numpy / float."""
    return (
        np.asarray(dof_quad.q_i2, dtype=np.float64),
        np.asarray(dof_quad.k_s2, dtype=np.float64),
        np.asarray(dof_quad.k_g2, dtype=np.float64),
        float(dof_quad.dt),
    )


def anchor_rows_and_masks(dof_quad, num_particles: int, traj_len: int,
                          n_dof: int):
    """Per-particle anchor-value rows ``[P, M]`` (start values on the t=0
    block, the particle's goal values on the t=T-1 block, zeros elsewhere)
    and the ``[3, M]`` lane masks (gp pos-lanes t<T-1, start pos-lanes,
    goal pos-lanes) for :func:`flat_quad_cost`."""
    state_dim = 2 * n_dof
    m = traj_len * state_dim
    p = num_particles
    s_pd = np.asarray(dof_quad.s_pd, dtype=np.float32)  # [d, 2]
    g_pd = np.asarray(dof_quad.g_pd, dtype=np.float32)  # [G, d, 2]
    anchors = np.zeros((p, m), dtype=np.float32)
    anchors[:, :n_dof] = s_pd[:, 0]
    anchors[:, n_dof:state_dim] = s_pd[:, 1]
    gp_rep = np.repeat(g_pd, p // dof_quad.num_goals, axis=0)  # [P, d, 2]
    anchors[:, m - state_dim : m - n_dof] = gp_rep[..., 0]
    anchors[:, m - n_dof :] = gp_rep[..., 1]
    lanes = np.arange(m)
    is_pos = (lanes % state_dim) < n_dof
    masks = np.zeros((3, m), dtype=np.float32)
    masks[0] = (is_pos & (lanes < m - state_dim)).astype(np.float32)
    masks[1] = (is_pos & (lanes < state_dim)).astype(np.float32)
    masks[2] = (is_pos & (lanes >= m - state_dim)).astype(np.float32)
    return jnp.asarray(anchors), jnp.asarray(masks)


def flat_quad_cost(x, anch_rows, masks_ref, quad_stencil, n_dof: int):
    """Exact GP + anchor quadratic of flat t-major sample rows ``x [N, M]``
    via lane-roll stencils; returns ``[N, 1]``. ``anch_rows`` must already
    be sample-replicated ``[N, M]``; ``masks_ref`` is the ``[3, M]`` ref."""
    m = x.shape[-1]
    q_i2, k_s2, k_g2, dt = quad_stencil
    q11, q12, q22 = float(q_i2[0, 0]), float(q_i2[0, 1]), float(q_i2[1, 1])
    ks11, ks12, ks22 = float(k_s2[0, 0]), float(k_s2[0, 1]), float(k_s2[1, 1])
    kg11, kg12, kg22 = float(k_g2[0, 0]), float(k_g2[0, 1]), float(k_g2[1, 1])
    sd = 2 * n_dof
    # left-shift by k lanes == circular roll by m-k; wrapped lanes are masked
    xd = pltpu.roll(x, shift=m - n_dof, axis=1)  # vel(t) at pos lanes
    x1 = pltpu.roll(x, shift=m - sd, axis=1)  # pos(t+1)
    x1d = pltpu.roll(x, shift=m - sd - n_dof, axis=1)  # vel(t+1)
    rp = x + dt * xd - x1
    rv = xd - x1d
    cost = jnp.sum(
        (q11 * rp * rp + 2.0 * q12 * rp * rv + q22 * rv * rv)
        * masks_ref[0:1, :],
        axis=1, keepdims=True,
    )  # [N, 1]
    diff = x - anch_rows  # anchor residuals on their lanes (junk elsewhere)
    diffd = pltpu.roll(diff, shift=m - n_dof, axis=1)  # vel residual at pos lane
    es = (
        ks11 * diff * diff + 2.0 * ks12 * diff * diffd + ks22 * diffd * diffd
    ) * masks_ref[1:2, :]
    eg = (
        kg11 * diff * diff + 2.0 * kg12 * diff * diffd + kg22 * diffd * diffd
    ) * masks_ref[2:3, :]
    return cost + jnp.sum(es + eg, axis=1, keepdims=True)
