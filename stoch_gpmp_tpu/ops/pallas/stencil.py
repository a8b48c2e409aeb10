"""Shared in-kernel factor-graph (stencil) quadratic for the fused kernels.

At the reference's Panda sigmas the GP precision entries reach ~2e11, and
evaluating ``x A x - 2 b x + c`` through the MXU's default bf16 passes
corrupts the massively-cancelling quadratic beyond use (measured on v5e;
docs/PERFORMANCE.md "bf16-matmul precision trap"). Inside a Mosaic kernel
the residual form runs on lane rolls: for the flat t-major row layout
(lane ``t*2d + j`` = pos_j(t), lane ``t*2d + d + j`` = vel_j(t)),
left-shifts by ``d``/``2d``/``3d`` lanes align ``vel(t)``, ``pos(t+1)``,
``vel(t+1)`` with ``pos(t)``, and masked local quadratics give the exact
energy — O(M) VPU work, no ``[M, M]`` constant in VMEM.

The stencil is not free: it runs on the VPU, which the fused kernels'
field stages already saturate, while the old matmul overlapped on the
otherwise-idle MXU (measured: forcing the stencil on the planar kernel
cost 15-18%). The factories therefore gate by CONDITIONING
(:func:`needs_stencil`): stencil where bf16 error would swamp the answer
(Panda, ~2e11 weights), matmul where weights are mild (planar, <= ~1e6).

Used by ``ops/pallas/fused_step.py`` (planar, d=2) and
``ops/pallas/panda_step.py`` (Panda, d=7); the dof-factored kernel
(``panda_step_dof.py``) uses the plane-layout variant inline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
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


STENCIL_CONDITION_THRESHOLD = 1e9
"""Weight magnitude above which the matmul quadratic is numerically unsafe.

bf16 MXU passes carry ~4e-3 relative error on the matmul's intermediates;
what matters is that error against the PER-SAMPLE quadratic spread the
softmax discriminates on. Two measured anchors on v5e:

- planar parity (max weight 1.5e8, sampling sigmas ~3.0 -> huge per-sample
  quad spreads): the matmul form passes moment/descent/goal-reaching tests
  on hardware for two rounds, and forcing the stencil cost 15-18%
  throughput (the stencil adds VPU work to the VPU-bound field stages
  while the matmul overlapped on the idle MXU);
- Panda (max weight ~2e11, sampling sigmas 1e-3..0.1 -> small spreads):
  matmul costs diverge from a float64 oracle by ~10x the answer
  (docs/PERFORMANCE.md "bf16-matmul precision trap").

The 1e9 threshold separates the two regimes; the factories pick per
problem: stencil iff any weight entry exceeds this."""


def needs_stencil(dof_quad) -> bool:
    return max(
        float(np.abs(np.asarray(dof_quad.q_i2)).max()),
        float(np.abs(np.asarray(dof_quad.k_s2)).max()),
        float(np.abs(np.asarray(dof_quad.k_g2)).max()),
    ) > STENCIL_CONDITION_THRESHOLD


def _dof_quad_kernel(x_ref, anch_ref, w_ref, *rest, traj_len, dt,
                     n_dof_total, temperature=None, num_samples=None):
    """One (batch-block, dof) grid step of :func:`dof_quad_eval_pallas`:
    the full stencil energy of a ``[Bb, 2T]`` tile in ONE pass over its
    rows. ``anch_ref [1, Bb, 4]`` carries the per-row anchor values
    (start pos/vel, goal pos/vel) for this dof; ``w_ref [12]`` (SMEM) the
    raveled ``q_i2 | k_s2 | k_g2`` stencil weights — SMEM scalars rather
    than baked Python constants so a TRACED ``DofQuadraticCost`` (the cost
    is a jit argument in every planner/benchmark entry point) reaches the
    kernel without a concretization error. With ``temperature`` set,
    ``rest`` leads with ``pu_ref [1, Bb/S, 2T]`` (the per-particle
    ``Sigma^{-1} mu`` planes) and the planner's importance term
    ``tau * x . pu`` fuses into the same pass.

    The per-dof energy column accumulates into a shared ``[Bb, d]`` output
    block across the dof grid steps (``di`` is the fastest-varying grid
    dim, so Mosaic keeps the block resident and writes it back once per
    batch block — the standard reduction-revisiting pattern). A
    ``[Bb, 1]``-blocked output would partition the minor dim in lanes of
    1, which Mosaic tiling rejects (block dims must be tile-multiples or
    equal to the array dims — see docs/PERFORMANCE.md, CLAUDE.md)."""
    if temperature is not None:
        pu_ref, out_ref = rest
    else:
        (out_ref,) = rest
    t = traj_len
    q11, q12, q22 = w_ref[0], w_ref[1], w_ref[3]
    ks11, ks12, ks22 = w_ref[4], w_ref[5], w_ref[7]
    kg11, kg12, kg22 = w_ref[8], w_ref[9], w_ref[11]

    x = x_ref[0]
    p_ = x[:, :t]
    v_ = x[:, t:]
    nb = p_.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, t), 1)
    gp_mask = (lane < t - 1).astype(jnp.float32)
    onehot0 = (lane == 0).astype(jnp.float32)
    onehot_last = (lane == t - 1).astype(jnp.float32)
    # left-shift by one lane == circular roll by t-1 (non-negative shift);
    # the wrapped lane is masked by gp_mask
    p1 = pltpu.roll(p_, shift=t - 1, axis=1)
    v1 = pltpu.roll(v_, shift=t - 1, axis=1)
    rp = (p_ + dt * v_ - p1) * gp_mask
    rv = (v_ - v1) * gp_mask
    e = jnp.sum(
        q11 * rp * rp + 2.0 * q12 * rp * rv + q22 * rv * rv,
        axis=1, keepdims=True,
    )  # [Bb, 1]
    anch = anch_ref[0]  # [Bb, 4]
    r0p = jnp.sum(p_ * onehot0, axis=1, keepdims=True) - anch[:, 0:1]
    r0v = jnp.sum(v_ * onehot0, axis=1, keepdims=True) - anch[:, 1:2]
    e = e + (ks11 * r0p * r0p + 2.0 * ks12 * r0p * r0v + ks22 * r0v * r0v)
    rgp = jnp.sum(p_ * onehot_last, axis=1, keepdims=True) - anch[:, 2:3]
    rgv = jnp.sum(v_ * onehot_last, axis=1, keepdims=True) - anch[:, 3:4]
    e = e + (kg11 * rgp * rgp + 2.0 * kg12 * rgp * rgv + kg22 * rgv * rgv)
    if temperature is not None:
        pu_rows = jnp.repeat(pu_ref[0], num_samples, axis=0)  # [Bb, 2T]
        e = e + float(temperature) * jnp.sum(
            x * pu_rows, axis=1, keepdims=True
        )
    di = pl.program_id(1)
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, n_dof_total), 1) == di
    ).astype(jnp.float32)
    contrib = e * col  # [Bb, d]: this dof's energy in column di

    @pl.when(di == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(di != 0)
    def _accumulate():
        out_ref[:] = out_ref[:] + contrib


def dof_anchor_rows(dof_quad, b):
    """Per-(dof, row) anchor values ``[d, B, 4]`` (start pos/vel per dof,
    goal pos/vel per dof) for a goal-major batch of ``B`` rows. Loop
    invariant — XLA hoists it out of the planner scan."""
    d = dof_quad.n_dof
    ppg_rows = b // dof_quad.num_goals
    s_rows = jnp.broadcast_to(dof_quad.s_pd[:, None, :], (d, b, 2))
    g_rows = jnp.repeat(
        jnp.transpose(dof_quad.g_pd, (1, 0, 2)), ppg_rows, axis=1
    )  # [d, B, 2]
    return jnp.concatenate([s_rows, g_rows], axis=-1).astype(jnp.float32)


def _pick_batch_block(b: int, s: int, *, with_pu: bool = False) -> int | None:
    """Largest batch block that divides ``b``, is a whole number of
    ``s``-sample groups, and tiles cleanly (8-aligned, or the full batch —
    a block equal to the array dims is always legal).

    ``with_pu``: the fused-importance call also blocks the per-particle
    ``pu [d, P, 2T]`` input as ``(1, bb // s, 2T)``, whose SUBLANE dim
    ``bb // s`` must itself be 8-aligned (or the block must be the full
    batch, making it equal to the array's particle dim) for Mosaic tiling
    — a partial block with a 1/2/4-row sublane dim is rejected at compile
    time on hardware."""
    for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if b % c == 0 and c % s == 0 and (
            not with_pu or c == b or (c // s) % 8 == 0
        ):
            return c
    if b % s == 0 and b <= 2048:
        return b
    return None


def dof_quad_eval_pallas(dof_quad, x_planes, *, pu=None, temperature=None,
                         num_samples=None, anchors=None, interpret=None):
    """Single-pass Pallas evaluation of ``DofQuadraticCost`` on dof planes
    ``x_planes [d, B, 2T]`` (goal-major batch) -> ``[B]`` costs.

    Numerically IDENTICAL factor-graph residual form as
    ``DofQuadraticCost.eval_dof_planes`` (same ops, same order per dof),
    but the ~20 shifted/masked elementwise passes run inside one kernel:
    the XLA lowering of the plain stencil leaves them unfused at config-5
    scale (x is 147 MB; measured ~2.4x whole-iteration regression,
    docs/PERFORMANCE.md round 3), while the kernel reads each ``[Bb, 2T]``
    tile once. Grid = (batch blocks, dofs); each step accumulates its
    dof's energy column into a per-batch-block ``[Bb, d]`` output block
    (summed over dofs outside the kernel).

    With ``pu [d, P, 2T]`` + ``temperature`` + ``num_samples`` the planner's
    importance term ``tau * sum(x * pu)`` (one more full pass over x in
    XLA) fuses into the same read; rows must be sample-minor per particle
    (``B = P * num_samples``, the dof path's layout).

    ``anchors`` overrides the internally-built goal-major anchor rows with
    an explicit ``[d, B, 4]`` (used under ``shard_map``, where a shard's
    rows are a particle slice and the goal-major reconstruction from the
    LOCAL batch size would be wrong).

    Safe to call with a TRACED ``dof_quad`` (a jit argument): the stencil
    weights ride into the kernel as SMEM scalars, not baked constants.

    Requires ``traj_len % 128 == 0`` (clean lane slice of the pos/vel
    halves) and a batch that admits a legal block: an 8-aligned divisor
    that is a whole number of ``s``-sample groups, or the full batch
    (any size <= 2048 — a block equal to the array dim always tiles; see
    ``_pick_batch_block``). Returns None if ineligible so the caller can
    fall back to the XLA stencil."""
    d, b, t2 = x_planes.shape
    t = dof_quad.traj_len
    if (t % 128 != 0 or dof_quad.q_i2 is None
            or (anchors is None and b % dof_quad.num_goals)
            or x_planes.dtype != jnp.float32):
        return None
    s = num_samples if pu is not None else 1
    if pu is not None and (temperature is None or s is None or b % s):
        return None
    bb = _pick_batch_block(b, s, with_pu=pu is not None)
    if bb is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    anch = dof_anchor_rows(dof_quad, b) if anchors is None else anchors
    weights = jnp.concatenate([
        dof_quad.q_i2.reshape(-1), dof_quad.k_s2.reshape(-1),
        dof_quad.k_g2.reshape(-1),
    ]).astype(jnp.float32)  # [12] -> SMEM

    kernel = functools.partial(
        _dof_quad_kernel, traj_len=t, dt=float(dof_quad.dt), n_dof_total=d,
        temperature=temperature if pu is not None else None,
        num_samples=s if pu is not None else None,
    )
    in_specs = [
        pl.BlockSpec((1, bb, t2), lambda i, di: (di, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, 4), lambda i, di: (di, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [x_planes, anch, weights]
    if pu is not None:
        in_specs.append(
            pl.BlockSpec((1, bb // s, t2), lambda i, di: (di, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(pu)
    out = pl.pallas_call(
        kernel,
        grid=(b // bb, d),
        in_specs=in_specs,
        # one [bb, d] block per batch block, revisited (accumulated) across
        # the fastest-varying dof grid dim — its minor dim equals the array
        # minor, the only partition Mosaic accepts for a d-column array
        out_specs=pl.BlockSpec((bb, d), lambda i, di: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(*args)
    return jnp.sum(out, axis=1)


def dense_quad_from_dof(dof_quad, traj_len: int, n_dof: int):
    """Rebuild the t-major dense ``(A [M, M], b [G, M])`` of the quadratic
    from the per-dof stencil parameters (host numpy; used by the planar
    kernels' matmul path). Verified equal to
    ``QuadraticCost.from_gp_and_goal_prior`` in tests."""
    d = n_dof
    sd = 2 * d
    m = traj_len * sd
    eye = np.eye(d)
    q2 = np.asarray(dof_quad.q_i2, dtype=np.float64)
    ks2 = np.asarray(dof_quad.k_s2, dtype=np.float64)
    kg2 = np.asarray(dof_quad.k_g2, dtype=np.float64)
    dt = float(dof_quad.dt)
    q_full = np.kron(q2, eye)
    ks_full = np.kron(ks2, eye)
    kg_full = np.kron(kg2, eye)
    phi = np.kron(np.asarray([[1.0, dt], [0.0, 1.0]]), eye)
    pqp = phi.T @ q_full @ phi
    a = np.zeros((m, m))
    for t in range(traj_len):
        blk = slice(t * sd, (t + 1) * sd)
        if t == 0:
            a[blk, blk] = ks_full + pqp
        elif t == traj_len - 1:
            a[blk, blk] = q_full + kg_full
        else:
            a[blk, blk] = q_full + pqp
        if t < traj_len - 1:
            nxt = slice((t + 1) * sd, (t + 2) * sd)
            low = -(q_full @ phi)
            a[nxt, blk] = low
            a[blk, nxt] = low.T
    s_pd = np.asarray(dof_quad.s_pd, dtype=np.float64)  # [d, 2]
    g_pd = np.asarray(dof_quad.g_pd, dtype=np.float64)  # [G, d, 2]
    g = g_pd.shape[0]
    b = np.zeros((g, m))
    s_vec = np.concatenate([s_pd[:, 0], s_pd[:, 1]])
    b[:, :sd] = ks_full @ s_vec
    g_vecs = np.concatenate([g_pd[..., 0], g_pd[..., 1]], axis=-1)  # [G, 2d]
    b[:, m - sd :] += g_vecs @ kg_full.T
    return (
        jnp.asarray(a.astype(np.float32)),
        jnp.asarray(b.astype(np.float32)),
    )
