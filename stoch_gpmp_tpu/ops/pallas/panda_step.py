"""The fully-fused Panda StochGPMP iteration as one Pallas TPU kernel.

The planar analogue (``ops/pallas/fused_step.py``) showed the pattern: the
whole sample -> cost -> softmax -> update iteration in one program removes
every HBM round-trip between stages. The Panda parity workload (reference
``examples/panda_environment.py:83-98``: CostGP + CostGoalPrior + self/
obstacle RBF collision + terminal SE(3) goal over 7-DOF FK) additionally
needs forward kinematics INSIDE the kernel; the trace-time-folded scalar-
plane FK (``kinematics/chain.py fk_planes_from_scalars``) makes that pure
elementwise VPU math, so the entire stack fuses:

  1. eps ~ N(0, I) via hardware PRNG + Box-Muller,
  2. samples  x = mu_p + eps @ W                  (MXU, [N, M] @ [M, M]),
  3. quadratic (GP + anchors) cost via the factor-graph STENCIL on the flat
     t-major row — lane rolls by d/2d/3d align pos(t), vel(t), pos(t+1),
     vel(t+1), masked residual quadratics (VPU-only). The former
     ``x A x^T - 2 b x`` MXU form is numerically unusable on hardware: the
     ~1e10-scale precision entries through the MXU's default bf16 passes
     corrupt the massively-cancelling quadratic (measured on v5e round 3 —
     see gp/dof_factored.py),
  4. per-dof 128-aligned time planes  x @ sel     (MXU; flat layout, no
     [.., T, 14] relayout — see ops/pallas/panda_fields.py),
  5. FK scalar planes -> self-RBF + obstacle-RBF fields, t=0 masked   (VPU),
  6. terminal SE(3) pose distance on an exact last-step lane slice    (VPU),
  7. importance term  tau * x . (Sigma^{-1} mu_p)                     (VPU),
  8. segmented softmax over samples + weighted mean update      (VPU + MXU).

Grid = particle blocks (auto-sized to VMEM). Constants (W, sel, masks) are
shared across programs. The RNG stream is the hardware PRNG (same seeds ->
same trajectories; differs from ``jax.random`` like the planar kernel —
opt-in execution path, same algorithm and distributions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    seed_ref,  # [1, 1, 2] int32 (per particle block)
    means_ref,  # [PB, M]
    prec_u_ref,  # [PB, M]
    anchors_ref,  # [PB, M] start/goal anchor VALUES on their lanes, 0 elsewhere
    masks_ref,  # [3, M]: gp pos-lane (t<T-1), start pos-lane, goal pos-lane
    w_ref,  # [M, M] = L^{-T} transpose factor (samples = eps @ W)
    sel_ref,  # [M, n_dof*TPAD] plane-selection matrix
    spheres_ref,  # [O, 4]
    tmask_ref,  # [1, TPAD] collision mask (t=1..T-1)
    new_means_ref,  # out [PB, M]
    costs_ref,  # out [PB, S]
    *,
    chain,
    num_particles,
    num_samples,
    n_dof,
    tpad,
    traj_len,
    n_obst,
    margin,
    w_self,
    w_obst,
    w_goal,
    w_pos,
    w_rot,
    target,  # np [4, 4] python-constant SE(3) goal
    quad_stencil,  # (q_i2 [2,2], k_s2 [2,2], k_g2 [2,2], dt)
    temperature,
    step_size,
):
    p, s = num_particles, num_samples
    n = p * s
    m = means_ref.shape[-1]

    # --- 1. in-kernel N(0,1) (both Box-Muller outputs; see fused_step) -------
    from stoch_gpmp_tpu.ops.pallas.fused_step import _box_muller
    from stoch_gpmp_tpu.ops.pallas.stencil import flat_quad_cost

    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    eps = _box_muller(n, m)

    # --- 2. samples -----------------------------------------------------------
    mean_rows = jnp.repeat(means_ref[:], s, axis=0)  # [N, M]
    x = mean_rows + jnp.dot(eps, w_ref[:], preferred_element_type=jnp.float32)

    # --- 3. quadratic (GP + start + goal-prior) cost, factor-graph stencil -----
    anch = jnp.repeat(anchors_ref[:], s, axis=0)
    cost = flat_quad_cost(x, anch, masks_ref, quad_stencil, n_dof)

    # --- 4. per-dof time planes + FK ------------------------------------------
    qsel = jnp.dot(x, sel_ref[:], preferred_element_type=jnp.float32)
    qs = [qsel[:, d * tpad : (d + 1) * tpad] for d in range(n_dof)]
    planes = chain.fk_planes_from_scalars(qs)  # list of (r, p) per link
    pos = [pp for (_, pp) in planes]
    n_links = len(pos)

    # --- 5. collision fields (reference skips t=0, cost_functions.py:244) -----
    acc = jnp.zeros(qs[0].shape, dtype=jnp.float32)
    if w_self != 0.0:
        inv = 1.0 / (2.0 * margin * margin)
        sacc = None
        for i in range(n_links):
            for j in range(i + 1, n_links):
                dx = pos[i][0] - pos[j][0]
                dy = pos[i][1] - pos[j][1]
                dz = pos[i][2] - pos[j][2]
                d2 = dx * dx + dy * dy + dz * dz
                e = 2.0 * jnp.exp(-d2 * inv)
                sacc = e if sacc is None else sacc + e
        acc = acc + w_self * (sacc + float(n_links))
    if w_obst != 0.0 and n_obst:
        oacc = None
        for li in range(n_links):
            for k in range(n_obst):
                dx = pos[li][0] - spheres_ref[k, 0]
                dy = pos[li][1] - spheres_ref[k, 1]
                dz = pos[li][2] - spheres_ref[k, 2]
                r = spheres_ref[k, 3]
                d2 = dx * dx + dy * dy + dz * dz
                e = jnp.exp(-0.5 * d2 / (r * r))
                oacc = e if oacc is None else oacc + e
        acc = acc + w_obst * oacc
    cost = cost + jnp.sum(acc * tmask_ref[:], axis=1, keepdims=True)

    # --- 6. terminal SE(3) goal, t=T-1 only ------------------------------------
    # (reference cost_functions.py:305; distance form of fields.py:142-150).
    # NOT evaluated on the sel-matmul planes: the MXU's reduced-precision f32
    # passes perturb the selected q by ~1e-2 relative (bf16 mantissa), which
    # the 1e8-weighted SE(3) term amplifies. The last step's position dofs are
    # CONTIGUOUS lanes of the flat [T, d]-ordered sample row — a static slice
    # is exact, and FK on the [N, 1] planes is negligible VPU work.
    if w_goal != 0.0:
        base = (traj_len - 1) * 2 * n_dof
        q7 = x[:, base : base + n_dof]  # [N, n_dof], exact
        q_last = [q7[:, d : d + 1] for d in range(n_dof)]
        r_ee, p_ee = chain.fk_planes_from_scalars(q_last)[-1]
        sq = None
        for c in range(3):
            d = p_ee[c] - float(target[c, 3])
            sq = d * d if sq is None else sq + d * d
        pos_dist = jnp.sqrt(sq)
        tr = None
        for i in range(3):
            for j in range(3):
                term = r_ee[i][j] * float(target[i, j])
                tr = term if tr is None else tr + term
        cosang = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
        # Mosaic lowers neither acos nor atan2; use the Abramowitz-Stegun
        # 4.4.46 polynomial (|err| <= 2e-8, far below f32 resolution):
        # arccos(z) = sqrt(1-z) * P(z) on [0, 1], arccos(-z) = pi - arccos(z)
        az = jnp.abs(cosang)
        poly = 1.5707963050 + az * (
            -0.2145988016 + az * (
                0.0889789874 + az * (
                    -0.0501743046 + az * (
                        0.0308918810 + az * (
                            -0.0170881256 + az * (
                                0.0066700901 + az * -0.0012624911
                            )
                        )
                    )
                )
            )
        )
        r_pos = jnp.sqrt(1.0 - az) * poly
        ang = jnp.where(cosang >= 0.0, r_pos, np.pi - r_pos)
        dist = w_pos * pos_dist + w_rot * ang
        cost = cost + w_goal * (dist * dist)  # [N, 1]

    # --- 7. importance term -----------------------------------------------------
    prec_rows = jnp.repeat(prec_u_ref[:], s, axis=0)
    cost = cost + temperature * jnp.sum(x * prec_rows, axis=1, keepdims=True)

    # --- 8. segmented softmax + weighted mean update -----------------------------
    # reshape [N, 1] -> [P, S] (the relayout costs_ref does below), softmax
    # each row, reshape back — whole-block VPU ops instead of the P-piece
    # unrolled loop + concatenate (round 5; bit-equal, on-chip tested)
    c2 = cost.reshape(p, s)
    neg = -c2 / temperature
    neg = neg - jnp.max(neg, axis=1, keepdims=True)
    e = jnp.exp(neg)
    wts = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(p * s, 1)
    seg = jnp.repeat(jnp.eye(p, dtype=jnp.float32), s, axis=0)  # [N, P]
    weighted = wts * (x - mean_rows)
    grad = jnp.dot(seg.T, weighted, preferred_element_type=jnp.float32)  # [P, M]
    new_means_ref[:] = means_ref[:] + step_size * grad
    costs_ref[:] = cost.reshape(p, s)


def make_fused_panda_step(
    *,
    chain,
    weight_t: jnp.ndarray,  # [M, M]
    dof_prior,  # DofFactoredPrior (exact stencil Sigma^{-1} matvec)
    dof_quad,  # DofQuadraticCost (stencil params + start/goal anchors)
    num_particles: int,
    spheres: jnp.ndarray,  # [O, 4]
    target_h: np.ndarray,  # [4, 4]
    n_dof: int,
    traj_len: int,
    num_samples: int,
    margin: float,
    w_self: float,
    w_obst: float,
    w_goal: float,
    w_pos: float = 1.0,
    w_rot: float = 1.0,
    temperature: float = 1.0,
    step_size: float = 0.1,
    particles_per_block: int | None = None,
):
    """Build ``step(means [P, T, d], seeds [n_blocks, 2] int32) ->
    (new_means, costs)`` running the whole Panda iteration as one Pallas call.

    ``target_h`` is baked into the kernel as python constants (rebuild the
    step when the goal pose changes — it is fixed across an optimize run).
    """
    state_dim = 2 * n_dof
    m = traj_len * state_dim
    p = num_particles
    tpad = 128 * (-(-traj_len // 128))
    from stoch_gpmp_tpu.ops.pallas.panda_fields import make_traj_selection

    sel, tmask = make_traj_selection(n_dof, state_dim, traj_len, tpad)

    # stencil constants + anchor-value rows + lane masks (t-major layout)
    from stoch_gpmp_tpu.ops.pallas.stencil import (
        anchor_rows_and_masks,
        quad_stencil_consts,
    )

    quad_stencil = quad_stencil_consts(dof_quad)
    anchors, masks = anchor_rows_and_masks(dof_quad, p, traj_len, n_dof)

    if particles_per_block is None:
        # the [PB*S, M] sample-stage buffers dominate; keep one around ~1 MB
        # (constants W/A/sel are shared across programs). Sublane tiling
        # wants PB*S a multiple of 8 or the whole batch.
        budget = max(1, (1024 * 1024) // (4 * m * num_samples))
        candidates = [
            pb for pb in range(1, p + 1)
            if p % pb == 0 and ((pb * num_samples) % 8 == 0 or pb == p)
        ]
        fitting = [pb for pb in candidates if pb <= budget]
        particles_per_block = max(fitting) if fitting else min(candidates)
    pb = particles_per_block
    assert p % pb == 0
    n_blocks = p // pb

    spheres = jnp.asarray(spheres, dtype=jnp.float32).reshape(-1, 4)
    n_obst = int(spheres.shape[0])
    if n_obst == 0:
        # pallas_call rejects zero-size blocks; keep a dummy (1, 4) row with
        # n_obst=0 so the obstacle loop is skipped (same guard as
        # panda_fields.fk_link_fields_cost_rows).
        spheres = jnp.zeros((1, 4), dtype=jnp.float32)

    kernel = functools.partial(
        _kernel,
        chain=chain, num_particles=pb, num_samples=num_samples,
        n_dof=n_dof, tpad=tpad, traj_len=traj_len, n_obst=n_obst, margin=margin,
        w_self=w_self, w_obst=w_obst, w_goal=w_goal, w_pos=w_pos, w_rot=w_rot,
        target=np.asarray(target_h, dtype=np.float64),
        quad_stencil=quad_stencil,
        temperature=temperature, step_size=step_size,
    )
    vm = pltpu.VMEM
    const = lambda i: (0, 0)  # noqa: E731
    per_b = lambda i: (i, 0)  # noqa: E731
    per_b3 = lambda i: (i, 0, 0)  # noqa: E731
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), per_b3, memory_space=vm),  # seeds
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # means
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # prec_u
            pl.BlockSpec((pb, m), per_b, memory_space=vm),  # anchors
            pl.BlockSpec((3, m), const, memory_space=vm),  # masks
            pl.BlockSpec((m, m), const, memory_space=vm),  # W
            pl.BlockSpec((m, n_dof * tpad), const, memory_space=vm),  # sel
            pl.BlockSpec((int(spheres.shape[0]), 4), const, memory_space=vm),
            pl.BlockSpec((1, tpad), const, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((pb, m), per_b, memory_space=vm),
            pl.BlockSpec((pb, num_samples), per_b, memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, m), jnp.float32),
            jax.ShapeDtypeStruct((p, num_samples), jnp.float32),
        ),
        interpret=_interpret(),
    )

    def step(means: jnp.ndarray, seeds: jnp.ndarray):
        means_flat = means.reshape(p, m)
        # exact O(T) stencil matvec — NOT the [M, M] precision matmul
        prec_u = dof_prior.matvec_flat(
            means_flat.reshape(p, traj_len, state_dim)
        ).reshape(p, m)
        new_flat, costs = call(
            seeds.reshape(n_blocks, 1, 2), means_flat, prec_u, anchors,
            masks, weight_t, sel, spheres, tmask,
        )
        return new_flat.reshape(p, traj_len, state_dim), costs

    step.n_blocks = n_blocks
    return step


def fused_panda_optimize(step, means, key, opt_iters: int):
    """Scan the fused step; per-iteration per-block seeds from the key."""
    n_blocks = getattr(step, "n_blocks", 1)

    def body(carry, _):
        mns, k = carry
        k, sub = jax.random.split(k)
        seeds = jax.random.bits(sub, (n_blocks, 2), dtype=jnp.uint32).astype(jnp.int32)
        new_m, _ = step(mns, seeds)
        return (new_m, k), None

    (means, key), _ = jax.lax.scan(body, (means, key), None, length=opt_iters)
    return means, key
