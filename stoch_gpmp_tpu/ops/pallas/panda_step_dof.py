"""Fully-fused dof-factored Panda StochGPMP iteration (one Pallas kernel).

Round 2's fused Panda kernel (``ops/pallas/panda_step.py``) could not run
the scaling config: its ``[M, M]`` constants at M=1792 are ~38 MB and
exceed VMEM. The dof factorization (``gp/dof_factored.py``) dissolves that
blocker: with scalar sigmas the sampling factor shrinks to ONE shared
``[2T, 2T]`` block (~260 KB at T=128), so the whole iteration fuses at ANY
particle count:

  per dof d (unrolled; all dofs share the factor):
    1. eps_d ~ N(0, I) via hardware PRNG + dual-output Box-Muller,
    2. x_d = mu_d + eps_d @ W_dof              (MXU, [N, 2T] @ [2T, 2T]),
    3. quad += GP factor-graph STENCIL energy of x_d (lane rolls + masked
       residual quadratics — VPU-only; the ``x A x`` matmul form is
       numerically unusable here: the ~1e10-scale precision entries through
       the MXU's default bf16 passes corrupt the cancelling quadratic,
       measured on v5e in round 3),
    4. importance += tau * x_d . (Sigma^-1 mu)_d   (VPU; Sigma^-1 mu from
       the exact stencil matvec outside the kernel),
  then, on the position planes q_d = x_d[:, :T] (exact lane slices —
  they fall out of the sampling matmul, no selection matmul, no relayout):
    5. FK scalar planes -> self-RBF + obstacle-RBF fields, t=0 masked (VPU),
    6. terminal SE(3) distance on the exact last-step lane            (VPU),
    7. segmented softmax over samples + per-dof weighted mean update
       (VPU + MXU segment matmul).

Grid = particle blocks. The RNG stream is the hardware PRNG (opt-in
execution path; same algorithm/distributions as the XLA dof path, different
well-defined stream — like the planar fused kernel).
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
    means_ref,  # [D, PB, 2T]
    prec_u_ref,  # [D, PB, 2T]
    goals_ref,  # [D, PB, 2] per-particle goal (pos, vel) anchor values
    w_ref,  # [2T, 2T] shared sampling factor (x = eps @ W)
    spheres_ref,  # [O, 4]
    tmask_ref,  # [1, T]
    new_means_ref,  # out [D, PB, 2T]
    costs_ref,  # out [PB, S]
    *,
    chain,
    num_particles,
    num_samples,
    n_dof,
    traj_len,
    n_obst,
    margin,
    w_self,
    w_obst,
    w_goal,
    w_pos,
    w_rot,
    target,  # np [4, 4] python-constant SE(3) goal
    quad_stencil,  # (q_i2 [2,2], k_s2 [2,2], k_g2 [2,2], s_pd [d,2], dt)
    temperature,
    step_size,
):
    from stoch_gpmp_tpu.ops.pallas.fused_step import _box_muller

    p, s = num_particles, num_samples
    n = p * s
    t = traj_len
    t2 = 2 * t
    q_i2, k_s2, k_g2, s_pd, dt = quad_stencil
    q11, q12, q22 = float(q_i2[0, 0]), float(q_i2[0, 1]), float(q_i2[1, 1])
    ks11, ks12, ks22 = float(k_s2[0, 0]), float(k_s2[0, 1]), float(k_s2[1, 1])
    kg11, kg12, kg22 = float(k_g2[0, 0]), float(k_g2[0, 1]), float(k_g2[1, 1])

    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, t), 1)
    gp_mask = (lane < t - 1).astype(jnp.float32)
    onehot0 = (lane == 0).astype(jnp.float32)
    onehot_last = (lane == t - 1).astype(jnp.float32)

    # --- per-dof sampling + stencil quadratic + importance -------------------
    xs = []
    cost = None
    for d in range(n_dof):
        eps = _box_muller(n, t2)
        mu_rows = jnp.repeat(means_ref[d], s, axis=0)  # [N, 2T]
        x = mu_rows + jnp.dot(eps, w_ref[:], preferred_element_type=jnp.float32)
        xs.append(x)  # mu_rows recomputed at update time (halves live VMEM)
        # GP factor energy: r_t = phi x_t - x_{t+1} on rolled planes
        p_ = x[:, :t]
        v_ = x[:, t:]
        # left-shift by one lane == circular roll by t-1 (Mosaic's roll
        # requires a non-negative shift); the wrapped lane is masked out
        p1 = pltpu.roll(p_, shift=t - 1, axis=1)
        v1 = pltpu.roll(v_, shift=t - 1, axis=1)
        rp = (p_ + dt * v_ - p1) * gp_mask
        rv = (v_ - v1) * gp_mask
        term = jnp.sum(
            q11 * rp * rp + 2.0 * q12 * rp * rv + q22 * rv * rv,
            axis=1, keepdims=True,
        )  # [N, 1]
        # start anchor (global python constants per dof)
        p0 = jnp.sum(p_ * onehot0, axis=1, keepdims=True)
        v0 = jnp.sum(v_ * onehot0, axis=1, keepdims=True)
        r0p = p0 - float(s_pd[d, 0])
        r0v = v0 - float(s_pd[d, 1])
        term = term + (
            ks11 * r0p * r0p + 2.0 * ks12 * r0p * r0v + ks22 * r0v * r0v
        )
        # goal anchor (per-particle values)
        pl_ = jnp.sum(p_ * onehot_last, axis=1, keepdims=True)
        vl_ = jnp.sum(v_ * onehot_last, axis=1, keepdims=True)
        rgp = pl_ - jnp.repeat(goals_ref[d][:, 0:1], s, axis=0)
        rgv = vl_ - jnp.repeat(goals_ref[d][:, 1:2], s, axis=0)
        term = term + (
            kg11 * rgp * rgp + 2.0 * kg12 * rgp * rgv + kg22 * rgv * rgv
        )
        # importance: tau * x . (Sigma^{-1} mu)_d
        pu_rows = jnp.repeat(prec_u_ref[d], s, axis=0)
        term = term + temperature * jnp.sum(x * pu_rows, axis=1, keepdims=True)
        cost = term if cost is None else cost + term

    # --- FK + fields on the position planes (exact lane slices) --------------
    qs = [xs[d][:, :t] for d in range(n_dof)]
    planes = chain.fk_planes_from_scalars(qs)
    pos = [pp for (_, pp) in planes]
    n_links = len(pos)

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

    # --- terminal SE(3) goal on the exact last-step lane ---------------------
    # (reference cost_functions.py:305; Mosaic has no acos — A&S 4.4.46
    # polynomial, |err| <= 2e-8; see ops/pallas/panda_step.py)
    if w_goal != 0.0:
        q_last = [xs[d][:, t - 1 : t] for d in range(n_dof)]
        r_ee, p_ee = chain.fk_planes_from_scalars(q_last)[-1]
        sq = None
        for c in range(3):
            dd = p_ee[c] - float(target[c, 3])
            sq = dd * dd if sq is None else sq + dd * dd
        pos_dist = jnp.sqrt(sq)
        tr = None
        for i in range(3):
            for j in range(3):
                term = r_ee[i][j] * float(target[i, j])
                tr = term if tr is None else tr + term
        cosang = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
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

    # --- segmented softmax + per-dof weighted mean update --------------------
    # Segments are contiguous S-row blocks: reshape [N, 1] -> [P, S] (the
    # same relayout costs_ref already does below), softmax each row, and
    # reshape back — 4 whole-block VPU ops instead of the P-piece unrolled
    # loop + concatenate this replaced (round 5; bit-equal, parity-tested).
    c2 = cost.reshape(p, s)
    neg = -c2 / temperature
    neg = neg - jnp.max(neg, axis=1, keepdims=True)
    e = jnp.exp(neg)
    wts = (e / jnp.sum(e, axis=1, keepdims=True)).reshape(n, 1)  # [N, 1]
    # Mosaic lowers the axis-0 eye-repeat (sublane broadcast); the axis-1
    # variant hits an unsupported vector shape cast.
    seg = jnp.repeat(jnp.eye(p, dtype=jnp.float32), s, axis=0)  # [N, P]
    for d in range(n_dof):
        x = xs[d]
        weighted = wts * (x - jnp.repeat(means_ref[d], s, axis=0))
        grad = jnp.dot(seg.T, weighted, preferred_element_type=jnp.float32)
        new_means_ref[d] = means_ref[d] + step_size * grad
    costs_ref[:] = cost.reshape(p, s)


def make_fused_panda_dof_step(
    *,
    chain,
    dof_prior,  # DofFactoredPrior (sampling factor + exact stencil matvec)
    dof_quad,  # DofQuadraticCost (stencil params; a_dof/b unused here)
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
    w_dof: jnp.ndarray | None = None,
):
    """Build ``step(means_planes [D, P, 2T], seeds [n_blocks, 2] int32) ->
    (new_means_planes, costs [P, S])`` running the whole dof-factored Panda
    iteration as one Pallas call. Requires ``traj_len`` a multiple of 128
    (the plane lanes; config-5's T=128 natively). ``w_dof`` overrides the
    sampling factor (tests pass zeros for RNG-free parity)."""
    t2 = 2 * traj_len
    p = num_particles
    w_dof = dof_prior.w_dof if w_dof is None else w_dof

    # per-particle goal anchors [D, P, 2] (goal-major particle batch)
    g_pd = np.asarray(dof_quad.g_pd, dtype=np.float32)  # [G, d, 2]
    goals_p = jnp.asarray(
        np.repeat(
            np.transpose(g_pd, (1, 0, 2)), p // dof_quad.num_goals, axis=1
        )
    )  # [D, P, 2]
    quad_stencil = (
        np.asarray(dof_quad.q_i2, dtype=np.float64),
        np.asarray(dof_quad.k_s2, dtype=np.float64),
        np.asarray(dof_quad.k_g2, dtype=np.float64),
        np.asarray(dof_quad.s_pd, dtype=np.float64),
        float(dof_quad.dt),
    )

    if particles_per_block is None:
        # per-dof x buffers dominate: D * PB * S * 2T * 4 bytes. Mosaic's
        # scoped-vmem stack limit is 16 MB and it does NOT reuse buffers
        # across the unrolled dof loop: measured stacks were 56.9 MB at an
        # 8 MB x-budget and 25.7 MB at 4 MB — 2 MB (pb=32 at config-5
        # scale) is the compiling setting
        budget_rows = max(1, (2 * 1024 * 1024) // (4 * t2 * n_dof * num_samples))
        candidates = [
            pb for pb in range(1, p + 1)
            if p % pb == 0 and ((pb * num_samples) % 8 == 0 or pb == p)
        ]
        fitting = [pb for pb in candidates if pb <= budget_rows]
        particles_per_block = max(fitting) if fitting else min(candidates)
    pb = particles_per_block
    assert p % pb == 0
    n_blocks = p // pb

    spheres = jnp.asarray(spheres, dtype=jnp.float32).reshape(-1, 4)
    n_obst = int(spheres.shape[0])
    if n_obst == 0:
        spheres = jnp.zeros((1, 4), dtype=jnp.float32)
    tmask = jnp.zeros((1, traj_len), dtype=jnp.float32).at[0, 1:].set(1.0)

    kernel = functools.partial(
        _kernel,
        chain=chain, num_particles=pb, num_samples=num_samples,
        n_dof=n_dof, traj_len=traj_len, n_obst=n_obst, margin=margin,
        w_self=w_self, w_obst=w_obst, w_goal=w_goal, w_pos=w_pos, w_rot=w_rot,
        target=np.asarray(target_h, dtype=np.float64),
        quad_stencil=quad_stencil,
        temperature=temperature, step_size=step_size,
    )
    vm = pltpu.VMEM
    const = lambda i: (0, 0)  # noqa: E731
    per_b3 = lambda i: (0, i, 0)  # noqa: E731
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((n_dof, pb, t2), per_b3, memory_space=vm),  # means
            pl.BlockSpec((n_dof, pb, t2), per_b3, memory_space=vm),  # prec_u
            pl.BlockSpec((n_dof, pb, 2), per_b3, memory_space=vm),  # goals
            pl.BlockSpec((t2, t2), const, memory_space=vm),  # W
            pl.BlockSpec((int(spheres.shape[0]), 4), const, memory_space=vm),
            pl.BlockSpec((1, traj_len), const, memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((n_dof, pb, t2), per_b3, memory_space=vm),
            pl.BlockSpec((pb, num_samples), lambda i: (i, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_dof, p, t2), jnp.float32),
            jax.ShapeDtypeStruct((p, num_samples), jnp.float32),
        ),
        interpret=_interpret(),
    )

    def step(means_planes: jnp.ndarray, seeds: jnp.ndarray):
        # exact O(T) stencil matvec — NOT the [2T, 2T] precision matmul
        prec_u = dof_prior.matvec_planes(means_planes)
        return call(
            seeds.reshape(n_blocks, 1, 2), means_planes, prec_u, goals_p,
            w_dof, spheres, tmask,
        )

    step.n_blocks = n_blocks
    return step


def fused_panda_dof_optimize(step, means_planes, key, opt_iters: int):
    """Scan the fused step; per-iteration per-block seeds from the key."""
    n_blocks = getattr(step, "n_blocks", 1)

    def body(carry, _):
        mns, k = carry
        k, sub = jax.random.split(k)
        seeds = jax.random.bits(sub, (n_blocks, 2), dtype=jnp.uint32).astype(jnp.int32)
        new_m, _ = step(mns, seeds)
        return (new_m, k), None

    (means_planes, key), _ = jax.lax.scan(
        body, (means_planes, key), None, length=opt_iters
    )
    return means_planes, key
