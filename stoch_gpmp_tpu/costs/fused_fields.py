"""Fused link-fields cost: one Pallas pass for self-collision + obstacle RBF.

Drop-in replacement for the pair
``CostCollision(LinkSelfDistanceField(margin)) +
CostCollision(LinkDistanceField('rbf'))`` in a ``CostComposite`` — exactly
equal values (tested), evaluated with zero HBM intermediates
(``ops/pallas/panda_fields.py``). Timesteps ``1..T-1`` like the reference
(``cost_functions.py:244``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from stoch_gpmp_tpu.costs.costs import Cost
from stoch_gpmp_tpu.costs.fields import _link_pos
from stoch_gpmp_tpu.ops.pallas.panda_fields import fused_link_fields_cost


@struct.dataclass
class FusedLinkFieldsCost(Cost):
    margin: float = struct.field(pytree_node=False, default=0.03)
    sigma_self: float = struct.field(pytree_node=False, default=0.01)
    sigma_coll: float = struct.field(pytree_node=False, default=0.01)

    @classmethod
    def create(cls, n_dof, traj_len, margin=0.03, sigma_self=0.01, sigma_coll=0.01,
               **kw):
        del n_dof, traj_len, kw
        return cls(margin=margin, sigma_self=sigma_self, sigma_coll=sigma_coll)

    def eval(self, trajs, x_trajs=None, observation=None):
        if x_trajs is None:
            raise ValueError("FusedLinkFieldsCost requires FK link poses")
        obs = observation or {}
        spheres = obs.get("obstacle_spheres", None)
        pos = _link_pos(x_trajs)[:, 1:]  # [B, T-1, L, 3]
        vals = fused_link_fields_cost(
            pos,
            spheres,
            margin=self.margin,
            w_self=1.0 / (self.sigma_self**2),
            w_obst=(1.0 / (self.sigma_coll**2)) if spheres is not None else 0.0,
        )
        return jnp.sum(vals, axis=-1)

    def gn_contrib(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        raise NotImplementedError(
            "use the separate CostCollision fields for the Gauss-Newton path"
        )


@struct.dataclass
class PlaneFieldsCost(Cost):
    """The whole Panda field stack — self-collision RBF + obstacle RBF +
    terminal SE(3) goal — evaluated DIRECTLY on FK scalar planes.

    Drop-in replacement (exactly equal values, tested) for

        CostCollision(LinkSelfDistanceField(margin), sigma_self)
      + CostCollision(LinkDistanceField('rbf'), sigma_coll)
      + CostGoal(EESE3DistanceField(target_h), sigma_goal)

    in a ``CostComposite`` with ``fk=None`` — this cost runs its own FK via
    ``chain.fk_scalar_planes`` and never materializes an ``[..., L, 3]`` link
    tensor. Rationale: the 3-wide (and 9-link) minor dims of the link tensor
    tile onto 128-lane TPU vregs with ~14-42x padding, and profiling showed
    that materialization dominating the Panda iteration (config 5: ~15 ms of
    a 22 ms step was FK+fields; the field math itself is ~3 ms). Here every
    intermediate is a ``[batch]``-shaped plane, so XLA fuses the FK formulas
    straight into the distance sums.

    Reference semantics preserved: collision terms skip timestep 0
    (``cost_functions.py:244``); the SE(3) term uses only the final step
    (``cost_functions.py:305``); the self field sums over ALL ordered link
    pairs including the diagonal (``fields.py:114-124``).
    """

    chain: Any = struct.field(pytree_node=False)
    target_h: jnp.ndarray  # [4, 4] SE(3) goal for the EE
    n_dof: int = struct.field(pytree_node=False)
    traj_len: int = struct.field(pytree_node=False)
    margin: float = struct.field(pytree_node=False, default=0.03)
    sigma_self: float = struct.field(pytree_node=False, default=0.01)
    sigma_coll: float = struct.field(pytree_node=False, default=0.01)
    sigma_goal: float = struct.field(pytree_node=False, default=0.00007)
    w_pos: float = struct.field(pytree_node=False, default=1.0)
    w_rot: float = struct.field(pytree_node=False, default=1.0)
    num_obstacles: int = struct.field(pytree_node=False, default=5)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    sel: jnp.ndarray | None = None  # [M, n_dof*TPAD] plane-selection matrix
    tmask: jnp.ndarray | None = None  # [1, TPAD]
    tpad: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, n_dof, traj_len, chain, target_h, *, margin=0.03,
               sigma_self=0.01, sigma_coll=0.01, sigma_goal=0.00007,
               w_pos=1.0, w_rot=1.0, num_obstacles=5, use_pallas=True,
               build_selection=True):
        """``build_selection=False`` skips the ``[M, n_dof*TPAD]`` selection
        matrix (98 MB at T=512) — for callers that only evaluate through the
        plane/dof-plane entry points, which never need it."""
        from stoch_gpmp_tpu.ops.pallas.panda_fields import make_traj_selection

        tpad = 128 * (-(-traj_len // 128))
        if build_selection:
            sel, tmask = make_traj_selection(n_dof, 2 * n_dof, traj_len, tpad)
        else:
            _, tmask = make_traj_selection(0, 0, traj_len, tpad)
            sel = None
        return cls(
            chain=chain, target_h=jnp.asarray(target_h), n_dof=n_dof,
            traj_len=traj_len, margin=margin, sigma_self=sigma_self,
            sigma_coll=sigma_coll, sigma_goal=sigma_goal, w_pos=w_pos,
            w_rot=w_rot, num_obstacles=num_obstacles, use_pallas=use_pallas,
            sel=sel, tmask=tmask, tpad=tpad,
        )

    def eval(self, trajs, x_trajs=None, observation=None):
        trajs = trajs.reshape(-1, self.traj_len, 2 * self.n_dof)
        b, t = trajs.shape[0], self.traj_len
        obs = observation or {}
        spheres = obs.get("obstacle_spheres", None)

        # ---- collision terms over timesteps 1..T-1 ------------------------
        w_self = 1.0 / (self.sigma_self**2)
        w_obst = (1.0 / (self.sigma_coll**2)) if spheres is not None else 0.0
        if self.use_pallas:
            if self.sel is None:
                raise ValueError(
                    "PlaneFieldsCost was built with build_selection=False; "
                    "flat eval needs the selection matrix — evaluate via "
                    "eval_planes/eval_dof_planes instead"
                )
            # stay in the flat [B, M] layout: one MXU selection matmul makes
            # 128-aligned per-dof time planes, then ONE Pallas pass fuses FK +
            # both RBF fields + the t=0 mask in VMEM (an [..., T, d] view
            # would force a ~9x-padded relayout that costs more than the
            # entire field math — see ops/pallas/panda_fields.py)
            from stoch_gpmp_tpu.ops.pallas.panda_fields import (
                fk_link_fields_cost_flat,
            )

            coll = fk_link_fields_cost_flat(
                self.chain, trajs.reshape(b, -1), self.sel, self.tmask,
                spheres, n_dof=self.n_dof, tpad=self.tpad,
                margin=self.margin, w_self=w_self, w_obst=w_obst,
            )
        else:
            q = trajs[:, 1:, : self.n_dof].reshape(-1, self.n_dof)
            coll = self._coll_xla(q, spheres, w_self, w_obst).reshape(
                b, t - 1
            ).sum(axis=-1)

        # ---- terminal SE(3) goal on the last step -------------------------
        q_last = trajs[:, -1, : self.n_dof]
        planes_l, as_array_l = self.chain.fk_scalar_planes(q_last)
        r_ee, p_ee = planes_l[-1]
        th = self.target_h
        sq = None
        for c in range(3):
            d = p_ee[c] - th[c, 3]
            sq = d * d if sq is None else sq + d * d
        pos_dist = jnp.sqrt(sq)
        tr = None
        for i in range(3):
            for j in range(3):
                term = r_ee[i][j] * th[i, j]
                tr = term if tr is None else tr + term
        cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
        dist = self.w_pos * pos_dist + self.w_rot * jnp.arccos(cos)
        goal = jnp.square(dist) / (self.sigma_goal**2)
        goal = jnp.broadcast_to(goal, (b,))

        return coll + goal

    def _coll_xla(self, q, spheres, w_self, w_obst):
        """Pure-XLA scalar-plane evaluation of the collision terms (exact
        semantics of the Pallas kernel; the cross-check / fallback path)."""
        planes = self.chain.fk_planes_from_scalars(
            [q[..., i] for i in range(self.n_dof)]
        )
        pos = [p for (_, p) in planes]
        l = len(pos)
        total = None

        def acc(v):
            nonlocal total
            total = v if total is None else total + v

        inv_2m2 = 1.0 / (2.0 * self.margin * self.margin)
        for i in range(l):
            for j in range(i + 1, l):
                dx = pos[i][0] - pos[j][0]
                dy = pos[i][1] - pos[j][1]
                dz = pos[i][2] - pos[j][2]
                sq = dx * dx + dy * dy + dz * dz
                acc((2.0 * w_self) * jnp.exp(-inv_2m2 * sq))
        if spheres is not None and w_obst:
            sp = spheres.reshape(-1, 4)
            for o in range(self.num_obstacles):
                cx, cy, cz, r = sp[o, 0], sp[o, 1], sp[o, 2], sp[o, 3]
                inv_r2 = 0.5 / (r * r)
                for i in range(l):
                    dx = pos[i][0] - cx
                    dy = pos[i][1] - cy
                    dz = pos[i][2] - cz
                    sq = dx * dx + dy * dy + dz * dz
                    acc(w_obst * jnp.exp(-sq * inv_r2))
        # the diagonal's constant exp(0) = 1 per link (reference sums it)
        return total + w_self * float(l)

    def supports_planes(self) -> bool:
        return True

    def supports_dof_planes(self) -> bool:
        return True

    def eval_dof_planes(self, x_planes, observation=None):
        """Dof-factored entry: ``x_planes [d, B, 2T]`` dof-LEADING plane-major
        state (gp/dof_factored.py). The position planes are the first T lanes
        of each dof slice — exact static slices, no selection matmul — and
        feed ``eval_planes`` directly."""
        t = x_planes.shape[-1] // 2
        planes = tuple(x_planes[i, :, :t] for i in range(self.n_dof))
        return self.eval_planes(planes, observation=observation)

    def eval_planes(self, planes, observation=None):
        """Plane-layout ``eval``: the per-dof time planes of the long-horizon
        pipeline are exactly the kernel's row layout, so the selection matmul
        disappears — planes concatenate along lanes into ``[B, n_dof*TPAD]``
        and the SE(3) term reads the last-step columns exactly."""
        from stoch_gpmp_tpu.ops.pallas.panda_fields import (
            fk_link_fields_cost_rows,
        )

        batch_shape = planes[0].shape[:-1]
        t = planes[0].shape[-1]
        obs = observation or {}
        spheres = obs.get("obstacle_spheres", None)
        w_self = 1.0 / (self.sigma_self**2)
        w_obst = (1.0 / (self.sigma_coll**2)) if spheres is not None else 0.0

        pad = self.tpad - t
        q_planes = [p.reshape(-1, t) for p in planes[: self.n_dof]]
        if pad:
            q_planes = [jnp.pad(p, ((0, 0), (0, pad))) for p in q_planes]
        qrows = jnp.concatenate(q_planes, axis=-1)  # [B, n_dof*TPAD]
        if self.use_pallas:
            coll = fk_link_fields_cost_rows(
                self.chain, qrows, self.tmask, spheres,
                n_dof=self.n_dof, tpad=self.tpad, margin=self.margin,
                w_self=w_self, w_obst=w_obst,
            )
        else:
            b = qrows.shape[0]
            q = jnp.stack(
                [p[:, 1:t] for p in q_planes], axis=-1
            ).reshape(-1, self.n_dof)
            coll = self._coll_xla(q, spheres, w_self, w_obst).reshape(
                b, t - 1
            ).sum(axis=-1)

        q_last = jnp.stack([p[..., t - 1] for p in q_planes], axis=-1)
        planes_l, _ = self.chain.fk_scalar_planes(q_last)
        r_ee, p_ee = planes_l[-1]
        th = self.target_h
        sq = None
        for c in range(3):
            dd = p_ee[c] - th[c, 3]
            sq = dd * dd if sq is None else sq + dd * dd
        pos_dist = jnp.sqrt(sq)
        tr = None
        for i in range(3):
            for j in range(3):
                term = r_ee[i][j] * th[i, j]
                tr = term if tr is None else tr + term
        cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
        dist = self.w_pos * pos_dist + self.w_rot * jnp.arccos(cos)
        goal = jnp.square(dist) / (self.sigma_goal**2)
        goal = jnp.broadcast_to(goal, coll.shape)
        return (coll + goal).reshape(batch_shape)

    def gn_contrib(self, trajs, x_trajs=None, observation=None, fk_trajs=None):
        raise NotImplementedError(
            "use the separate CostCollision/CostGoal fields for Gauss-Newton"
        )
