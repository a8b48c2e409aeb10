"""Fused link-fields cost: one Pallas pass for self-collision + obstacle RBF.

Drop-in replacement for the pair
``CostCollision(LinkSelfDistanceField(margin)) +
CostCollision(LinkDistanceField('rbf'))`` in a ``CostComposite`` — exactly
equal values (tested), evaluated with zero HBM intermediates
(``ops/pallas/panda_fields.py``). Timesteps ``1..T-1`` like the reference
(``cost_functions.py:244``).
"""

from __future__ import annotations

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
