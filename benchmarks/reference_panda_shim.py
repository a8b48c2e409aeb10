"""Run the ACTUAL reference Panda planner here, without `torch_robotics`.

The reference's Panda workload imports `torch_robotics` for two things
(surface mapped in SURVEY.md §2.2): `SE3_distance` (used by
`stoch_gpmp/costs/fields.py:4,143`) and `DifferentiableFrankaPanda`
(`examples/panda_environment.py:13,47-49`). This module registers a minimal
shim providing both — a batched torch forward-kinematics chain built from
OUR embedded Panda model constants (`kinematics/panda_model.py`, themselves
validated per-link against the reference URDF asset) and a torch SE(3)
distance matching our native `se3_distance` — so the reference
`stoch_gpmp` package (mounted read-only) can plan the 7-DOF workload on
torch CPU for true reference-vs-native A/B evaluation.

Both planners then see IDENTICAL cost definitions: the shim FK returns the
same 9 link frames our native FK exposes (`PANDA_FK_LINKS`), so the
self/obstacle/SE(3) field values agree between frameworks (spot-checked in
`install_torch_robotics_shim.__doc__` usage; see
`benchmarks/success_rate_panda.py --planner reference`).
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _build_fk_tables():
    """Static per-joint frame data from OUR embedded model (float64 numpy)."""
    from stoch_gpmp_tpu.kinematics.chain import _origin_np, _topo_sort
    from stoch_gpmp_tpu.kinematics.panda_model import (
        PANDA_FK_LINKS,
        PANDA_NO_GRIPPER,
    )

    joints = _topo_sort(PANDA_NO_GRIPPER)
    names = [j.child_link for j in joints]
    parent = [
        names.index(j.parent_link) if j.parent_link in names else -1
        for j in joints
    ]
    origins = np.stack([_origin_np(j.origin_rpy, j.origin_xyz) for j in joints])
    axes = np.stack([np.asarray(j.axis, dtype=np.float64) for j in joints])
    kinds = [j.joint_type for j in joints]
    dof_index = []
    dof = 0
    for j in joints:
        dof_index.append(dof if j.actuated else -1)
        dof += int(j.actuated)
    sel = [names.index(n) for n in PANDA_FK_LINKS]
    return parent, origins, axes, kinds, dof_index, sel


def install_torch_robotics_shim():
    """Register `torch_robotics.*` modules in ``sys.modules`` (idempotent;
    supersedes partial stubs like the raising SE3_distance stub in
    ``tests/test_reference_parity.py``)."""
    if "torch_robotics.torch_kinematics_tree.models.robots" in sys.modules:
        return
    import torch

    parent, origins, axes, kinds, dof_index, sel = _build_fk_tables()

    def se3_distance(h1, h2, w_pos=1.0, w_rot=1.0):
        """Position-norm + rotation-angle distance between homogeneous
        transforms (native counterpart: ``kinematics/se3.py se3_distance``)."""
        while h2.ndim < h1.ndim:
            h2 = h2.unsqueeze(0)
        dp = torch.linalg.norm(h1[..., :3, 3] - h2[..., :3, 3], dim=-1)
        tr = torch.einsum("...ij,...ij->...", h1[..., :3, :3], h2[..., :3, :3])
        cos = torch.clamp((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
        return w_pos * dp + w_rot * torch.arccos(cos)

    class DifferentiableFrankaPanda:
        """Batched torch FK with the reference-consumed interface
        (``._n_dofs``, ``.compute_forward_kinematics_all_links(q) ->
        [batch, links, 4, 4]``, per SURVEY.md §2.2)."""

        def __init__(self, gripper: bool = False, device="cpu", dtype=None):
            assert not gripper, "shim covers the no-gripper arm variant"
            self._n_dofs = 7
            self.device = device

        def compute_forward_kinematics_all_links(self, q: "torch.Tensor"):
            b = q.shape[0]
            dtype, device = q.dtype, q.device
            eye = torch.eye(4, dtype=dtype, device=device).expand(b, 4, 4)
            world = []
            for k, kind in enumerate(kinds):
                t_origin = torch.as_tensor(
                    origins[k], dtype=dtype, device=device
                ).expand(b, 4, 4)
                if kind in ("revolute", "continuous"):
                    qk = q[:, dof_index[k]]
                    c, s = torch.cos(qk), torch.sin(qk)
                    kx, ky, kz = axes[k]
                    one = torch.ones_like(qk)
                    zero = torch.zeros_like(qk)
                    # Rodrigues rotation about the (unit) joint axis
                    kmat = torch.stack(
                        [
                            torch.stack([zero, -kz * one, ky * one], -1),
                            torch.stack([kz * one, zero, -kx * one], -1),
                            torch.stack([-ky * one, kx * one, zero], -1),
                        ],
                        -2,
                    )
                    rot = (
                        torch.eye(3, dtype=dtype, device=device)
                        + s[:, None, None] * kmat
                        + (1.0 - c)[:, None, None] * (kmat @ kmat)
                    )
                    t_joint = torch.zeros(b, 4, 4, dtype=dtype, device=device)
                    t_joint[:, :3, :3] = rot
                    t_joint[:, 3, 3] = 1.0
                    local = t_origin @ t_joint
                else:  # fixed (the no-gripper arm has no prismatic joints)
                    local = t_origin
                parent_t = world[parent[k]] if parent[k] >= 0 else eye
                world.append(parent_t @ local)
            return torch.stack([world[i] for i in sel], dim=1)

        def get_link_names(self):
            from stoch_gpmp_tpu.kinematics.panda_model import PANDA_FK_LINKS

            return list(PANDA_FK_LINKS)

    root = types.ModuleType("torch_robotics")
    tree = types.ModuleType("torch_robotics.torch_kinematics_tree")
    geom = types.ModuleType("torch_robotics.torch_kinematics_tree.geometrics")
    utils = types.ModuleType(
        "torch_robotics.torch_kinematics_tree.geometrics.utils"
    )
    models = types.ModuleType("torch_robotics.torch_kinematics_tree.models")
    robots = types.ModuleType(
        "torch_robotics.torch_kinematics_tree.models.robots"
    )
    utils.SE3_distance = se3_distance
    robots.DifferentiableFrankaPanda = DifferentiableFrankaPanda
    for m in (root, tree, geom, utils, models, robots):
        sys.modules[m.__name__] = m
    root.torch_kinematics_tree = tree
    tree.geometrics = geom
    tree.models = models
    geom.utils = utils
    models.robots = robots


def plan_with_reference(start_state, multi_goal_states, target_h,
                        obstacle_spheres, *, traj_len=32, dt=0.05,
                        num_particles_per_goal=4, num_samples=32,
                        opt_iters=300, seed=0):
    """Plan the Panda workload with the REFERENCE StochGPMP (torch CPU),
    mirroring the reference example's cost stack and hyper-parameters
    (`/root/reference/examples/panda_environment.py:68-124`). Returns the
    particle means as ``[P, T, 2*n_dof]`` numpy."""
    install_torch_robotics_shim()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from stoch_gpmp.costs.cost_functions import (  # noqa: E501  (reference pkg)
        CostCollision, CostComposite, CostGP, CostGoal, CostGoalPrior,
    )
    from stoch_gpmp.costs.fields import (
        EESE3DistanceField, LinkDistanceField, LinkSelfDistanceField,
    )
    from stoch_gpmp.planner import StochGPMP
    from torch_robotics.torch_kinematics_tree.models.robots import (
        DifferentiableFrankaPanda,
    )

    torch.manual_seed(seed)
    tensor_args = {"device": "cpu", "dtype": torch.float64}
    n_dof = 7
    start_state = torch.as_tensor(np.asarray(start_state), **tensor_args)
    multi_goal_states = torch.as_tensor(
        np.asarray(multi_goal_states), **tensor_args
    )
    target_h_t = torch.as_tensor(np.asarray(target_h), **tensor_args)
    obs = {
        "obstacle_spheres": torch.as_tensor(
            np.asarray(obstacle_spheres), **tensor_args
        )
    }

    panda_fk = DifferentiableFrankaPanda(gripper=False, device="cpu")
    cost_func_list = [
        CostGP(
            n_dof, traj_len, start_state, dt,
            dict(sigma_start=0.0001, sigma_gp=0.0007), tensor_args,
        ),
        CostGoalPrior(
            n_dof, traj_len, multi_goal_states=multi_goal_states,
            num_particles_per_goal=num_particles_per_goal,
            num_samples=num_samples, sigma_goal_prior=20.0,
            tensor_args=tensor_args,
        ),
        CostCollision(
            n_dof, traj_len,
            field=LinkSelfDistanceField(margin=0.03, tensor_args=tensor_args),
            sigma_coll=0.01,
        ),
        CostCollision(
            n_dof, traj_len,
            field=LinkDistanceField(tensor_args=tensor_args),
            sigma_coll=0.01,
        ),
        CostGoal(
            n_dof, traj_len,
            field=EESE3DistanceField(target_h_t, tensor_args=tensor_args),
            sigma_goal=0.00007,
        ),
    ]
    cost = CostComposite(
        n_dof, traj_len, cost_func_list,
        FK=panda_fk.compute_forward_kinematics_all_links,
    )
    planner = StochGPMP(
        num_particles_per_goal=num_particles_per_goal,
        num_samples=num_samples,
        traj_len=traj_len,
        dt=dt,
        n_dof=n_dof,
        opt_iters=1,
        temperature=1.0,
        start_state=start_state,
        multi_goal_states=multi_goal_states,
        cost=cost,
        step_size=0.1,
        sigma_start_init=0.0001,
        sigma_goal_init=0.1,
        sigma_gp_init=0.8,
        sigma_start_sample=0.001,
        sigma_goal_sample=0.07,
        sigma_gp_sample=0.1,
        seed=seed,
        tensor_args=tensor_args,
    )
    for _ in range(opt_iters):
        planner.optimize(**obs)
    return planner.particle_means.detach().cpu().numpy()
