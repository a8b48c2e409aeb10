"""Closed-loop Panda simulation environment (native, no physics engine).

Capability parity with reference ``stoch_gpmp/envs/panda.py`` (``PandaEnv``,
sphere spawn/bounce helpers) without the PyBullet engine: the arm tracks
position targets either kinematically under its velocity limits (default) or
through the native rigid-body dynamics (``physics="dynamics"``: computed-
torque PD motor + RNEA forward dynamics, the analogue of bullet's
POSITION_CONTROL constraint motor), spheres in the ``motion_obstacles``
extension mode integrate and bounce inside their box (the reference's
dynamic path crashes and its spheres are static bullet bodies — see
docs/COMPONENT_MAP.md "Simulated-world fidelity audit"), and the contact /
goal / reward / trajectory-buffer semantics mirror the reference:

- collision = floor contact OR self-collision OR obstacle contact
  (reference ``panda.py:453-481``; here via the native distance fields);
- success = EE within 0.125 m of the current goal (``panda.py:489``);
- reward ``-gain/(dist+eps)``, ``+1e2`` on contact (``panda.py:648-656``);
- ring buffer snapshots at t==1, every 50 steps, and on terminal events
  (``panda.py:584-646``).

The planner itself never steps this env (same as the reference examples); it
exists for closed-loop evaluation and success-rate measurement.
"""

from __future__ import annotations

import time
from copy import copy
from typing import Union

import numpy as np

import jax.numpy as jnp

from stoch_gpmp_tpu.costs.fields import LinkDistanceField, LinkSelfDistanceField
from stoch_gpmp_tpu.envs.objects import Panda, Sphere

BOX_SCALE = 0.3
BOX_CENTER = 0.5
SPHERE_SCALE = {"MIN": 0.08, "MAX": 0.1}
SPHERE_VELOCITY = {"MIN": 0.0, "MAX": 0.1}

_SPHERE_MIN = np.array(
    [BOX_CENTER - 0.6 * BOX_SCALE, -abs(BOX_CENTER - 0.5 * BOX_SCALE), 0.05]
)
_SPHERE_MAX = np.array(
    [BOX_CENTER + 0.6 * BOX_SCALE, abs(BOX_CENTER - 0.5 * BOX_SCALE), 0.5]
)


def random_init_static_sphere(
    scale_min: float,
    scale_max: float,
    base_position_min: np.ndarray,
    base_position_max: np.ndarray,
    base_offset: float,
    rng: np.random.Generator | None = None,
) -> tuple:
    """Random radius + position inside the spawn box (reference
    ``panda.py:42-66`` semantics, explicit rng)."""
    r = rng if rng is not None else np.random
    alpha_scale = r.uniform()
    scale = alpha_scale * scale_min + (1 - alpha_scale) * scale_max

    idx = r.permutation([1, 0, 0])
    base_position = r.random(3) if rng is not None else np.random.rand(3)
    alpha = r.random(1) if rng is not None else np.random.rand(1)
    base_position[idx == 1] = (
        alpha * base_position_min[idx == 1] + (1 - alpha) * base_position_max[idx == 1]
    )
    signs = (r.integers(2, size=2) if rng is not None else np.random.randint(2, size=2))
    base_position[:-1] *= signs * 2 - 1
    base_position = np.sign(base_position) * np.clip(
        np.abs(base_position), a_min=base_offset, a_max=base_position_max
    )
    return scale, base_position


def update_linear_velocity_sphere(
    base_position: Union[np.ndarray, list],
    base_linear_velocity: Union[np.ndarray, list],
    base_position_min: np.ndarray,
    base_position_max: np.ndarray,
    z_offset: float,
) -> tuple:
    """Bounce a sphere off its min/max box walls and the floor (reference
    ``panda.py:69-105``)."""
    base_position = np.asarray(base_position, dtype=float)
    base_linear_velocity = np.asarray(base_linear_velocity, dtype=float)
    pos = base_position.copy()
    vel = base_linear_velocity.copy()

    ratios_min = np.abs(base_position) / base_position_min
    ratios_max = np.abs(base_position) / base_position_max
    if np.max(ratios_min) <= 1 or np.max(ratios_max) >= 1:
        if np.max(ratios_min) <= 1:
            idx = int(np.argmin(1 - ratios_min))
            pos[idx] = np.sign(pos[idx]) * base_position_min[idx]
            vel[idx] = -vel[idx]
        else:
            idx = int(np.argmax(ratios_max - 1))
            pos[idx] = np.sign(pos[idx]) * base_position_max[idx]
            vel[idx] = -vel[idx]

    if pos[-1] <= z_offset:
        pos[-1] = z_offset
        vel[-1] = abs(vel[-1])
    return pos, vel


def update_linear_velocity_sphere_simple(
    scale: float,
    base_position: Union[np.ndarray, list],
    base_linear_velocity: Union[np.ndarray, list],
    base_position_min: np.ndarray,
    base_position_max: np.ndarray,
    shift_order: list,
    loc: str = None,
) -> tuple:
    """Quadrant-aware wall bounce — the variant the reference's ``step``
    actually calls (``panda.py:419``, body at ``panda.py:106-246``).

    ``shift_order = [location, order]``: ``location`` picks the quadrant
    (0=north, 1=east, 2=south, 3=west) and ``order`` its half-band. Reference
    quirks preserved exactly: the cross-axis flip probes at east/south
    (``panda.py:155-157, 201-203`` test ``pos[1]``/``pos[0]`` for the other
    axis's flip), and east ``order==1`` testing ``min[1]-scale`` where the
    clip uses ``max[1]-scale`` (``panda.py:174-180``). All flip conditions
    read the ORIGINAL position; clips likewise apply to the original.
    """
    del loc  # unused in the reference too
    pos0 = np.asarray(base_position, dtype=float)
    vel0 = np.asarray(base_linear_velocity, dtype=float)
    pos, vel = pos0.copy(), vel0.copy()
    mn = np.asarray(base_position_min, dtype=float)
    mx = np.asarray(base_position_max, dtype=float)
    location, order = shift_order

    def bounce(axis, clip_lo, clip_hi, flip_hi=None, hi_idx=None):
        # flip the velocity when the (possibly cross-axis) probe leaves the
        # (possibly different) flip band; clip the position to the band
        flip_hi = clip_hi if flip_hi is None else flip_hi
        hi_idx = axis if hi_idx is None else hi_idx
        if pos0[axis] < clip_lo or pos0[hi_idx] > flip_hi:
            vel[axis] = -vel0[axis]
        pos[axis] = np.clip(pos0[axis], clip_lo, clip_hi)

    neg_half = (mn[1] + scale, -scale)  # [-wall, 0) band along the swept axis
    pos_half = (scale, mx[1] - scale)  # (0, +wall] band
    span = (mn[0] + scale, mx[0] - scale)  # full cross band
    mirrored = (-(mx[0] - scale), -(mn[0] + scale))

    if location == 0:  # north
        bounce(0, *(neg_half if order == 0 else pos_half))
        bounce(1, *span)
    elif location == 1:  # east
        bounce(0, *mirrored, hi_idx=1)  # quirk: probes pos[1] for the flip
        if order == 0:
            bounce(1, *neg_half)
        else:  # quirk: flip band max[1]-scale -> min[1]-scale mismatch
            bounce(1, scale, mx[1] - scale, flip_hi=mn[1] - scale)
    elif location == 2:  # south
        bounce(0, *(pos_half if order == 0 else neg_half))
        bounce(1, *mirrored, hi_idx=0)  # quirk: probes pos[0] for the flip
    else:  # west
        bounce(0, *span)
        bounce(1, *(pos_half if order == 0 else neg_half))
    bounce(2, mn[2] + scale, mx[2] - scale)
    return pos, vel


class PandaEnv:
    """Gym-like closed-loop environment (reference ``panda.py:249-684``)."""

    def __init__(self, render: bool = False, goal_offset: float = 0.08, **kwargs):
        # ``render=True``: native visualization mode (the reference attaches
        # a PyBullet GUI, ``panda.py:518-527``). Headless-native equivalent:
        # every step records a light frame (arm skeleton, spheres, goal,
        # contact flag); ``render_frame(ax)`` draws one 3D matplotlib view
        # and ``save_animation(path)`` writes the episode as a GIF.
        # ``render="live"`` additionally redraws a persistent matplotlib 3D
        # figure every ``live_render_every`` steps as the sim advances — the
        # native analogue of the reference's live GUI window (interactive
        # backends show it; headless Agg just redraws offscreen, so the mode
        # is safe — and tested — without a display). The simulation itself
        # is identical with render on/off.
        self.render_mode = bool(render)
        self._live_render = render == "live"
        self._live_every = int(kwargs.get("live_render_every", 1))
        self._live_ax = None
        self._frames = []
        self._max_frames = int(kwargs.get("max_render_frames", 2000))
        self._seed = kwargs.get("seed", None)
        self.t_step = 0
        self._t_start = time.time()
        self._t_H = kwargs.get("horizon", 10000)
        self._frequency = kwargs.get("frequency", 10)
        self.realtime = kwargs.get("realtime", False)
        self._dt_sim = kwargs.get("dt_sim", 1.0 / 240.0)

        self.a_t = None
        self.s_t = None
        self._s_T = [None, None]
        self._goal_offset = np.array([0.0, 0.0, goal_offset])
        self._goal_idx = 0
        self.goal_reached = [False, False]
        self.is_contact = False
        self._done = False

        self.num_obst = kwargs.get("num_obst", 2)
        self.max_obs_dist = kwargs.get("max_obs_dist", 0.0)
        self.max_floor_dist = kwargs.get("max_floor_dist", 0.0)
        self.motion_obstacles = kwargs.get("motion_obstacles", 0)
        # Quadrant/half-band for the dynamic-sphere bounce. The reference's
        # step reads self.shift/self.order (panda.py:437) without ever
        # defining them — a latent AttributeError on its dynamic path; we
        # surface them as kwargs with benign defaults.
        self.shift = kwargs.get("shift", 0)
        self.order = kwargs.get("order", 0)

        self._buffer_goal_counter = 1
        self._max_buffer_len = int(kwargs.get("buffer_length", 1000))
        self._init_buffer()

        # ``physics="dynamics"``: the arm's position targets drive a
        # computed-torque PD motor over the native rigid-body forward
        # dynamics (RNEA) — the closest native analogue of the reference's
        # bullet POSITION_CONTROL + stepSimulation. ``"kinematic"`` (default)
        # is the fast velocity-limited tracker.
        physics = kwargs.get("physics", "kinematic")
        if physics not in ("kinematic", "dynamics"):
            raise ValueError(f"unknown physics mode: {physics!r}")
        self.panda = Panda(use_dynamics=(physics == "dynamics"))
        self._self_field = LinkSelfDistanceField(margin=0.03)
        self._obst_field = LinkDistanceField()
        # Obstacle contact is checked on link origins PLUS interpolated
        # points along the long forearm segments (the reference's bullet
        # ``getClosestPoints`` sees whole meshes, not frame origins;
        # interpolation range mirrors the reference field default
        # ``link_interpolate_range=[5, 7]``, fields.py:32).
        self._contact_interpolate = int(kwargs.get("contact_interpolate", 2))
        # contact geometry: 'spheres' (default) checks a 92-sphere
        # decomposition of the ACTUAL collision meshes the reference's
        # getClosestPoints uses (kinematics/panda_collision.py — every
        # sampled mesh-surface point lies inside a sphere, so this check
        # over-approximates mesh contact); 'points' is the legacy
        # origin+interpolation check. Both verdicts are recorded per step in
        # ``contact_verdicts`` for A/B comparison.
        self._contact_model = kwargs.get("contact_model", "spheres")
        if self._contact_model not in ("spheres", "points"):
            raise ValueError(f"unknown contact_model: {self._contact_model!r}")
        from stoch_gpmp_tpu.kinematics.panda_collision import (
            PANDA_COLLISION_SPHERES,
        )

        names = list(self.panda.chain.link_names)
        self._mesh_spheres = []  # (frame idx | None=world/base, centers, radii)
        for frame, sph in PANDA_COLLISION_SPHERES.items():
            idx = names.index(frame) if frame in names else None
            self._mesh_spheres.append(
                (idx, np.asarray(sph[:, :3]), np.asarray(sph[:, 3]))
            )
        # base/link1 column spheres legitimately rest at the floor (the
        # reference's floor check allows the single standing contact point)
        self._floor_exempt_frames = {None, names.index("panda_link1")}
        # Flat per-sphere frame index (-1 = world-fixed base spheres, never
        # deflected) and local centers, for the contact-deflection Jacobians.
        self._mesh_sphere_frames = np.concatenate([
            np.full(len(r), -1 if idx is None else idx, dtype=int)
            for idx, _, r in self._mesh_spheres
        ])
        self._mesh_sphere_locals = np.concatenate(
            [c for _, c, _ in self._mesh_spheres]
        )
        # Terminal-step contact deflection (reference panda.py:443,453-481):
        # bullet's solver blocks the position-controlled arm at the contact,
        # so the RECORDED state on the episode-ending step is the deflected
        # pose, not the commanded one. Default ON; resolves to a bullet-like
        # linear slop so the contact flag still trips at the defaults.
        self._contact_deflection = bool(kwargs.get("contact_deflection", True))
        self._contact_slop = float(kwargs.get("contact_slop", 1e-3))
        self._fk_jac = None  # lazily-jitted d(link_poses)/dq
        self.contact_verdicts = {"spheres": False, "points": False}
        self._obstacles = {"spheres": [], "boxes": []}
        self._rng = np.random.default_rng(self._seed)
        self._init_spheres()

    # ------------------------------------------------------------------ #
    @property
    def buffer(self):
        return self._buffer[: self._buffer_idx]

    @property
    def obstacles(self):
        return self._obstacles

    @property
    def spheres(self):
        return self._obstacles.get("spheres", [])

    @property
    def boxes(self):
        return self._obstacles.get("boxes", [])

    @property
    def done(self):
        return self._done

    @property
    def s_T(self):
        if self._s_T[self._goal_idx] is not None:
            return np.asarray(self._s_T[self._goal_idx])[None, None, :]
        return self._s_T[self._goal_idx]

    def set_goals(self, goals):
        """Set the (up to two) EE goal positions the reference leaves to the
        caller via ``_s_T``."""
        goals = list(goals)
        self._s_T = [np.asarray(g, dtype=float) if g is not None else None for g in goals]
        while len(self._s_T) < 2:
            self._s_T.append(None)

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)
        return [seed]

    def not_t_horizon(self):
        if self.realtime:
            return abs(time.time() - self._t_start) < self._t_H
        return self.t_step < self._t_H

    # ------------------------------------------------------------------ #
    def _spawn_sphere_params(self):
        return random_init_static_sphere(
            scale_min=SPHERE_SCALE["MIN"],
            scale_max=SPHERE_SCALE["MAX"],
            base_position_min=_SPHERE_MIN,
            base_position_max=_SPHERE_MAX,
            base_offset=0.0,
            rng=self._rng,
        )

    def _init_spheres(self):
        if self.motion_obstacles == 0:
            roles = np.zeros(self.num_obst, dtype=int)
        elif self.motion_obstacles == 1:
            roles = np.ones(self.num_obst, dtype=int)
        else:
            roles = self._rng.integers(0, 2, size=self.num_obst)
        spheres = []
        for role in roles:
            scale, pos = self._spawn_sphere_params()
            vel = np.zeros(3)
            if role == 1:
                vel = self._rng.uniform(
                    SPHERE_VELOCITY["MIN"], SPHERE_VELOCITY["MAX"], 3
                )
            spheres.append(
                Sphere(base_position=pos, base_linear_velocity=vel, scale=scale, role=int(role))
            )
        self._obstacles["spheres"] = spheres

    def reset(self, seed=None):
        seed = self._seed if seed is None else seed
        self.seed(seed=seed)
        self.panda.reset()
        for sphere in self.spheres:
            scale, pos = self._spawn_sphere_params()
            sphere.init_base_position = pos
            if sphere.role == 0:
                sphere.init_base_linear_velocity = np.zeros(3)
            else:
                sphere.init_base_linear_velocity = self._rng.uniform(
                    SPHERE_VELOCITY["MIN"], SPHERE_VELOCITY["MAX"], 3
                )
            sphere.reset()

        obs_state = self._state_obstacles()
        self._goal_idx = 0
        self.goal_reached = [False, False]
        self.is_contact = False
        self._done = False
        self.t_step = 0
        self._t_start = time.time()
        self.s_t = [np.array(self.panda.getJointStates()).reshape(1, 1, -1), obs_state]
        self._init_buffer()
        self._frames = []
        self._record_frame()
        return self.s_t

    def step(self, a_t=None):
        self.t_step += 1
        if a_t is None:
            a_t = np.array(self.panda.q)
        self.panda.setTargetPositions(np.asarray(a_t).squeeze())

        # Bounce dynamic spheres ONCE per env step, before the substep
        # integration — the reference's step order (panda.py:409-443: bounce
        # and write-back, then stepSimulation x frequency) with the variant
        # its step actually calls (panda.py:419).
        for sphere in self.spheres:
            if sphere.role == 1:
                pos, vel = update_linear_velocity_sphere_simple(
                    scale=sphere.scale,
                    base_position=sphere.base_position,
                    base_linear_velocity=sphere.base_linear_velocity,
                    base_position_min=_SPHERE_MIN,
                    base_position_max=_SPHERE_MAX,
                    shift_order=[self.shift, self.order],
                )
                sphere.base_position, sphere.base_linear_velocity = pos, vel

        dt = self._dt_sim
        for _ in range(self._frequency):
            self.panda.step(dt)
            for sphere in self.spheres:
                if sphere.role == 1:
                    sphere.integrate(dt)
        self._resolve_obstacle_contacts()
        lp = self._deflect_arm_contacts()  # FK of the (possibly deflected)
        # pose, computed once and shared with the contact check below

        self.s_t = [
            np.array(self.panda.getJointStates()).reshape(1, 1, -1).copy(),
            self._state_obstacles().copy(),
        ]
        self.a_t = np.asarray(a_t).copy()
        self.is_contact = self._check_contact(link_poses=lp)

        # goal-reach check (reference panda.py:484-491)
        if self.s_T is not None:
            ee_pos, _ = self.panda.getEEPositionAndOrientation()
            dist2goal = float(np.sqrt(np.sum((ee_pos - self.s_T.squeeze()) ** 2)))
            self.goal_reached[self._goal_idx] = dist2goal < 0.125
            if self.goal_reached[0] and self._goal_idx == 0:
                self._goal_idx = 1

        if self.is_contact or all(self.goal_reached):
            self._done = True

        costs = self.cost_function()
        self._update_buffer()
        self._record_frame()
        return (
            self.s_t,
            costs,
            self.done,
            [self.s_T, self.goal_reached, self.is_contact],
        )

    def close(self):
        pass

    # ------------------------------------------------------------------ #
    # Native visualization (the reference's ``render=True`` attaches a
    # PyBullet GUI, ``panda.py:518-527``; headless-native equivalent).
    @property
    def frames(self):
        """Recorded render frames (``render=True`` only)."""
        return self._frames

    def _record_frame(self):
        if not self.render_mode or len(self._frames) >= self._max_frames:
            return
        lp = self.panda.link_poses()
        goal = self.s_T
        self._frames.append({
            "skeleton": lp[:, :3, 3].copy(),
            "spheres": [
                (np.asarray(s.base_position, dtype=float).copy(),
                 float(s.scale), int(s.role or 0))
                for s in self.spheres
            ],
            "goal": None if goal is None else np.asarray(goal).reshape(3).copy(),
            "t": self.t_step,
            "contact": bool(self.is_contact),
            "reached": list(self.goal_reached),
        })
        if self._live_render and self.t_step % self._live_every == 0:
            self._draw_live()

    def _draw_live(self):
        """Redraw the persistent live figure from the latest frame (the
        reference's GUI shows the bullet world continuously,
        ``panda.py:518-527``; this is the native window). Uses whatever
        matplotlib backend is active: interactive backends display and
        update a window via ``plt.pause``; Agg redraws offscreen."""
        import matplotlib.pyplot as plt

        if self._live_ax is None:
            fig = plt.figure(figsize=(6, 6))
            self._live_ax = fig.add_subplot(projection="3d")
            if plt.isinteractive() or plt.get_backend().lower() != "agg":
                plt.ion()
        self._live_ax.cla()
        self.render_frame(ax=self._live_ax)
        fig = self._live_ax.figure
        fig.canvas.draw_idle()
        if plt.get_backend().lower() != "agg":
            plt.pause(1e-3)

    def render_frame(self, ax=None, frame=None):
        """Draw one recorded frame (default: the latest) as a 3D view: arm
        skeleton polyline, obstacle spheres (static red / dynamic dark red,
        the reference's GUI colors, ``objects.py:126-129``), current goal
        star. Returns the axis."""
        import matplotlib.pyplot as plt

        if frame is None:
            if not self._frames:
                raise ValueError("no frames recorded (construct with render=True)")
            frame = self._frames[-1]
        if ax is None:
            fig = plt.figure(figsize=(6, 6))
            ax = fig.add_subplot(projection="3d")
        sk = frame["skeleton"]
        ax.plot(sk[:, 0], sk[:, 1], sk[:, 2], "o-", color="tab:blue",
                lw=2.5, ms=3)
        u = np.linspace(0, 2 * np.pi, 12)
        v = np.linspace(0, np.pi, 7)
        cu, su = np.cos(u), np.sin(u)
        sv, cv = np.sin(v), np.cos(v)
        for pos, r, role in frame["spheres"]:
            color = (1.0, 0.0, 0.0) if role == 0 else (0.5, 0.0, 0.0)
            ax.plot_surface(
                pos[0] + r * np.outer(cu, sv),
                pos[1] + r * np.outer(su, sv),
                pos[2] + r * np.outer(np.ones_like(u), cv),
                color=color, alpha=0.35, linewidth=0,
            )
        if frame["goal"] is not None:
            g = frame["goal"]
            ax.plot([g[0]], [g[1]], [g[2]], "g*", markersize=12)
        ax.set_xlim(-0.9, 0.9)
        ax.set_ylim(-0.9, 0.9)
        ax.set_zlim(0.0, 1.2)
        ax.set_box_aspect((1, 1, 2.0 / 3.0))
        status = "CONTACT" if frame["contact"] else (
            "reached" if all(frame["reached"]) else ""
        )
        ax.set_title(f"t={frame['t']} {status}".rstrip())
        return ax

    def save_animation(self, path, fps=20, stride=1):
        """Write the recorded episode as a GIF (``render=True`` episodes)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation, PillowWriter

        frames = self._frames[:: max(1, int(stride))]
        if not frames:
            raise ValueError("no frames recorded (construct with render=True)")
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")

        def draw(i):
            ax.cla()
            self.render_frame(ax=ax, frame=frames[i])

        anim = FuncAnimation(fig, draw, frames=len(frames))
        anim.save(path, writer=PillowWriter(fps=fps))
        plt.close(fig)
        return path

    # ------------------------------------------------------------------ #
    def _deflect_arm_contacts(self):
        """Record the arm DEFLECTED by static contacts, as bullet does on the
        episode-ending step (reference ``panda.py:443,453-481``: the
        position-controlled arm is blocked by the constraint solver, so
        ``getJointStates()`` on the contact step reflects the blocked pose,
        not the commanded one — the one residual fidelity delta in
        docs/COMPONENT_MAP.md).

        Native model: resolve geometric penetration of the mesh-decomposition
        collision spheres against STATIC obstacle spheres and the floor with
        damped-least-squares joint corrections along each contact normal
        (worst contact first, a few Gauss-Seidel passes), then remove the
        joint-velocity component approaching each resolved contact.
        Penetration is resolved to ``contact_slop`` (bullet's ~1e-3 m linear
        slop), so the contact FLAG — ``getClosestPoints`` distance <
        ``max_obs_dist`` (0 at the defaults, i.e. it trips at penetration) —
        still trips and the episode still ends (``panda.py:494``); only the
        recorded terminal state changes. Self-collision stays flag-only
        (bullet also deflects there; not modeled — documented). Dynamic
        spheres (extension mode) are handled by
        ``_resolve_obstacle_contacts`` instead: they move, the arm doesn't.

        Returns the link poses of the (possibly deflected) final joint
        state, so the caller's contact check reuses the FK instead of
        recomputing it.
        """
        if not self._contact_deflection:
            return self.panda.link_poses()
        static = [s for s in self.spheres if s.role == 0]
        slop = self._contact_slop
        obst = (
            np.stack([np.concatenate([s.base_position, [s.scale]])
                      for s in static])
            if static else None
        )
        q = np.asarray(self.panda.q, dtype=float)
        resolved = []  # (jn [ndof], denom) per handled contact normal
        for _ in range(8):
            link_poses = self.panda.chain.fk(jnp.asarray(q))
            link_poses = np.asarray(link_poses)
            cw, rw, fmask = self._world_collision_spheres(link_poses)
            movable = self._mesh_sphere_frames >= 0

            # deepest geometric penetration across obstacle + floor contacts
            best = (slop, None, None)  # (pen, sphere idx, normal)
            if obst is not None:
                vec = cw[:, None, :] - obst[None, :, :3]  # away from obstacle
                dist = np.linalg.norm(vec, axis=-1)
                pen = rw[:, None] + obst[None, :, 3] - dist
                pen[~movable] = -np.inf
                i, j = np.unravel_index(np.argmax(pen), pen.shape)
                if pen[i, j] > best[0] and dist[i, j] > 1e-9:
                    best = (pen[i, j], i, vec[i, j] / dist[i, j])
            pen_floor = rw - cw[:, 2]
            pen_floor[~(fmask & movable)] = -np.inf
            i = int(np.argmax(pen_floor))
            if pen_floor[i] > best[0]:
                best = (pen_floor[i], i, np.array([0.0, 0.0, 1.0]))
            if best[1] is None:
                break

            pen, i, n = best
            if self._fk_jac is None:
                import jax

                self._fk_jac = jax.jit(jax.jacfwd(self.panda.chain.fk))
            jac_all = np.asarray(self._fk_jac(jnp.asarray(q)))
            f = int(self._mesh_sphere_frames[i])
            c_loc = self._mesh_sphere_locals[i]
            jc = (
                np.einsum("abn,b->an", jac_all[f, :3, :3, :], c_loc)
                + jac_all[f, :3, 3, :]
            )  # [3, ndof]
            jn = n @ jc
            denom = float(jn @ jn) + 1e-8
            q = np.clip(
                q + jn * ((pen - slop) / denom),
                self.panda.jl_lower, self.panda.jl_upper,
            )
            resolved.append((jn, denom))

        if not resolved:
            return link_poses  # current with q: no correction was applied
        self.panda.q = q
        if self.panda.gripper:
            m = 0.5 * (self.panda.q[7] + self.panda.q[8])
            self.panda.q[7] = self.panda.q[8] = m
        # inelastic: remove the approach velocity along each resolved normal
        dq = np.asarray(self.panda.dq, dtype=float)
        for jn, denom in resolved:
            vn = float(jn @ dq)
            if vn < 0.0:
                dq = dq - jn * (vn / denom)
        self.panda.dq = dq
        # contact step only: one extra FK so the caller checks the
        # DEFLECTED pose (the loop's last link_poses can be one
        # correction stale on loop exhaustion)
        return self.panda.link_poses()

    def _resolve_obstacle_contacts(self):
        """Keep DYNAMIC spheres from interpenetrating the arm: a penetrating
        sphere is pushed out along the contact normal with its approaching
        velocity removed (inelastic vs an effectively infinitely-stiff
        position-controlled arm).

        This applies only to the moving-obstacle EXTENSION mode
        (``motion_obstacles != 0``), which has no runnable reference
        counterpart to be parity with: the reference's dynamic path raises
        ``AttributeError`` (``panda.py:437`` reads undefined
        ``self.shift``/``self.order``), and its spheres are static bullet
        bodies regardless (``useFixedBase=True`` single-link URDF,
        ``objects.py:171-179`` — ``stepSimulation`` never moves a mass-0
        body, so no contact impulse can reach a sphere; see
        docs/COMPONENT_MAP.md "Simulated-world fidelity audit"). In the
        reference-parity regime (``motion_obstacles == 0``, the closed-loop
        success suite) this method is a structural no-op — no role-1
        spheres exist. Contact FLAG semantics are unchanged (contact still
        ends the episode, reference ``panda.py:494``)."""
        dyn = [s for s in self.spheres if s.role == 1]
        if not dyn:
            return
        cw, rw, _ = self._world_collision_spheres(self.panda.link_poses())
        for s in dyn:
            vec = s.base_position - cw  # [N, 3] from arm spheres to obstacle
            dist = np.linalg.norm(vec, axis=-1)
            pen = rw + s.scale - dist
            worst = int(np.argmax(pen))
            if pen[worst] > 0.0 and dist[worst] > 1e-9:
                n = vec[worst] / dist[worst]
                s.base_position = s.base_position + n * pen[worst]
                vn = float(np.dot(s.base_linear_velocity, n))
                if vn < 0.0:
                    s.base_linear_velocity = s.base_linear_velocity - vn * n

    def _world_collision_spheres(self, link_poses):
        """Mesh-decomposition spheres in world frame: ``(centers [N, 3],
        radii [N], floor_check_mask [N])``."""
        cs, rs, fm = [], [], []
        for idx, c, r in self._mesh_spheres:
            if idx is None:
                cs.append(c)
            else:
                h = link_poses[idx]
                cs.append(c @ h[:3, :3].T + h[:3, 3])
            rs.append(r)
            fm.append(
                np.full(len(r), idx not in self._floor_exempt_frames)
            )
        return np.concatenate(cs), np.concatenate(rs), np.concatenate(fm)

    def _check_contact(self, link_poses=None) -> bool:
        """Contact vs floor / self / obstacles (reference ``panda.py:453-481``
        getClosestPoints semantics). Computes BOTH geometry models (mesh-
        sphere decomposition and legacy origin points) into
        ``contact_verdicts`` and returns the configured one.

        ``link_poses``: precomputed FK of the current joint state (the step
        path shares the deflection pass's FK); None recomputes."""
        if link_poses is None:
            link_poses = self.panda.link_poses()  # [L, 4, 4]
        self_hit = bool(self._self_field.compute_collision(
            jnp.asarray(link_poses)[None], buffer=0.05
        )[0])
        obst = (
            np.stack([
                np.concatenate([s.base_position, [s.scale]])
                for s in self.spheres
            ])
            if self.spheres else None
        )

        # --- legacy point model: link origins + interpolated forearm points
        pts_floor = bool(
            np.any(link_poses[2:, 2, 3] <= self.max_floor_dist)
        )
        pts_obst = False
        if obst is not None:
            pts = link_poses[:, :3, 3]  # [L, 3]
            if self._contact_interpolate > 0:
                from stoch_gpmp_tpu.costs.fields import _interpolate_links

                pts = np.asarray(
                    _interpolate_links(
                        jnp.asarray(pts), self._contact_interpolate, (5, 7)
                    )
                )
            d = (
                np.linalg.norm(pts[:, None, :] - obst[None, :, :3], axis=-1)
                - obst[None, :, 3]
            )
            pts_obst = bool(np.any(d < self.max_obs_dist + 0.02))
        self.contact_verdicts["points"] = pts_floor or self_hit or pts_obst

        # --- mesh-sphere model: the collision-mesh decomposition
        cw, rw, fmask = self._world_collision_spheres(link_poses)
        sph_floor = bool(
            np.any(cw[fmask, 2] - rw[fmask] <= self.max_floor_dist)
        )
        sph_obst = False
        if obst is not None:
            d = (
                np.linalg.norm(cw[:, None, :] - obst[None, :, :3], axis=-1)
                - rw[:, None]
                - obst[None, :, 3]
            )
            sph_obst = bool(np.any(d < self.max_obs_dist))
        self.contact_verdicts["spheres"] = sph_floor or self_hit or sph_obst

        return self.contact_verdicts[self._contact_model]

    def cost_function(self) -> np.ndarray:
        gain = 1e2
        eps = 1e-6
        if self.s_T is None:
            return np.asarray(0.0)
        ee_position = self.panda.getEEPositionAndOrientation()[0]
        dist2goal = np.sqrt(np.sum((ee_position - self.s_T.squeeze()) ** 2))
        costs = -gain / (dist2goal + eps)
        return np.where(self.is_contact, np.ones_like(costs) * 1e2, costs)

    def _state_obstacles(self) -> np.ndarray:
        if not self.spheres:
            return np.zeros((1, 0, 7))
        return np.concatenate(
            (
                np.array([s.base_position for s in self.spheres]),
                np.array([s.base_linear_velocity for s in self.spheres]),
                np.array([s.scale for s in self.spheres])[:, None],
            ),
            axis=-1,
        )[None, :]

    # --- trajectory ring buffer (reference panda.py:584-646) ----------- #
    def _init_buffer(self):
        self._buffer_idx = 0
        self._buffer = [dict() for _ in range(self._max_buffer_len)]

    def _snapshot(self, t):
        return {
            "s_robot": self.s_t[0].copy(),
            "a_robot": self.a_t.copy() if self.a_t is not None else None,
            "s_obs": self.s_t[1].copy(),
            "s_goal": self.s_T.copy() if self.s_T is not None else None,
            "is_contact": copy(self.is_contact),
            "goal_reached": copy(self.goal_reached),
            "time_horizon": copy(not self.not_t_horizon()),
            "time": t,
        }

    def _update_buffer(self):
        if self.t_step == 1:
            self._buffer[self._buffer_idx].update(self._snapshot(self.t_step - 1))
            self._buffer_idx += 1
        if self.t_step % 50 == 0:
            self._buffer[self._buffer_idx].update(self._snapshot(self.t_step))
            self._buffer_idx += 1
        if (
            self.is_contact
            or (sum(self.goal_reached) == self._buffer_goal_counter)
            or not self.not_t_horizon()
        ):
            self._buffer[self._buffer_idx].update(self._snapshot(self.t_step))
            self._buffer_idx += 1
            if sum(self.goal_reached) == self._buffer_goal_counter:
                self._buffer_goal_counter += 1
        if self._buffer_idx >= self._max_buffer_len:
            self._buffer_idx = 0


if __name__ == "__main__":
    # Smoke sim loop (reference ``envs/panda.py:680-684`` runs an unbounded
    # rendered loop; here bounded and headless).
    env = PandaEnv(render=True, num_obst=3, seed=0, motion_obstacles=2)
    env.reset()
    for _ in range(200):
        env.step()
    print(
        f"t={env.t_step} contact={env.is_contact} "
        f"spheres={[list(np.round(s.base_position, 3)) for s in env.spheres]}"
    )
