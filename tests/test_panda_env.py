"""Closed-loop kinematic PandaEnv."""

import numpy as np

from stoch_gpmp_tpu.envs.panda_env import (
    PandaEnv,
    random_init_static_sphere,
    update_linear_velocity_sphere,
)


def test_reset_returns_state():
    env = PandaEnv(num_obst=3, seed=0)
    s = env.reset()
    joint_state, obs_state = s
    assert joint_state.shape == (1, 1, 14)  # 7 pos + 7 vel
    assert obs_state.shape == (1, 3, 7)  # pos(3) + vel(3) + radius(1)
    radii = obs_state[0, :, 6]
    assert np.all((radii >= 0.08) & (radii <= 0.1))


def test_reset_is_seeded():
    env1 = PandaEnv(num_obst=3, seed=42)
    env2 = PandaEnv(num_obst=3, seed=42)
    s1 = env1.reset(seed=42)
    s2 = env2.reset(seed=42)
    np.testing.assert_array_equal(s1[1], s2[1])


def test_step_tracks_targets_and_reaches_goal():
    env = PandaEnv(num_obst=0, seed=0, frequency=24, horizon=5000)
    env.reset()
    # target = EE position of a nearby configuration; command it and check
    # goal-reach triggers
    q_target = env.panda.q + np.array([0.2, -0.1, 0.1, 0.1, 0.0, -0.1, 0.0])
    env.panda.setTargetPositions(q_target)
    import jax.numpy as jnp

    ee_target = np.asarray(env.panda.chain.ee_pose(jnp.asarray(q_target)))[:3, 3]
    env.set_goals([ee_target, ee_target + np.array([0.0, 0.0, 10.0])])
    for _ in range(200):
        s, cost, done, info = env.step(q_target)
        if done:
            break
    assert env.goal_reached[0], (env.panda.q, q_target)
    assert float(cost) < 0  # reward is -gain/dist when no contact
    # arm actually tracked the commanded positions
    np.testing.assert_allclose(env.panda.q, q_target, atol=1e-6)


def test_contact_detection_with_sphere_on_arm():
    env = PandaEnv(num_obst=1, seed=0)
    env.reset()
    # place the obstacle right on the end-effector
    ee, _ = env.panda.getEEPositionAndOrientation()
    env.spheres[0].base_position = ee.copy()
    env.spheres[0].scale = 0.1
    env.set_goals([ee + np.array([1.0, 0, 0]), None])
    _, cost, done, info = env.step()
    assert env.is_contact and done
    assert float(cost) == 1e2  # contact penalty


def test_buffer_snapshots():
    env = PandaEnv(num_obst=0, seed=0, horizon=200)
    env.reset()
    env.set_goals([np.array([10.0, 10, 10]), None])  # unreachable
    for _ in range(100):
        env.step()
    # snapshots at t==1, t==50, t==100
    assert len(env.buffer) == 3
    assert env.buffer[0]["time"] == 0
    assert env.buffer[1]["time"] == 50


def test_sphere_bounce():
    pos, vel = update_linear_velocity_sphere(
        np.array([0.9, 0.0, 0.3]),
        np.array([0.1, 0.0, 0.0]),
        np.array([0.3, -0.35, 0.05]),
        np.array([0.68, 0.35, 0.5]),
        z_offset=0.1,
    )
    assert vel[0] == -0.1  # bounced off the +x wall
    # floor clamp
    pos2, vel2 = update_linear_velocity_sphere(
        np.array([0.5, 0.2, 0.05]),
        np.array([0.0, 0.0, -0.2]),
        np.array([0.3, -0.35, 0.01]),
        np.array([0.68, 0.35, 0.5]),
        z_offset=0.1,
    )
    assert pos2[-1] == 0.1 and vel2[-1] == 0.2


def test_random_sphere_in_bounds():
    rng = np.random.default_rng(0)
    lo = np.array([0.3, -0.35, 0.05])
    hi = np.array([0.68, 0.35, 0.5])
    for _ in range(20):
        scale, pos = random_init_static_sphere(0.08, 0.1, lo, hi, 0.0, rng=rng)
        assert 0.08 <= scale <= 0.1
        assert np.all(np.abs(pos) <= hi + 1e-12)


def _load_reference_simple_bounce():
    """Extract the reference's update_linear_velocity_sphere_simple without
    importing its module (which requires pybullet)."""
    import ast
    import pathlib

    src = pathlib.Path("/root/reference/stoch_gpmp/envs/panda.py").read_text()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef)
        and n.name == "update_linear_velocity_sphere_simple"
    )
    import typing

    ns = {"np": np, "Union": typing.Union}
    exec(compile(ast.Module([fn], []), "<ref>", "exec"), ns)
    return ns["update_linear_velocity_sphere_simple"]


def test_simple_bounce_parity_vs_reference():
    """Bit-level parity of the quadrant bounce (the variant the reference's
    step calls, panda.py:419) on random states across all quadrant/half
    combinations — quirks included."""
    import pytest

    try:
        ref_fn = _load_reference_simple_bounce()
    except (OSError, StopIteration):
        pytest.skip("reference checkout unavailable")
    from stoch_gpmp_tpu.envs.panda_env import (
        update_linear_velocity_sphere_simple as ours,
    )

    rng = np.random.default_rng(123)
    mn = np.array([0.3 - 0.18, -0.35, 0.05])
    mx = np.array([0.3 + 0.18, 0.35, 0.5])
    for _ in range(200):
        scale = float(rng.uniform(0.05, 0.12))
        pos = rng.uniform(-0.8, 0.8, 3)
        pos[2] = rng.uniform(-0.1, 0.7)
        vel = rng.uniform(-0.3, 0.3, 3)
        location = int(rng.integers(0, 4))
        order = int(rng.integers(0, 2))
        p_ref, v_ref = ref_fn(
            scale, pos.copy(), vel.copy(), mn, mx, [location, order]
        )
        p_ours, v_ours = ours(
            scale, pos.copy(), vel.copy(), mn, mx, [location, order]
        )
        np.testing.assert_array_equal(p_ref, p_ours, err_msg=f"{location},{order}")
        np.testing.assert_array_equal(v_ref, v_ours, err_msg=f"{location},{order}")


def test_dynamic_spheres_step_uses_simple_bounce():
    """Dynamic spheres move, bounce, and stay inside the flip-banded box."""
    env = PandaEnv(num_obst=2, seed=3, motion_obstacles=1, shift=0, order=0)
    env.reset()
    assert all(s.role == 1 for s in env.spheres)
    p0 = np.array([s.base_position.copy() for s in env.spheres])
    for _ in range(50):
        env.step()
    p1 = np.array([s.base_position for s in env.spheres])
    assert np.any(np.abs(p1 - p0) > 1e-6)  # they actually moved
    for s in env.spheres:
        assert np.all(np.isfinite(s.base_position))
        assert np.all(np.isfinite(s.base_linear_velocity))


# --------------------------------------------------------------------------- #
# physics="dynamics": computed-torque PD motor over the RNEA forward dynamics
# --------------------------------------------------------------------------- #


def test_dynamics_mode_gravity_equilibrium():
    """With the target AT the current configuration, the computed-torque PD
    holds the arm against gravity (the motor's gravity-compensation term)."""
    from stoch_gpmp_tpu.envs.objects import Panda

    panda = Panda(use_dynamics=True)
    q0 = panda.q.copy()
    panda.setTargetPositions(q0)
    for _ in range(120):  # 0.5 s of sim time
        panda.step(1.0 / 240.0)
    np.testing.assert_allclose(panda.q, q0, atol=1e-3)
    # and the same arm WITHOUT control torque falls
    panda.reset()
    panda.setTargetTorques(np.zeros(7))
    for _ in range(120):
        panda.step(1.0 / 240.0)
    assert np.abs(panda.q - q0).max() > 1e-2


def test_dynamics_mode_pd_tracking_converges():
    """A step target is reached with near-zero residual velocity (critically
    damped computed-torque PD), staying inside the joint limits."""
    from stoch_gpmp_tpu.envs.objects import Panda

    panda = Panda(use_dynamics=True)
    target = panda.q + np.array([0.2, -0.15, 0.1, 0.12, -0.2, 0.15, 0.1])
    panda.setTargetPositions(target)
    for _ in range(480):  # 2 s
        panda.step(1.0 / 240.0)
    np.testing.assert_allclose(panda.q, target, atol=5e-3)
    assert np.abs(panda.dq).max() < 5e-2
    assert np.all(panda.q >= panda.jl_lower) and np.all(panda.q <= panda.jl_upper)


def test_dynamics_mode_env_step_and_goal_semantics():
    """PandaEnv(physics='dynamics') steps, tracks plan waypoints, and keeps
    the contact/goal bookkeeping of the kinematic mode."""
    env = PandaEnv(num_obst=0, seed=1, physics="dynamics", frequency=24)
    env.reset()
    assert env.panda.use_dynamics
    q_start = env.panda.q.copy()
    target = q_start + 0.1
    for _ in range(30):  # 30 env steps x 24 substeps = 3 s
        s_t, costs, done, info = env.step(target)
        if done:
            break
    np.testing.assert_allclose(env.panda.q, target, atol=1e-2)
    assert np.isfinite(costs).all() if np.ndim(costs) else np.isfinite(costs)


def test_dynamics_mode_energy_dissipation():
    """Under zero torque the semi-implicit integrator keeps total energy
    bounded by its initial value envelope (no numeric blow-up) while the arm
    swings through 1 s of free fall."""
    import jax.numpy as jnp

    from stoch_gpmp_tpu.envs.objects import Panda

    panda = Panda(use_dynamics=True)
    dyn = panda.dynamics
    panda.setTargetTorques(np.zeros(7))

    def energy():
        q, qd = jnp.asarray(panda.q), jnp.asarray(panda.dq)
        return float(dyn.kinetic_energy(q, qd) + dyn.potential_energy(q))

    e0 = energy()
    for _ in range(240):
        panda.step(1.0 / 240.0)
    # semi-implicit Euler: bounded drift (velocity clamping only removes
    # energy); allow a small integration-error envelope
    assert energy() <= e0 + 0.5
    assert np.all(np.isfinite(panda.q)) and np.all(np.isfinite(panda.dq))


def test_contact_interpolation_catches_mid_segment_sphere():
    """A small sphere centered on the MIDPOINT of the forearm segment
    (between link-6 and link-7 origins) misses the origin-only check but is
    caught by the interpolated contact points (the mesh-contact analogue)."""
    import jax.numpy as jnp

    env = PandaEnv(num_obst=1, seed=0, contact_interpolate=2,
                   contact_model="points")
    env_origins_only = PandaEnv(num_obst=1, seed=0, contact_interpolate=0,
                                contact_model="points")
    lp = env.panda.link_poses()
    mid = 0.5 * (lp[5, :3, 3] + lp[6, :3, 3])
    for e in (env, env_origins_only):
        s = e.spheres[0]
        s.base_position = np.asarray(mid)
        s.scale = 0.02  # too small to reach either origin
        s.base_linear_velocity = np.zeros(3)
    assert env._check_contact()
    assert not env_origins_only._check_contact()
    # the mesh-sphere model (default) catches it even without interpolation:
    # the forearm's collision-mesh spheres cover the whole segment
    assert env_origins_only.contact_verdicts["spheres"]


def test_mesh_sphere_contact_model():
    """The default contact geometry is the collision-mesh sphere
    decomposition: it flags a sphere touching the elbow VOLUME that the
    legacy point check misses, agrees with it on far-away obstacles, and
    leaves the resting arm contact-free."""
    env = PandaEnv(num_obst=1, seed=0)
    assert env._contact_model == "spheres"
    s = env.spheres[0]
    s.base_linear_velocity = np.zeros(3)

    # far away: both models clear, and the resting pose is contact-free
    s.base_position = np.asarray([5.0, 5.0, 5.0])
    s.scale = 0.1
    assert not env._check_contact()
    assert not env.contact_verdicts["points"]

    # touching the elbow volume: offset from the link-4 origin by ~7 cm
    # perpendicular, with a 4 cm sphere — inside the mesh decomposition's
    # coverage but out of reach of the origin/interpolation points
    lp = env.panda.link_poses()
    cw, rw, _ = env._world_collision_spheres(lp)
    # pick the mesh sphere farthest from every link origin to probe volume
    origins = lp[:, :3, 3]
    d_orig = np.linalg.norm(cw[:, None] - origins[None], axis=-1).min(axis=1)
    probe = int(np.argmax(d_orig))
    direction = np.asarray([0.0, 0.0, 1.0])
    s.base_position = cw[probe] + direction * (rw[probe] + 0.01)
    s.scale = 0.02
    assert env._check_contact()  # 1 cm gap < r_obst 2 cm -> touching


def test_dynamic_sphere_pushed_out_of_arm():
    """In the moving-obstacle EXTENSION mode, a sphere penetrating the arm
    volume is resolved: pushed out along the contact normal with its
    approach velocity removed; a static sphere is left untouched. (No
    bullet-parity claim — the reference's dynamic path crashes and its
    spheres are static bullet bodies; docs/COMPONENT_MAP.md fidelity
    audit.)"""
    env = PandaEnv(num_obst=1, seed=0, motion_obstacles=0)
    lp = env.panda.link_poses()
    cw, rw, _ = env._world_collision_spheres(lp)
    probe = len(cw) // 2
    s = env.spheres[0]
    s.scale = 0.05
    inside = cw[probe] + np.asarray([0.0, 0.0, 1e-3])
    s.base_position = inside.copy()
    s.base_linear_velocity = np.asarray([0.0, 0.0, -0.5])

    # static: untouched
    s.role = 0
    env._resolve_obstacle_contacts()
    np.testing.assert_array_equal(s.base_position, inside)

    # dynamic: pushed to (at least) the contact surface, approach removed
    s.role = 1
    env._resolve_obstacle_contacts()
    d = np.linalg.norm(s.base_position - cw, axis=-1) - rw - s.scale
    assert d.max() > -1e-6  # no longer penetrating the worst sphere
    cw_new, rw_new, _ = env._world_collision_spheres(env.panda.link_poses())
    n = (s.base_position - cw[probe])
    n = n / np.linalg.norm(n)
    assert np.dot(s.base_linear_velocity, n) >= -1e-9


def test_reference_parity_regime_has_no_sphere_motion():
    """The reference-parity regime (``motion_obstacles=0`` — the default,
    and what the reference actually RUNS: its dynamic path raises
    AttributeError at panda.py:437 and its spheres are useFixedBase bullet
    bodies stepSimulation never moves) must have exactly zero sphere
    motion: positions bit-identical across steps and the contact resolver
    a structural no-op. This is the regime the 25-seed closed-loop
    success suite measures 25/25 vs the actual reference planner in."""
    env = PandaEnv(num_obst=3, seed=11, motion_obstacles=0)
    env.reset()
    assert all(s.role == 0 for s in env.spheres)
    pos0 = [s.base_position.copy() for s in env.spheres]
    vel0 = [np.asarray(s.base_linear_velocity).copy() for s in env.spheres]
    for _ in range(5):
        env.step(env.panda.q + 0.01)
    for s, p0, v0 in zip(env.spheres, pos0, vel0):
        np.testing.assert_array_equal(s.base_position, p0)
        np.testing.assert_array_equal(np.asarray(s.base_linear_velocity), v0)


def test_render_mode_records_and_saves(tmp_path):
    """render=True (the reference attaches a PyBullet GUI, panda.py:518-527)
    natively records per-step frames and writes an episode GIF; the
    simulation itself is unchanged by rendering."""
    env = PandaEnv(num_obst=2, seed=4, render=True)
    env.reset()
    env.set_goals([np.array([0.4, 0.2, 0.5]), None])
    for _ in range(3):
        env.step(env.panda.q + 0.02)
    assert len(env.frames) == 4  # reset + 3 steps
    f = env.frames[-1]
    assert f["skeleton"].shape[1] == 3 and len(f["spheres"]) == 2
    assert f["goal"].shape == (3,)
    out = tmp_path / "ep.gif"
    env.save_animation(out, fps=5)
    assert out.exists() and out.stat().st_size > 0

    # render=False records nothing and refuses to draw
    env2 = PandaEnv(num_obst=1, seed=4)
    env2.reset()
    env2.step()
    assert env2.frames == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="render=True"):
        env2.render_frame()


def _worst_static_penetration(env):
    """Deepest geometric penetration of the arm's movable mesh spheres into
    static obstacle spheres / the floor (the quantity the deflection
    resolves)."""
    lp = env.panda.link_poses()
    cw, rw, fmask = env._world_collision_spheres(lp)
    movable = env._mesh_sphere_frames >= 0
    worst = -np.inf
    static = [s for s in env.spheres if s.role == 0]
    if static:
        c = np.stack([s.base_position for s in static])
        r = np.array([s.scale for s in static])
        d = np.linalg.norm(cw[:, None, :] - c[None, :, :], axis=-1)
        pen = rw[:, None] + r[None, :] - d
        worst = max(worst, float(pen[movable].max()))
    pen_floor = rw - cw[:, 2]
    sel = fmask & movable
    if sel.any():
        worst = max(worst, float(pen_floor[sel].max()))
    return worst


def test_terminal_contact_deflection_records_blocked_pose():
    """On the contact step bullet records the arm BLOCKED at the contact
    (reference panda.py:443,453-481), not at the commanded pose. The native
    deflection resolves mesh-sphere penetration to the contact slop, keeps
    the contact flag tripping, and removes the approach velocity."""
    def run(deflect):
        env = PandaEnv(num_obst=1, seed=0, contact_deflection=deflect)
        env.reset()
        ee, _ = env.panda.getEEPositionAndOrientation()
        env.spheres[0].base_position = ee + np.array([0.0, 0.0, -0.06])
        env.spheres[0].scale = 0.08
        env.set_goals([ee + np.array([1.0, 0, 0]), None])
        # command the arm INTO the obstacle
        q_cmd = env.panda.q.copy()
        q_cmd[3] -= 0.3
        _, cost, done, info = env.step(q_cmd)
        return env, float(cost), done

    env_off, cost_off, done_off = run(False)
    env_on, cost_on, done_on = run(True)
    pen_off = _worst_static_penetration(env_off)
    pen_on = _worst_static_penetration(env_on)
    assert pen_off > 0.01  # undeflected: the arm really interpenetrates
    assert pen_on <= env_on._contact_slop + 2e-3  # blocked at the surface
    # the contact flag + episode semantics are unchanged (panda.py:494)
    assert env_on.is_contact and done_on and cost_on == 1e2
    assert env_off.is_contact and done_off and cost_off == 1e2
    # the recorded terminal state is the deflected one
    assert not np.allclose(env_on.panda.q, env_off.panda.q, atol=1e-6)
    # and it no longer approaches the contact (inelastic velocity removal)
    assert np.linalg.norm(env_on.panda.dq) <= np.linalg.norm(env_off.panda.dq) + 1e-9


def test_contact_deflection_noop_without_contact():
    """Away from contact the deflection changes nothing: the step is
    bit-identical with the feature on or off."""
    def run(deflect):
        env = PandaEnv(num_obst=0, seed=3, contact_deflection=deflect)
        env.reset()
        env.set_goals([np.array([0.4, 0.1, 0.5]), None])
        for _ in range(5):
            env.step(env.panda.q + 0.01)
        return env

    a, b = run(True), run(False)
    np.testing.assert_array_equal(a.panda.q, b.panda.q)
    np.testing.assert_array_equal(a.panda.dq, b.panda.dq)
    assert not a.is_contact


def test_contact_deflection_floor():
    """Driving the arm into the floor records a pose resolved to the floor
    surface (non-exempt spheres at z >= r - slop), with contact flagged."""
    env = PandaEnv(num_obst=0, seed=0)
    env.reset()
    env.set_goals([np.array([1.0, 0, 0]), None])
    q_cmd = env.panda.q.copy()
    q_cmd[1] = 1.6
    q_cmd[3] = -2.2  # lean the whole arm down through the floor plane
    for _ in range(120):
        _, _, done, _ = env.step(q_cmd)
        if done:
            break
    assert env.is_contact
    assert _worst_static_penetration(env) <= env._contact_slop + 2e-3


def test_live_render_mode_headless():
    """render='live' (the native analogue of the reference's live PyBullet
    GUI, panda.py:518-527) redraws a persistent 3D figure per step. Under
    the headless Agg backend it must still run — drawing offscreen — and
    record frames like render=True."""
    import matplotlib

    matplotlib.use("Agg")
    env = PandaEnv(num_obst=1, seed=0, render="live", live_render_every=2)
    env.reset()
    env.set_goals([np.array([0.4, 0.1, 0.5]), None])
    for _ in range(4):
        env.step(env.panda.q + 0.01)
    assert env.render_mode and env._live_render
    assert len(env.frames) == 5  # reset + 4 steps
    assert env._live_ax is not None  # the live figure was drawn
