"""Generate a sphere decomposition of the Panda collision meshes.

Reads the reference's collision OBJs (the actual geometry PyBullet uses for
``getClosestPoints``, reference ``stoch_gpmp/envs/panda.py:453-481``; meshes
at ``assets/franka_description/meshes/collision/*.obj``), samples each mesh
surface (vertices + triangle edge midpoints + centroids), and covers the
samples with k spheres per link via seeded k-means (radius = max distance of
a cluster's samples to its center, i.e. every sampled surface point lies
INSIDE some sphere — a conservative over-approximation: the contact check
built on these spheres can only be stricter than mesh contact, never miss a
sampled-surface contact).

Writes ``stoch_gpmp_tpu/kinematics/panda_collision.py`` with the arrays as
literals so the framework stays standalone (same policy as the embedded
Franka kinematic parameters in ``panda_model.py``). Run:

    /opt/venv/bin/python scripts/gen_collision_spheres.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

MESH_DIR = Path("/root/reference/assets/franka_description/meshes/collision")
OUT = Path(__file__).resolve().parent.parent / (
    "stoch_gpmp_tpu/kinematics/panda_collision.py"
)

# mesh file -> (frame name, spheres per link). Frame names match the FK chain
# link frames (kinematics/panda_model.py); link0 is the static base (world
# frame, the arm root is at the world origin in PandaEnv).
LINKS = [
    ("link0.obj", "panda_link0", 10),
    ("link1.obj", "panda_link1", 10),
    ("link2.obj", "panda_link2", 10),
    ("link3.obj", "panda_link3", 10),
    ("link4.obj", "panda_link4", 10),
    ("link5.obj", "panda_link5", 12),
    ("link6.obj", "panda_link6", 10),
    ("link7.obj", "panda_link7", 8),
    ("hand.obj", "panda_hand", 8),
]
# the two fingers (prismatic, ~[0, 0.04] m travel) are approximated in the
# hand frame at half-open position; finger.obj is ~5 cm long
FINGER_MESH = "finger.obj"
FINGER_OPEN = 0.02  # m, half-open
# finger frames: left at +y*q, right at -y*q rotated pi about z; both offset
# z+0.0584 from the hand (URDF panda_finger_joint origins)
FINGER_Z = 0.0584
FINGER_K = 2


def parse_obj(path: Path):
    verts, faces = [], []
    for line in path.read_text().splitlines():
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
            for i in range(1, len(idx) - 1):  # fan-triangulate
                faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(verts), np.asarray(faces, dtype=int)


def surface_samples(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Vertices + per-triangle edge midpoints + centroids (+ one more
    subdivision level of midpoints) — a dense-enough surface sampling that
    sphere coverage of the samples is coverage of the surface to within a
    few mm sagitta."""
    tri = verts[faces]  # [F, 3, 3]
    mids = 0.5 * (tri + np.roll(tri, 1, axis=1))  # edge midpoints
    cents = tri.mean(axis=1, keepdims=True)
    quarter = 0.5 * (tri + mids)  # second-level points
    pts = np.concatenate(
        [verts, mids.reshape(-1, 3), cents.reshape(-1, 3),
         quarter.reshape(-1, 3)]
    )
    return np.unique(np.round(pts, 6), axis=0)


def kmeans_cover(points: np.ndarray, k: int, seed: int = 0, iters: int = 200):
    rng = np.random.default_rng(seed)
    centers = points[rng.choice(len(points), size=k, replace=False)]
    for _ in range(iters):
        d = np.linalg.norm(points[:, None] - centers[None], axis=-1)
        assign = d.argmin(axis=1)
        new = np.stack([
            points[assign == j].mean(axis=0) if np.any(assign == j)
            else centers[j]
            for j in range(k)
        ])
        if np.allclose(new, centers, atol=1e-9):
            break
        centers = new
    d = np.linalg.norm(points[:, None] - centers[None], axis=-1)
    assign = d.argmin(axis=1)
    radii = np.asarray([
        d[assign == j, j].max() if np.any(assign == j) else 0.0
        for j in range(k)
    ])
    keep = radii > 0
    return centers[keep], radii[keep]


def main():
    entries = []
    stats = []
    for fname, frame, k in LINKS:
        verts, faces = parse_obj(MESH_DIR / fname)
        pts = surface_samples(verts, faces)
        centers, radii = kmeans_cover(pts, k, seed=0)
        # verify coverage: every sample inside some sphere
        d = np.linalg.norm(pts[:, None] - centers[None], axis=-1) - radii[None]
        gap = d.min(axis=1).max()
        assert gap <= 1e-9, (fname, gap)
        spheres = np.concatenate([centers, radii[:, None]], axis=1)
        entries.append((frame, spheres))
        stats.append((fname, frame, len(pts), len(radii),
                      float(radii.min()), float(radii.max())))

    # fingers -> hand frame at half-open position
    verts, faces = parse_obj(MESH_DIR / FINGER_MESH)
    pts = surface_samples(verts, faces)
    centers, radii = kmeans_cover(pts, FINGER_K, seed=0)
    left = centers + np.asarray([0.0, FINGER_OPEN, FINGER_Z])
    rot = np.asarray([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])  # z pi
    right = centers @ rot.T + np.asarray([0.0, -FINGER_OPEN, FINGER_Z])
    finger_spheres = np.concatenate([
        np.concatenate([left, radii[:, None]], axis=1),
        np.concatenate([right, radii[:, None]], axis=1),
    ])
    for frame, spheres in entries:
        if frame == "panda_hand":
            spheres = np.concatenate([spheres, finger_spheres])
            entries[[f for f, _ in entries].index("panda_hand")] = (
                frame, spheres
            )
    stats.append((FINGER_MESH, "panda_hand(+fingers)", len(pts),
                  2 * len(radii), float(radii.min()), float(radii.max())))

    lines = [
        '"""Sphere decomposition of the Panda collision meshes (GENERATED).',
        "",
        "Generated by scripts/gen_collision_spheres.py from the reference's",
        "collision geometry (assets/franka_description/meshes/collision/*.obj",
        "-- the meshes PyBullet's getClosestPoints contact check uses,",
        "reference stoch_gpmp/envs/panda.py:453-481). Every sampled surface",
        "point of each mesh lies inside one of its link's spheres, so a",
        "sphere-based contact check over-approximates (never misses) mesh",
        "contact at the sampled resolution. Centers are in the link frame;",
        "columns are (x, y, z, radius). Fingers are baked into the hand frame",
        'at half-open position."""',
        "",
        "import numpy as np",
        "",
        "PANDA_COLLISION_SPHERES = {",
    ]
    for frame, spheres in entries:
        lines.append(f'    "{frame}": np.asarray([')
        for row in spheres:
            lines.append(
                "        [%.6f, %.6f, %.6f, %.6f]," % tuple(row)
            )
        lines.append("    ]),")
    lines.append("}")
    lines.append("")
    OUT.write_text("\n".join(lines))

    for s in stats:
        print("%-12s %-22s pts=%5d spheres=%2d r=[%.3f, %.3f]" % s)
    total = sum(len(s) for _, s in entries)
    print(f"total spheres: {total} -> {OUT}")


if __name__ == "__main__":
    sys.exit(main())
