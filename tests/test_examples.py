"""Smoke tests: the runnable examples execute end-to-end (tiny iteration
counts, headless)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _run(script, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(ROOT)
    return subprocess.run(
        [sys.executable, str(ROOT / "examples" / script), *args],
        capture_output=True, text=True, timeout=420, env=env,
    )


@pytest.mark.parametrize("extra", [[], ["--fast"]])
def test_planar_example(extra, tmp_path):
    r = _run(
        "planar_environment.py", "--iters", "20", "--seed", "0",
        "--plot", str(tmp_path / "out.png"), *extra,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Iteration:" in r.stdout
    assert (tmp_path / "out.png").exists()


def test_panda_example():
    r = _run("panda_environment.py", "--iters", "20", "--seed", "0")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final EE->target distances" in r.stdout


def test_planar_gpmp_example(tmp_path):
    r = _run("planar_gpmp.py", "--iters", "10", "--plot", str(tmp_path / "g.png"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final goal distances" in r.stdout


def test_planar_sharded_example():
    """The multi-chip example self-provisions a virtual mesh, runs the
    one-kwarg mesh API end to end, and reaches the goals."""
    r = _run("planar_sharded.py", "--devices", "8", "--iters", "120")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "over 8 devices" in r.stdout
    assert "final distance" in r.stdout
