"""stoch_gpmp_tpu — a TPU-native stochastic GP motion-planning framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
anindex/stoch_gpmp (see SURVEY.md): multi-goal multi-particle stochastic
trajectory optimization under a constant-velocity GP prior, composable cost
factors, occupancy-grid and sphere-SDF collision fields, SE(3) end-effector
goals, and a built-in differentiable URDF forward-kinematics chain.

Design: the GP prior lives in structured block-tridiagonal square-root form
(float32-stable; the PyTorch reference needs float64 for its dense Cholesky),
sampling is one batched MXU matmul per iteration, and the whole planner loop
runs under ``jit`` + ``lax.scan`` with vmapped goals x particles x samples.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import stoch_gpmp_tpu` light)."""
    from importlib import import_module

    _exports = {
        "StochGPMP": "stoch_gpmp_tpu.planners",
        "GPMP": "stoch_gpmp_tpu.planners",
        "GPPrior": "stoch_gpmp_tpu.gp",
        "make_gp_prior": "stoch_gpmp_tpu.gp",
        "CostComposite": "stoch_gpmp_tpu.costs",
        "CostGP": "stoch_gpmp_tpu.costs",
        "CostGoalPrior": "stoch_gpmp_tpu.costs",
        "CostCollision": "stoch_gpmp_tpu.costs",
        "CostGoal": "stoch_gpmp_tpu.costs",
        "generate_obstacle_map": "stoch_gpmp_tpu.envs",
    }
    if name in _exports:
        return getattr(import_module(_exports[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
