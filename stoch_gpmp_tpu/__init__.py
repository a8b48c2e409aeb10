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
