from stoch_gpmp_tpu.planners.gpmp import GPMP, GPMPState, gpmp_optimize, gpmp_step
from stoch_gpmp_tpu.planners.stoch_gpmp import (
    IterMetrics,
    SamplerModel,
    StochGPMP,
    StochGPMPAux,
    StochGPMPState,
    stoch_gpmp_optimize,
    stoch_gpmp_step,
)

__all__ = [
    "GPMP",
    "GPMPState",
    "gpmp_optimize",
    "gpmp_step",
    "IterMetrics",
    "SamplerModel",
    "StochGPMP",
    "StochGPMPAux",
    "StochGPMPState",
    "stoch_gpmp_optimize",
    "stoch_gpmp_step",
]
