from stoch_gpmp_tpu.planners.stoch_gpmp import (
    SamplerModel,
    StochGPMP,
    StochGPMPAux,
    StochGPMPState,
    stoch_gpmp_optimize,
    stoch_gpmp_step,
)

__all__ = [
    "SamplerModel",
    "StochGPMP",
    "StochGPMPAux",
    "StochGPMPState",
    "stoch_gpmp_optimize",
    "stoch_gpmp_step",
]
