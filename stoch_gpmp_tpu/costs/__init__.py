from stoch_gpmp_tpu.costs.costs import (
    Cost,
    CostCollision,
    CostComposite,
    CostGP,
    CostGPTrajectory,
    CostGoal,
    CostGoalPrior,
    GNContrib,
)
from stoch_gpmp_tpu.costs.fields import (
    EESE3DistanceField,
    LinkDistanceField,
    LinkSelfDistanceField,
    OccupancyGridField,
)

__all__ = [
    "Cost",
    "CostCollision",
    "CostComposite",
    "CostGP",
    "CostGPTrajectory",
    "CostGoal",
    "CostGoalPrior",
    "GNContrib",
    "EESE3DistanceField",
    "LinkDistanceField",
    "LinkSelfDistanceField",
    "OccupancyGridField",
]
