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
    MeshSphereDistanceField,
    MeshSphereFloorField,
    LinkSelfDistanceField,
    OccupancyGridField,
    Primitive2DField,
    RasterPrimitive2DField,
)
from stoch_gpmp_tpu.costs.quadratic import QuadraticCost

__all__ = [
    "Primitive2DField",
    "RasterPrimitive2DField",
    "QuadraticCost",
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
    "MeshSphereDistanceField",
    "MeshSphereFloorField",
    "LinkSelfDistanceField",
    "OccupancyGridField",
]
