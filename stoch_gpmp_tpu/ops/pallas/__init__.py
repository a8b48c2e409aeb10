from stoch_gpmp_tpu.ops.pallas.fields import (
    grid_lookup,
    primitive_field_cost,
    raster_primitive_cost,
)

__all__ = ["grid_lookup", "primitive_field_cost", "raster_primitive_cost"]
