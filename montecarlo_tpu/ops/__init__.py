from .linalg import (
    udt, udt_dirty, udt_dirty_colscaled, udt_well_conditioned, rdiv_dirty,
    scatter_columns, calculate_greens, udt_mul_udt,
)
