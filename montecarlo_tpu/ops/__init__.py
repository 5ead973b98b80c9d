from .linalg import (
    udt, udt_dirty, rdiv_dirty, scatter_columns, calculate_greens,
    calculate_greens_and_logdet, udt_mul_udt,
)
