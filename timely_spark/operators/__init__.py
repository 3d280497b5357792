from .aggregators import AGGREGATORS, agg_expr
from .downsample import downsample, combine_series
from .rate import rate
from .fir import fir_filter

__all__ = [
    "AGGREGATORS",
    "agg_expr",
    "downsample",
    "combine_series",
    "rate",
    "fir_filter",
]
