from .device_index import FmDeviceIndex, build_fused_blocks, fused_row_words, to_device
from .engine import FmQueryEngine
from .locate import lf_walk
from .rank import backstep, fetch_rows, occurrence, seed_range, symbol_at, update_range
from .search import count_batch_kernel, counts_from_ranges, search_ranges

__all__ = [
    "FmDeviceIndex",
    "to_device",
    "FmQueryEngine",
    "occurrence",
    "update_range",
    "seed_range",
    "symbol_at",
    "backstep",
    "search_ranges",
    "counts_from_ranges",
    "count_batch_kernel",
    "lf_walk",
]
