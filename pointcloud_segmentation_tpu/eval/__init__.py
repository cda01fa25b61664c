from .structure import (get_similar_segments, match_report, direction_angle,
                        midpoint, radial_error)
from .timing import load_processing_time_csv, summarize

__all__ = [
    "get_similar_segments", "match_report", "direction_angle", "midpoint",
    "radial_error",
    "load_processing_time_csv", "summarize",
]
