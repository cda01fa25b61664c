from .structure import get_similar_segments, match_report, direction_angle, midpoint
from .timing import load_processing_time_csv, summarize

__all__ = [
    "get_similar_segments", "match_report", "direction_angle", "midpoint",
    "load_processing_time_csv", "summarize",
]
