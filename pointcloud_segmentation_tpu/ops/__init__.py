from .eigh3 import eigvalsh3, eigh3, principal_eigenvector3
from .preproc import preprocess, window_mask
from .hough import extract_lines, extract_lines_jit, HoughResult, SegmentBatch, empty_segments

__all__ = [
    "eigvalsh3", "eigh3", "principal_eigenvector3",
    "preprocess", "window_mask",
    "extract_lines", "extract_lines_jit", "HoughResult", "SegmentBatch",
    "empty_segments",
]
