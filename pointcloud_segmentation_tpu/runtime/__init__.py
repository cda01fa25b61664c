from .engine import SegmentationEngine
from .posebuffer import PoseBuffer, slerp
from .mailbox import LatestWinsMailbox
from . import csvio

__all__ = ["SegmentationEngine", "PoseBuffer", "slerp", "LatestWinsMailbox", "csvio"]
