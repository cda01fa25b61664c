from .engine import SegmentationEngine
from .posebuffer import PoseBuffer, slerp
from .mailbox import LatestWinsMailbox
from . import csvio

__all__ = ["SegmentationEngine", "PoseBuffer", "slerp", "LatestWinsMailbox",
           "csvio", "SegmentationServer", "SegmentationClient"]


def __getattr__(name):
    # lazy: the server pulls in socket plumbing only when actually served
    if name in ("SegmentationServer", "SegmentationClient"):
        from . import server

        return getattr(server, name)
    raise AttributeError(name)
