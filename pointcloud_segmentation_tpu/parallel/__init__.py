from .sharding import (
    make_mesh,
    make_multichip_step,
    make_batched_extract,
    make_tp_process_frame,
)

__all__ = ["make_mesh", "make_multichip_step", "make_batched_extract",
           "make_tp_process_frame"]
