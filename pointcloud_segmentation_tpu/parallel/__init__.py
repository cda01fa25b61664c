from .sharding import make_mesh, make_multichip_step, make_batched_extract

__all__ = ["make_mesh", "make_multichip_step", "make_batched_extract"]
