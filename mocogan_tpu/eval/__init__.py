from mocogan_tpu.eval import fvd

__all__ = ["fvd"]
