from mocogan_tpu.eval import fvd, parity

__all__ = ["fvd", "parity"]
