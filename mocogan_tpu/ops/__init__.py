from mocogan_tpu.ops import layers, losses, sampling

__all__ = ["layers", "losses", "sampling"]
