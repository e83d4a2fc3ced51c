from mocogan_tpu.ops import layers, losses, preproc, sampling

__all__ = ["layers", "losses", "preproc", "sampling"]
