from mocogan_tpu.utils import prng

__all__ = ["prng"]
