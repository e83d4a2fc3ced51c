from mocogan_tpu.utils import prng, video, metrics

__all__ = ["prng", "video", "metrics"]
