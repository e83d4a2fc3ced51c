from mocogan_tpu.utils import checkpoint, metrics, prng, profiling, video

__all__ = ["checkpoint", "metrics", "prng", "profiling", "video"]
