from mocogan_tpu.data import clips, native, pipeline, synthetic

__all__ = ["clips", "native", "pipeline", "synthetic"]
