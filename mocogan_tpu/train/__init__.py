from mocogan_tpu.train import state, step

__all__ = ["state", "step"]
