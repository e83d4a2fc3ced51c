from mocogan_tpu.train import state, step, loop

__all__ = ["state", "step", "loop"]
