from mocogan_tpu.data import synthetic, clips

__all__ = ["synthetic", "clips"]
