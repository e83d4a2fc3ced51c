from mocogan_tpu.models import motion, generator, discriminators

__all__ = ["motion", "generator", "discriminators"]
