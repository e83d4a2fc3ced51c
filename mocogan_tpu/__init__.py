"""mocogan_tpu — a TPU-native video-GAN framework with the capabilities of
raahii/mocogan-chainer (MoCoGAN, Tulyakov et al., CVPR 2018), rebuilt from
scratch in idiomatic JAX/XLA/Pallas.

Public surface (maps to the reference's capability inventory, SURVEY.md §2):
  models.motion          — GRU motion-latent sampler R_M            (R1)
  models.generator       — per-frame image generator G_I + generate (R2, R9)
  models.discriminators  — D_I (2D conv) and D_V (3D conv, +class)  (R3, R4, R10)
  train.step             — one jitted adversarial train step        (R5)
  train.loop             — trainer: ckpt/logging/samples            (R8; §5 aux)
  data                   — datasets + preprocessing + device feed   (R6, R7, B3)
  parallel               — data-parallel mesh/sharding over ICI     (B1, B2)
  eval                   — FVD harness + benchmarks                 (B5)
"""

__version__ = "0.1.0"

from mocogan_tpu.configs import ExperimentConfig, get_config, list_configs


def generate(params, bn_state, key, n, model_config, **kw):
    """Top-level re-export of the public sampling API (reference R9)."""
    from mocogan_tpu.models.generator import generate as _generate

    return _generate(params, bn_state, key, n, model_config, **kw)


__all__ = ["ExperimentConfig", "get_config", "list_configs", "generate",
           "__version__"]
