"""Typed experiment configs — the TPU-native replacement for the reference's
flat argparse namespace (reference: train.py argparse flags; SURVEY.md §5
"Config / flag system").

One named config per BASELINE.json entry:

  1. ``toy``          — unconditional 64x64x16f MovingMNIST-style, D_I only (CPU-runnable)
  2. ``mug``          — MUG facial expressions 64x64x16f, D_I + 3D-conv D_V
  3. ``weizmann``     — Weizmann actions 64x64x16f, full MoCoGAN S_1/S_T loss
  4. ``categorical``  — action-class one-hot appended to z_C, conditional D_V head
  5. ``scaled``       — 96x96x32f, data-parallel across v5e-8, Pallas preproc
"""

from mocogan_tpu.configs.config import (
    ModelConfig,
    TrainConfig,
    DataConfig,
    ExperimentConfig,
    get_config,
    list_configs,
)

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "ExperimentConfig",
    "get_config",
    "list_configs",
]
