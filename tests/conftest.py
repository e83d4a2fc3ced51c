"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax imports,
so the data-parallel tests can exercise a real 8-way mesh without TPU
hardware (SURVEY.md §4 '"Distributed" without a cluster')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") in EVERY interpreter, overriding the env var — force back to
# CPU after import, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mocogan_tpu import get_config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    """Small-but-complete config: all four nets, fast on 1 CPU core."""
    return get_config(
        "mug",
        **{
            "model.image_size": 32,
            "model.video_length": 8,
            "model.gen_features": 8,
            "model.disc_features": 8,
            "train.batch_size": 8,
            # hermetic: tests opt in to multi-step / device-cache explicitly
            "train.steps_per_call": 1,
            "data.device_cache": False,
        },
    )


@pytest.fixture(scope="session")
def tiny_cat_cfg():
    return get_config(
        "categorical",
        **{
            "model.image_size": 32,
            "model.video_length": 8,
            "model.gen_features": 8,
            "model.disc_features": 8,
            "model.n_classes": 4,
            "train.batch_size": 8,
            "train.steps_per_call": 1,
            "data.device_cache": False,
        },
    )


@pytest.fixture()
def tiny_batch(tiny_cfg):
    from mocogan_tpu.data import synthetic

    m = tiny_cfg.model
    vids, labels = synthetic.make_batch(
        0, tiny_cfg.train.batch_size, t=m.video_length, size=m.image_size,
        channels=m.channels)
    return np.asarray(vids), np.asarray(labels)
