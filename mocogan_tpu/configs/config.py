"""Experiment configuration dataclasses.

The reference drives everything through ``train.py``'s argparse flags
(gpu id, batchsize, epochs, dataset path, out dir, latent dims — SURVEY.md
§1, reconstructed). Here the same surface is typed, named, and versioned:
one frozen dataclass tree per experiment, CLI overrides applied on top.

Latent dimensions follow the MoCoGAN paper (arXiv:1707.04993):
content code z_C is 50-dim, motion code z_M(t) is the 10-dim hidden state
of a one-layer GRU driven by i.i.d. Gaussian noise e_t.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for all four networks (reference R1-R4)."""

    # Latent space (MoCoGAN paper Sec. 3 / reference generator Chain).
    dim_content: int = 50      # z_C — fixed per clip
    dim_motion: int = 10       # z_M(t) — GRU hidden size
    dim_eps: int = 10          # per-step GRU input noise e_t

    # Video geometry.
    image_size: int = 64       # H == W
    channels: int = 3
    video_length: int = 16     # T

    # Capacity (DCGAN-style feature-map widths).
    gen_features: int = 64     # ngf: deepest layer has gen_features * 8 maps
    disc_features: int = 64    # ndf

    # Conditional/categorical MoCoGAN (reference R10, config 4).
    n_classes: int = 0         # 0 => unconditional

    # Discriminator topology.
    use_video_discriminator: bool = True

    # Numerics. Params are always fp32; compute may run in bfloat16 on TPU.
    compute_dtype: str = "float32"   # "float32" | "bfloat16"

    # Rematerialize the frame decoder in the backward pass (trade FLOPs for
    # HBM headroom at the 96x96x32f scale; SURVEY.md §5 long-context row).
    remat: bool = False

    @property
    def dim_z(self) -> int:
        """Per-frame latent fed to the image generator: [z_C, onehot?, z_M]."""
        return self.dim_content + self.n_classes + self.dim_motion

    @property
    def conditional(self) -> bool:
        return self.n_classes > 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference R5/R8).

    The reference uses Adam(alpha=2e-4, beta1=0.5) for all three nets
    (MoCoGAN paper Sec. 4 training details).
    """

    batch_size: int = 16                 # global batch (split across data mesh)
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    total_steps: int = 100_000
    seed: int = 0

    # Auxiliary categorical loss weight (InfoGAN-style, config 4).
    aux_loss_weight: float = 1.0

    # Update-ordering semantics (SURVEY.md §3.2 [INFER]; VERDICT r2
    # missing #2). "simultaneous": all three losses from one forward with
    # start-of-iteration parameters (one joint backward — the default
    # reading of the reference's update_core and the faster program).
    # "sequential": the other plausible Chainer reading — D_I/D_V are
    # updated FIRST, then G's loss is computed against the post-update
    # discriminators. A/B on 10k synthetic steps: docs/results/order_ab.
    update_order: str = "simultaneous"   # "simultaneous" | "sequential"

    # D/G balance levers — all default to the reference's plain alternating
    # scheme. Long-run recipe (swept head-to-head at 30k steps,
    # docs/results/balance_r4): label_smoothing=0.1. The residual
    # late-training loss_gen drift under it is BENIGN — fvd_proxy,
    # feature-spread, pairwise-SSIM and the eval-mode D_V margin all stay
    # flat while the train-mode softplus saturates against batch-BN
    # statistics. If a bounded loss_gen curve is specifically needed,
    # d_update_every=2 buys the lowest curve (~20% drift reduction) at a
    # small fvd cost; TTUR and smoothing 0.2 don't materially improve
    # either axis.
    label_smoothing: float = 0.0    # one-sided real-label smoothing, both Ds
    d_update_every: int = 1         # apply D_I/D_V Adam updates every k steps
    g_update_every: int = 1         # apply G Adam updates every k steps
    d_learning_rate: Optional[float] = None   # TTUR-style per-side override
    g_learning_rate: Optional[float] = None

    # Run each net's Adam update on ONE flattened contiguous vector
    # (optax.flatten) instead of per-leaf kernels. Numerically identical
    # (Adam is elementwise; equality verified exactly). MEASURED SLOWER on
    # the v5e chip in every cell — e.g. bf16 single-dispatch 81.7 vs 91.0
    # steps/s, production scan16 bf16 88.0 vs 94.8 — because ravel_pytree
    # adds two full param-size gather/scatter copies per net per step,
    # which cost more HBM traffic than the kernel-count reduction saves
    # (docs/PERFORMANCE.md, rejected optimization #3). Default OFF; kept
    # as a flag so the measurement is reproducible.
    fused_adam: bool = False

    # Checkpoint / logging cadence (reference: snapshot + LogReport extensions).
    checkpoint_every: int = 2_000
    log_every: int = 100
    sample_every: int = 1_000
    keep_checkpoints: int = 3
    # Periodic FVD tracking (proxy extractor; relative metric). 0 = off.
    # eval_clips >= 4x the extractor's feature dim (64) so the Fréchet
    # covariance estimate is sample-dominated, not noise-dominated.
    eval_every: int = 0
    eval_clips: int = 256

    # Data parallelism over ICI (BASELINE B1): number of devices to shard
    # the batch over. None => use all visible devices.
    num_devices: Optional[int] = None
    # Multi-slice (DCN x ICI) training: >1 builds the 2-D (dcn, data) mesh
    # (parallel/mesh.make_mesh; slice rows grouped by device.slice_index on
    # real multi-slice hardware). Batch spans both axes — hierarchical
    # all-reduce: intra-slice over ICI, one param-sized exchange over DCN.
    # 1 = single-slice (the only topology this host can run for real).
    n_slices: int = 1

    # Adversarial steps executed per host dispatch (lax.scan inside one
    # program). >1 amortizes dispatch latency — essential on remote-tunnel
    # TPU backends where each dispatch costs a network round trip.
    steps_per_call: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline config (reference R6/R7 + BASELINE B3)."""

    dataset: str = "synthetic"           # synthetic | mug | weizmann | npy_dir
    data_dir: str = ""
    # Raw stored frame size before the fused on-device resize. When it equals
    # image_size the Pallas resize is an (exercised) identity-weight matmul.
    raw_size: int = 64
    # Use the Pallas fused resize+normalize kernel (B3). Falls back to the
    # jnp oracle path off-TPU automatically.
    fused_preproc: bool = True
    # Keep the ENTIRE uint8 clip store resident in HBM and sample batches
    # on device (zero per-step host traffic). Right choice for MUG/Weizmann
    # -scale corpora (a few GB uint8); needs steps_per_call >= 1.
    device_cache: bool = False
    prefetch: int = 2                    # device batches kept in flight
    # Reference-faithful epoch semantics (SerialIterator shuffle=True): each
    # clip appears exactly once per epoch, order re-drawn per epoch from a
    # PRNG keyed by (seed, epoch). False = i.i.d. per-batch draws
    # (statistically equivalent, stateless). Both modes keep batch k a pure
    # function of (seed, k) — exact resume is preserved. The dataclass
    # default stays False (synthetic/i.i.d. streams), but every
    # corpus-backed named config (mug/weizmann/categorical/scaled) sets
    # True: faithfulness to the reference's data order is the DEFAULT for
    # real datasets, i.i.d. the opt-out (VERDICT r3 next-round #5; live
    # run evidence: docs/results/weizmann10k_r4). Note: flipping this on
    # an EXISTING run's config changes its clip-window stream (see
    # ops/sampling.DATA_STREAM_VERSION's caveat on resume continuity).
    epoch_shuffle: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: ModelConfig
    train: TrainConfig
    data: DataConfig
    out_dir: str = "runs"


def _toy() -> ExperimentConfig:
    """Config 1 — unconditional toy run, D_I only, CPU-runnable."""
    return ExperimentConfig(
        name="toy",
        model=ModelConfig(
            image_size=64, channels=3, video_length=16,
            gen_features=32, disc_features=32,
            use_video_discriminator=False,
        ),
        train=TrainConfig(batch_size=8, total_steps=2_000),
        data=DataConfig(dataset="synthetic"),
    )


def _mug() -> ExperimentConfig:
    """Config 2 — MUG facial expressions, D_I + D_V.

    Defaults stay at the reference's fp32 @ batch 16. The VALIDATED
    production recipe for maximum throughput (round 5,
    docs/results/flagship50k_bf16b32_r5) is::

        --set train.batch_size=32 model.compute_dtype=bfloat16 \\
              train.label_smoothing=0.1

    — 58.9 steps/s = 1,884 clips/s end-to-end on one v5e chip (1.37x the
    b16 fp32 point) with loss curves statistically equivalent to fp32
    b16 over 50k steps (nabc <= 0.43 per key) and every panel signal
    (fvd_proxy, spread, pairwise-SSIM, dv_margin, ACD) healthy. b64
    buys only ~3% more on the scan path (1,886 clips/s @ k=32) and is
    quality-unvalidated — prefer b32."""
    return ExperimentConfig(
        name="mug",
        model=ModelConfig(image_size=64, channels=3, video_length=16),
        train=TrainConfig(batch_size=16, steps_per_call=16),
        data=DataConfig(dataset="mug", raw_size=96, device_cache=True,
                        epoch_shuffle=True),
    )


def _weizmann() -> ExperimentConfig:
    """Config 3 — Weizmann actions, full MoCoGAN S_1/S_T loss."""
    return ExperimentConfig(
        name="weizmann",
        model=ModelConfig(image_size=64, channels=3, video_length=16),
        train=TrainConfig(batch_size=16, steps_per_call=16),
        data=DataConfig(dataset="weizmann", raw_size=96, device_cache=True,
                        epoch_shuffle=True),
    )


def _categorical() -> ExperimentConfig:
    """Config 4 — categorical MoCoGAN with conditional D_V head."""
    return ExperimentConfig(
        name="categorical",
        model=ModelConfig(
            image_size=64, channels=3, video_length=16,
            n_classes=6,  # MUG has 6 expression classes
        ),
        train=TrainConfig(batch_size=16, steps_per_call=16),
        data=DataConfig(dataset="mug", raw_size=96, device_cache=True,
                        epoch_shuffle=True),
    )


def _scaled() -> ExperimentConfig:
    """Config 5 — 96x96x32f, data-parallel v5e-8, bf16 compute."""
    return ExperimentConfig(
        name="scaled",
        model=ModelConfig(
            image_size=96, channels=3, video_length=32,
            compute_dtype="bfloat16", remat=True,
        ),
        train=TrainConfig(batch_size=64, num_devices=8, steps_per_call=32),
        data=DataConfig(dataset="weizmann", raw_size=128, fused_preproc=True,
                        device_cache=True, epoch_shuffle=True),
    )


_CONFIGS = {
    "toy": _toy,
    "mug": _mug,
    "weizmann": _weizmann,
    "categorical": _categorical,
    "scaled": _scaled,
}


def list_configs() -> Tuple[str, ...]:
    return tuple(_CONFIGS)


def get_config(name: str, **overrides) -> ExperimentConfig:
    """Build a named config; ``overrides`` replace top-level fields or, with
    dotted keys (``model.video_length=32``), nested dataclass fields."""
    if name not in _CONFIGS:
        raise KeyError(f"unknown config {name!r}; have {sorted(_CONFIGS)}")
    cfg = _CONFIGS[name]()
    nested: dict = {}
    flat: dict = {}
    for k, v in overrides.items():
        if "." in k:
            head, tail = k.split(".", 1)
            nested.setdefault(head, {})[tail] = v
        else:
            flat[k] = v
    for head, kv in nested.items():
        sub = getattr(cfg, head)
        cfg = dataclasses.replace(cfg, **{head: dataclasses.replace(sub, **kv)})
    if flat:
        cfg = dataclasses.replace(cfg, **flat)
    return cfg
