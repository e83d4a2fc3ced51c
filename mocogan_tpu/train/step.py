"""The MoCoGAN adversarial train step (reference R5: Updater.update_core,
SURVEY.md §3.2) as ONE jit-compiled pure function.

Reference scheme per iteration (Chainer, define-by-run):
  1. generate a fake clip batch from G (single forward),
  2. D_I loss on S_1-sampled real vs (detached) fake frames -> update D_I,
  3. D_V loss on real clip vs (detached) fake clip         -> update D_V,
  4. G loss = fool both discriminators on the SAME fakes    -> update G.

With the reference mount empty, whether step 4's forward sees start-of-
iteration or already-updated discriminator parameters is [INFER]
(SURVEY.md §3.2): Chainer's three sequential opt.update() calls admit both
readings. BOTH are implemented — train.update_order selects
"simultaneous" (default: one joint backward, every update from start-of-
iteration params) or "sequential" (D updates first, G's loss against the
post-update Ds; `_sequential_train_step`). The D updates are identical in
the two modes by construction; a 10k-step A/B of the G dynamics is
committed at docs/results/order_ab.

TPU-native design — one forward, ONE joint backward:
  total = L_DI(theta_DI, sg(fake)) + L_DV(theta_DV, sg(fake))
        + L_G(fake(theta_G); sg(theta_DI), sg(theta_DV))
``stop_gradient`` partitions the gradient exactly as the reference's three
separate backwards do (sg(fake) blocks D losses from reaching G; sg on the
discriminator *parameter trees* blocks L_G from reaching the Ds while still
letting it flow through the D functions into the fake frames), so
grad(total) w.r.t. each net equals the reference's per-net gradients — but
XLA sees a single fused graph: one generator forward per D-pass + one for
the G-pass is avoided entirely, and all three Adam updates fuse into the
same program.

Data parallelism (BASELINE B1/B2): the step is written once over the global
batch and sharded with jit + NamedSharding on a 1-D "data" mesh. Under
GSPMD, batch reductions (loss means, BatchNorm batch statistics) lower to
psum/all-reduce over ICI automatically, so the sharded step is semantically
IDENTICAL to the single-device step on the concatenated batch — which is
exactly the reference's (single-device) numerics at global batch size.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mocogan_tpu.configs import ExperimentConfig
from mocogan_tpu.models import discriminators, generator
from mocogan_tpu.ops import losses, sampling
from mocogan_tpu.train.state import TrainState, make_optimizer
from mocogan_tpu.utils import prng

_sg = jax.lax.stop_gradient


def _loss_fn(params: Dict[str, Any], bn: Dict[str, Any], real: jax.Array,
             labels: Optional[jax.Array], key: jax.Array,
             cfg: ExperimentConfig):
    m = cfg.model
    batch = real.shape[0]
    new_bn: Dict[str, Any] = {}
    metrics: Dict[str, jax.Array] = {}

    # Both discriminators consume inputs in compute dtype; casting the real
    # clips ONCE here (instead of per conv) halves their HBM traffic under
    # bfloat16. Loss math stays fp32 (ops/losses.py casts logits up).
    dtype = jnp.dtype(m.compute_dtype)
    if real.dtype != dtype:
        real = real.astype(dtype)

    # ---- fake path: z_C + GRU-rolled z_M -> per-frame decode (R1+R2) ----
    fake, new_bn["gen"], fake_labels = generator.sample_videos(
        params["gen"], bn["gen"], key, batch, m, train=True)
    fake_d = _sg(fake)  # detached view for the discriminator losses

    # ---- S_1 frame sampling (paper Sec. 3.3) ----
    k_real = prng.role_key(key, "frame_sample")
    k_fake = jax.random.fold_in(k_real, 1)
    real_frame = sampling.sample_frames(k_real, real)
    fake_frame = sampling.sample_frames(k_fake, fake)   # grads flow to G
    fake_frame_d = _sg(fake_frame)

    # ---- D_I loss (R3) ----
    di_real, st = discriminators.image_apply(
        params["di"], bn["di"], real_frame, m, train=True)
    di_fake, st = discriminators.image_apply(
        params["di"], st, fake_frame_d, m, train=True)
    new_bn["di"] = st
    loss_di = losses.d_loss(di_real, di_fake,
                            label_smoothing=cfg.train.label_smoothing)
    metrics["loss_di"] = loss_di

    # ---- D_V loss (R4) on the S_T clip ----
    loss_dv = jnp.zeros((), jnp.float32)
    if m.use_video_discriminator:
        dv_real, cls_real, st = discriminators.video_apply(
            params["dv"], bn["dv"], real, m, train=True)
        dv_fake, cls_fake_d, st = discriminators.video_apply(
            params["dv"], st, fake_d, m, train=True)
        new_bn["dv"] = st
        loss_dv = losses.d_loss(dv_real, dv_fake,
                                label_smoothing=cfg.train.label_smoothing)
        if m.conditional:
            # InfoGAN-style aux CE (R10): D_V's head classifies real clips
            # by their dataset label and (Q-style) fakes by the sampled one.
            aux_d = losses.categorical_loss(cls_real, labels)
            aux_d = aux_d + losses.categorical_loss(cls_fake_d, fake_labels)
            loss_dv = loss_dv + cfg.train.aux_loss_weight * aux_d
            metrics["loss_aux_d"] = aux_d
        metrics["loss_dv"] = loss_dv

    # ---- G loss: fool both Ds on the SAME fakes (sg on D params) ----
    di_sg, bn_di_sg = _sg(params["di"]), _sg(bn["di"])
    g_di, _ = discriminators.image_apply(di_sg, bn_di_sg, fake_frame, m,
                                         train=True)
    loss_g = losses.g_loss(g_di)
    # Per-discriminator G-loss breakdown: when loss_gen drifts on long
    # runs, the components say WHICH discriminator saturates against G
    # (the balance analysis in docs/results/balance_r4 needs this; the
    # extra scalars are free — XLA already has both softplus values).
    metrics["loss_gen_di"] = loss_g
    if m.use_video_discriminator:
        dv_sg, bn_dv_sg = _sg(params["dv"]), _sg(bn["dv"])
        g_dv, cls_fake, _ = discriminators.video_apply(dv_sg, bn_dv_sg, fake,
                                                       m, train=True)
        g_dv_loss = losses.g_loss(g_dv)
        metrics["loss_gen_dv"] = g_dv_loss
        loss_g = loss_g + g_dv_loss
        if m.conditional:
            aux_g = losses.categorical_loss(cls_fake, fake_labels)
            loss_g = loss_g + cfg.train.aux_loss_weight * aux_g
            metrics["loss_aux_g"] = aux_g
    metrics["loss_gen"] = loss_g

    total = loss_di + loss_dv + loss_g
    return total, (new_bn, metrics)


def _update_net(name: str, params, opt_state, grads, cfg: ExperimentConfig,
                step: jax.Array):
    """Apply one net's Adam update (with the every-k balance lever).

    On skipped steps params AND optimizer moments stay untouched via
    lax.cond (a zeroed-gradient update would still decay m/v — not a true
    skip) while remaining ONE compiled program."""
    tx = make_optimizer(cfg, name)
    every = (cfg.train.g_update_every if name == "gen"
             else cfg.train.d_update_every)
    if every > 1:
        updates, new_opt = jax.lax.cond(
            step % every == 0,
            lambda g, o, p, t=tx: t.update(g, o, p),
            lambda g, o, p: (jax.tree.map(jnp.zeros_like, g), o),
            grads, opt_state, params)
    else:
        updates, new_opt = tx.update(grads, opt_state, params)
    return jax.tree.map(lambda p, u: p + u, params, updates), new_opt


def train_step(state: TrainState, real: jax.Array,
               labels: Optional[jax.Array],
               cfg: ExperimentConfig) -> Tuple[TrainState, Dict[str, Any]]:
    """One adversarial iteration. real: (B,T,H,W,C) in [-1,1]."""
    order = cfg.train.update_order
    if order == "sequential":
        return _sequential_train_step(state, real, labels, cfg)
    if order != "simultaneous":
        raise ValueError(f"train.update_order must be 'simultaneous' or "
                         f"'sequential', got {order!r}")
    key = prng.step_key(state.root_key, state.step)
    grads, (new_bn, metrics) = jax.grad(_loss_fn, has_aux=True)(
        state.params, state.bn, real, labels, key, cfg)

    new_params: Dict[str, Any] = {}
    new_opt: Dict[str, Any] = {}
    for name in state.params:
        new_params[name], new_opt[name] = _update_net(
            name, state.params[name], state.opt[name], grads[name], cfg,
            state.step)
    return state.replace(step=state.step + 1, params=new_params,
                         bn=new_bn, opt=new_opt), metrics


def _sequential_train_step(state: TrainState, real: jax.Array,
                           labels: Optional[jax.Array],
                           cfg: ExperimentConfig
                           ) -> Tuple[TrainState, Dict[str, Any]]:
    """The OTHER plausible reading of the reference's update_core: Chainer
    calls opt_di.update, opt_dv.update, opt_gen.update sequentially, so if
    G's loss forward runs AFTER the D updates, G trains against the
    post-update discriminators. Opt-in via train.update_order="sequential".

    Identities vs the simultaneous step (tested): the D gradients are
    computed from the same start-of-iteration parameters and the same fake
    batch (same PRNG key), so D_I/D_V take EXACTLY the same update in both
    modes; only G's update differs. The generator forward runs twice (same
    key -> bitwise-identical fakes); its BatchNorm running stats advance
    once, from the G-phase forward, and the Ds' running stats advance from
    the D-phase forwards (the G-phase D applies don't touch them) — the
    same convention the simultaneous step uses.
    """
    m = cfg.model
    t = cfg.train
    key = prng.step_key(state.root_key, state.step)
    batch = real.shape[0]
    dtype = jnp.dtype(m.compute_dtype)
    if real.dtype != dtype:
        real = real.astype(dtype)
    k_real = prng.role_key(key, "frame_sample")
    k_fake = jax.random.fold_in(k_real, 1)

    # ---- phase 1: D losses on detached fakes; update D_I, D_V ----
    def d_loss_fn(d_params, gen_params, bn):
        fake, _, fake_labels = generator.sample_videos(
            gen_params, bn["gen"], key, batch, m, train=True)
        fake = _sg(fake)
        new_bn: Dict[str, Any] = {}
        metrics: Dict[str, jax.Array] = {}
        real_frame = sampling.sample_frames(k_real, real)
        fake_frame = sampling.sample_frames(k_fake, fake)
        di_real, st = discriminators.image_apply(
            d_params["di"], bn["di"], real_frame, m, train=True)
        di_fake, st = discriminators.image_apply(
            d_params["di"], st, fake_frame, m, train=True)
        new_bn["di"] = st
        loss_di = losses.d_loss(di_real, di_fake,
                                label_smoothing=t.label_smoothing)
        metrics["loss_di"] = loss_di
        loss_dv = jnp.zeros((), jnp.float32)
        if m.use_video_discriminator:
            dv_real, cls_real, st = discriminators.video_apply(
                d_params["dv"], bn["dv"], real, m, train=True)
            dv_fake, cls_fake_d, st = discriminators.video_apply(
                d_params["dv"], st, fake, m, train=True)
            new_bn["dv"] = st
            loss_dv = losses.d_loss(dv_real, dv_fake,
                                    label_smoothing=t.label_smoothing)
            if m.conditional:
                aux_d = losses.categorical_loss(cls_real, labels)
                aux_d = aux_d + losses.categorical_loss(cls_fake_d,
                                                        fake_labels)
                loss_dv = loss_dv + t.aux_loss_weight * aux_d
                metrics["loss_aux_d"] = aux_d
            metrics["loss_dv"] = loss_dv
        return loss_di + loss_dv, (new_bn, metrics)

    d_params = {k: v for k, v in state.params.items() if k != "gen"}
    d_grads, (bn_d, d_metrics) = jax.grad(d_loss_fn, has_aux=True)(
        d_params, state.params["gen"], state.bn)

    new_params: Dict[str, Any] = {}
    new_opt: Dict[str, Any] = dict(state.opt)
    for name, g in d_grads.items():
        new_params[name], new_opt[name] = _update_net(
            name, state.params[name], state.opt[name], g, cfg, state.step)

    # ---- phase 2: G loss against the UPDATED discriminators ----
    def g_loss_fn(gen_params):
        fake, bn_gen, fake_labels = generator.sample_videos(
            gen_params, state.bn["gen"], key, batch, m, train=True)
        fake_frame = sampling.sample_frames(k_fake, fake)
        metrics: Dict[str, jax.Array] = {}
        g_di, _ = discriminators.image_apply(
            new_params["di"], bn_d["di"], fake_frame, m, train=True)
        loss_g = losses.g_loss(g_di)
        metrics["loss_gen_di"] = loss_g  # same breakdown as simultaneous
        if m.use_video_discriminator:
            g_dv, cls_fake, _ = discriminators.video_apply(
                new_params["dv"], bn_d["dv"], fake, m, train=True)
            g_dv_loss = losses.g_loss(g_dv)
            metrics["loss_gen_dv"] = g_dv_loss
            loss_g = loss_g + g_dv_loss
            if m.conditional:
                aux_g = losses.categorical_loss(cls_fake, fake_labels)
                loss_g = loss_g + t.aux_loss_weight * aux_g
                metrics["loss_aux_g"] = aux_g
        metrics["loss_gen"] = loss_g
        return loss_g, (bn_gen, metrics)

    g_grads, (bn_gen, g_metrics) = jax.grad(g_loss_fn, has_aux=True)(
        state.params["gen"])
    new_params["gen"], new_opt["gen"] = _update_net(
        "gen", state.params["gen"], state.opt["gen"], g_grads, cfg,
        state.step)
    new_bn = dict(bn_d)
    new_bn["gen"] = bn_gen
    return state.replace(step=state.step + 1, params=new_params,
                         bn=new_bn, opt=new_opt), {**d_metrics, **g_metrics}


def jitted_train_step(cfg: ExperimentConfig):
    """jit(train_step) with cfg closed over (it contains Python branches)."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, real, labels):
        return train_step(state, real, labels, cfg)
    return step_fn


def multi_train_step(state: TrainState, batches, labels, frame_idx,
                     cfg: ExperimentConfig,
                     use_pallas=None, mesh=None
                     ) -> Tuple[TrainState, Dict[str, Any]]:
    """K adversarial steps as ONE program via lax.scan (dispatch
    amortization: each host->device dispatch costs a network round trip on
    remote TPU backends, so the host loop caps throughput at ~1/latency
    unless steps are batched into a single executable).

    batches: (K, B, T, H, W, C) float32 videos in [-1,1], OR uint8 raw clips
             at the stored resolution, in which case `frame_idx` (K, B, T)
             must be given and the fused B3 preproc (temporal gather +
             Pallas resize + normalize) runs INSIDE the scan body — one
             program does ingest + the full adversarial update.
    labels:  (K, B) int32 or None.
    Returns (state after K steps, metrics averaged over the K steps).
    """
    from mocogan_tpu.ops import preproc  # local import: avoids a cycle

    is_raw = batches.dtype == jnp.uint8

    def body(s, xs):
        real, lab, idx = xs
        if is_raw:
            real = preproc.subsample_and_preprocess(
                real, idx, cfg.model.image_size, use_pallas=use_pallas,
                mesh=mesh)
        s2, m = train_step(s, real, lab, cfg)
        return s2, m

    k = batches.shape[0]
    if frame_idx is None:
        if is_raw and batches.shape[2] != cfg.model.video_length:
            # An identity index over T_raw frames would feed
            # video_length-sized nets T_raw-frame clips and die with an
            # opaque dot-shape error deep inside jit.
            raise ValueError(
                f"multi_train_step: raw uint8 batches with T_raw="
                f"{batches.shape[2]} != video_length="
                f"{cfg.model.video_length} need explicit frame_idx "
                f"(the temporal window selection)")
        t = cfg.model.video_length
        frame_idx = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32),
            (k, batches.shape[1], t))
    state, ms = jax.lax.scan(body, state, (batches, labels, frame_idx))
    metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
    return state, metrics


def jitted_multi_train_step(cfg: ExperimentConfig):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batches, labels, frame_idx):
        return multi_train_step(state, batches, labels, frame_idx, cfg)
    return step_fn


def cached_multi_train_step(state: TrainState, pool: jax.Array,
                            lengths: jax.Array, pool_labels, k: int,
                            cfg: ExperimentConfig,
                            batch_sharding=None,
                            use_pallas=None, mesh=None
                            ) -> Tuple[TrainState, Dict[str, Any]]:
    """K steps with the ENTIRE dataset resident in HBM (device cache mode).

    MUG/Weizmann-scale corpora fit comfortably on one chip as uint8
    (~2 GB @96px), so the steady-state input path needs ZERO host traffic:
    each scan iteration samples clip indices and temporal windows from the
    step PRNG, gathers from the resident pool, runs the fused resize +
    normalize, and takes the adversarial step — all in one program.

    pool:        (N, T_max, H_raw, W_raw, C) uint8, replicated
    lengths:     (N,) int32 true frame counts (pool is padded to T_max)
    pool_labels: (N,) int32 or None
    """
    from mocogan_tpu.ops import preproc

    b = cfg.train.batch_size
    t = cfg.model.video_length

    def body(s, _):
        # ONE selection stream shared with the host-fed iterator
        # (sampling.batch_plan; clips.py evaluates the same program on CPU)
        sel, starts = sampling.batch_plan(s.root_key, s.step, b, lengths, t,
                                          cfg.data.epoch_shuffle)
        windows = sampling.gather_windows(pool, lengths, sel, starts, t)
        if batch_sharding is not None:
            # pool is replicated; pin the sampled batch to the data mesh so
            # the step shards exactly like the host-fed path
            windows = jax.lax.with_sharding_constraint(windows,
                                                       batch_sharding)
        real = preproc.resize_normalize_auto(windows, cfg.model.image_size,
                                             mesh=mesh,
                                             use_pallas=use_pallas)
        lab = (jnp.take(pool_labels, sel, axis=0)
               if cfg.model.conditional else None)
        s2, m = train_step(s, real, lab, cfg)
        return s2, m

    state, ms = jax.lax.scan(body, state, None, length=k)
    return state, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
