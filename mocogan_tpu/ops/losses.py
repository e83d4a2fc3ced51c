"""GAN losses (reference R5 — Updater.update_core loss arithmetic).

The reference uses Chainer's sigmoid-cross-entropy GAN formulation, i.e.
softplus losses (MoCoGAN paper Eq. 5, alternating scheme):

    L_D = softplus(-D(real)) + softplus(D(fake))
    L_G = softplus(-D(fake))

plus, for categorical MoCoGAN (R10/config 4), an InfoGAN-style auxiliary
categorical cross-entropy on D_V's class head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_loss(real_logits: jax.Array, fake_logits: jax.Array,
           label_smoothing: float = 0.0) -> jax.Array:
    """Discriminator loss; logits of any matching shape, mean-reduced.
    Always computed in fp32 (bf16 softplus loses the loss signal).

    label_smoothing s > 0 applies ONE-SIDED smoothing (Salimans et al.
    2016): the real-label target becomes 1-s, i.e.
        L_real = (1-s)*softplus(-x) + s*softplus(x),
    fake targets stay hard. Caps D's attainable advantage so its loss can't
    collapse to ~0 and starve G of gradient (the balance lever for the
    late-training collapse seen on the 60k flagship run). s=0 is exactly
    the reference's formulation."""
    real = real_logits.astype(jnp.float32)
    l_real = jnp.mean(jax.nn.softplus(-real))
    if label_smoothing:
        s = float(label_smoothing)
        l_real = (1.0 - s) * l_real + s * jnp.mean(jax.nn.softplus(real))
    return l_real + jnp.mean(jax.nn.softplus(fake_logits.astype(jnp.float32)))


def g_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating generator loss (fp32)."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def categorical_loss(class_logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Auxiliary CE on D_V's class head. labels: int32 (B,)."""
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
