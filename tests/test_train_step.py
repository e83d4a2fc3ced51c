"""Train-step tests (R5): gradient partitioning, loss behavior, determinism,
and the 50-step integration run on synthetic clips (SURVEY.md §4
'Integration')."""

import jax
import jax.numpy as jnp
import numpy as np

from mocogan_tpu.data import synthetic
from mocogan_tpu.train import state as train_state
from mocogan_tpu.train import step as train_step
from mocogan_tpu.utils import prng


def test_step_runs_and_advances(tiny_cfg, tiny_batch):
    vids, _ = tiny_batch
    s = train_state.create(tiny_cfg)
    fn = train_step.jitted_train_step(tiny_cfg)
    s2, m = fn(s, jnp.asarray(vids), None)
    m = jax.device_get(m)
    assert int(s2.step) == 1
    assert all(np.isfinite(v) for v in m.values())
    assert {"loss_gen", "loss_di", "loss_dv"} <= set(m)


def test_step_deterministic(tiny_cfg, tiny_batch):
    """Same state + batch => bit-identical new params (PRNG discipline)."""
    vids, _ = tiny_batch
    fn = train_step.jitted_train_step(tiny_cfg)
    outs = []
    for _ in range(2):
        s = train_state.create(tiny_cfg)
        s2, _ = fn(s, jnp.asarray(vids), None)
        outs.append(jax.device_get(s2.params))
    a, b = outs
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(la, lb)


def test_gradient_partitioning(tiny_cfg, tiny_batch):
    """The joint backward must reproduce the reference's per-net gradients:
    G's gradient ignores the D losses; D gradients ignore the G loss."""
    vids, _ = tiny_batch
    s = train_state.create(tiny_cfg)
    key = prng.step_key(s.root_key, s.step)
    real = jnp.asarray(vids)

    grads, _ = jax.grad(train_step._loss_fn, has_aux=True)(
        s.params, s.bn, real, None, key, tiny_cfg)

    # Direct per-net gradients of the isolated loss terms.
    def g_only(pg):
        p = dict(s.params, gen=pg)
        total, (_, metrics) = train_step._loss_fn(p, s.bn, real, None, key,
                                                  tiny_cfg)
        return metrics["loss_gen"]

    g_direct = jax.grad(g_only)(s.params["gen"])
    for a, b in zip(jax.tree.leaves(grads["gen"]), jax.tree.leaves(g_direct)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def di_only(pdi):
        p = dict(s.params, di=pdi)
        total, (_, metrics) = train_step._loss_fn(p, s.bn, real, None, key,
                                                  tiny_cfg)
        return metrics["loss_di"]

    di_direct = jax.grad(di_only)(s.params["di"])
    for a, b in zip(jax.tree.leaves(grads["di"]), jax.tree.leaves(di_direct)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_categorical_step(tiny_cat_cfg):
    m = tiny_cat_cfg.model
    vids, labels = synthetic.make_batch(
        0, tiny_cat_cfg.train.batch_size, t=m.video_length,
        size=m.image_size, n_classes=m.n_classes)
    s = train_state.create(tiny_cat_cfg)
    fn = train_step.jitted_train_step(tiny_cat_cfg)
    s2, metrics = fn(s, jnp.asarray(vids), jnp.asarray(labels))
    metrics = jax.device_get(metrics)
    assert "loss_aux_d" in metrics and "loss_aux_g" in metrics
    assert all(np.isfinite(v) for v in metrics.values())


def test_bfloat16_compute_step(tiny_cfg):
    """bf16 compute path (config 5) trains: params stay fp32, losses finite."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg, model=dataclasses.replace(tiny_cfg.model,
                                            compute_dtype="bfloat16"))
    vids, _ = synthetic.make_batch(0, cfg.train.batch_size,
                                   t=cfg.model.video_length,
                                   size=cfg.model.image_size)
    s = train_state.create(cfg)
    fn = train_step.jitted_train_step(cfg)
    s, m = fn(s, jnp.asarray(vids), None)
    m = jax.device_get(m)
    assert all(np.isfinite(v) for v in m.values())
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(jax.device_get(s.params))
               if hasattr(p, "dtype"))


def test_integration_50_steps(tiny_cfg):
    """50-step run on synthetic clips: finite losses, D learns (its loss
    drops), G's samples change (training is actually updating G)."""
    from mocogan_tpu.models import generator

    m = tiny_cfg.model
    s = train_state.create(tiny_cfg)
    v0 = np.asarray(generator.generate(s.params["gen"], s.bn["gen"],
                                       jax.random.key(99), 2, m))
    fn = train_step.jitted_train_step(tiny_cfg)
    it = synthetic.batch_iterator(1, tiny_cfg.train.batch_size,
                                  t=m.video_length, size=m.image_size)
    history = []
    for i in range(50):
        vids, _ = next(it)
        s, metrics = fn(s, jnp.asarray(vids), None)
        history.append(metrics)
    history = jax.device_get(history)
    assert all(np.isfinite(v) for h in history for v in h.values())
    d_start = np.mean([h["loss_di"] for h in history[:5]])
    d_end = np.mean([h["loss_di"] for h in history[-5:]])
    assert d_end < d_start, (d_start, d_end)
    v1 = np.asarray(generator.generate(s.params["gen"], s.bn["gen"],
                                       jax.random.key(99), 2, m))
    assert not np.allclose(v0, v1)


def test_prng_step_and_role_keys_disjoint():
    """Role keys must never collide with step keys: with role ids 0..7,
    fold_in(root, 6) would be both the 'init' key and step 6's key,
    coupling parameter init with step-6 randomness (role ids now live at
    2^30 + i)."""
    root = jax.random.key(123)
    role_data = {
        r: np.asarray(jax.random.key_data(prng.role_key(root, r)))
        for r in prng._ROLES
    }
    for s in range(64):
        sk = np.asarray(jax.random.key_data(prng.step_key(root, s)))
        for r, rd in role_data.items():
            assert not np.array_equal(sk, rd), (s, r)


def test_label_smoothing_math():
    """One-sided smoothing: L_real = (1-s)sp(-x) + s*sp(x); fake unchanged."""
    from mocogan_tpu.ops import losses

    x = jnp.asarray([0.3, -1.2, 2.0])
    f = jnp.asarray([0.5, 0.1, -0.7])
    s = 0.1
    got = losses.d_loss(x, f, label_smoothing=s)
    want = ((1 - s) * np.mean(np.logaddexp(0, -np.asarray(x)))
            + s * np.mean(np.logaddexp(0, np.asarray(x)))
            + np.mean(np.logaddexp(0, np.asarray(f))))
    np.testing.assert_allclose(float(got), want, rtol=1e-6)
    # s=0 is exactly the reference formulation
    np.testing.assert_allclose(float(losses.d_loss(x, f)),
                               float(losses.d_loss(x, f, 0.0)))


def test_update_ratio_skips_d_updates(tiny_cfg, tiny_batch):
    """d_update_every=2: D params+opt state frozen on odd steps, G updates
    every step; both move on even steps."""
    import dataclasses

    vids, _ = tiny_batch
    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train,
                                            d_update_every=2))
    s0 = train_state.create(cfg)
    fn = train_step.jitted_train_step(cfg)

    def flat(tree):
        return np.concatenate([np.ravel(np.asarray(x))
                               for x in jax.tree.leaves(jax.device_get(tree))])

    # fn donates its state arg: snapshot host copies before the next call
    s1, _ = fn(s0, jnp.asarray(vids), None)       # step 0 -> D updates
    di1, dv1 = flat(s1.params["di"]), flat(s1.params["dv"])
    gen1, opt_di1 = flat(s1.params["gen"]), flat(s1.opt["di"])
    s2, _ = fn(s1, jnp.asarray(vids), None)       # step 1 -> D frozen
    di2, gen2 = flat(s2.params["di"]), flat(s2.params["gen"])
    np.testing.assert_array_equal(di2, di1)
    np.testing.assert_array_equal(flat(s2.params["dv"]), dv1)
    np.testing.assert_array_equal(flat(s2.opt["di"]), opt_di1)
    assert not np.array_equal(gen2, gen1)
    s3, _ = fn(s2, jnp.asarray(vids), None)       # step 2 -> D updates again
    assert not np.array_equal(flat(s3.params["di"]), di2)


def test_sequential_update_order(tiny_cfg, tiny_batch):
    """update_order="sequential" (VERDICT r2 missing #2): the D updates are
    IDENTICAL to simultaneous mode by construction (same start-of-iteration
    params, same PRNG -> same fakes), while G's update differs because its
    loss is computed against the post-update discriminators."""
    import dataclasses

    vids, _ = tiny_batch
    seq_cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(tiny_cfg.train,
                                            update_order="sequential"))
    s_sim, m_sim = train_step.jitted_train_step(tiny_cfg)(
        train_state.create(tiny_cfg), jnp.asarray(vids), None)
    s_seq, m_seq = train_step.jitted_train_step(seq_cfg)(
        train_state.create(seq_cfg), jnp.asarray(vids), None)
    m_seq = jax.device_get(m_seq)
    assert int(s_seq.step) == 1
    assert all(np.isfinite(v) for v in m_seq.values())
    # D losses are computed from the same pre-update params in both modes.
    m_sim = jax.device_get(m_sim)
    np.testing.assert_allclose(m_seq["loss_di"], m_sim["loss_di"], rtol=1e-5)
    np.testing.assert_allclose(m_seq["loss_dv"], m_sim["loss_dv"], rtol=1e-5)
    for net in ("di", "dv"):
        for a, b in zip(jax.tree.leaves(jax.device_get(s_sim.params[net])),
                        jax.tree.leaves(jax.device_get(s_seq.params[net]))):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    gen_a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
        jax.device_get(s_sim.params["gen"]))])
    gen_b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
        jax.device_get(s_seq.params["gen"]))])
    assert not np.allclose(gen_a, gen_b)

    with np.testing.assert_raises(ValueError):
        bad = dataclasses.replace(
            tiny_cfg, train=dataclasses.replace(tiny_cfg.train,
                                                update_order="nope"))
        train_step.train_step(train_state.create(bad), jnp.asarray(vids),
                              None, bad)


def test_ttur_learning_rates(tiny_cfg):
    """Per-side lr overrides reach the right optimizers."""
    import dataclasses

    import optax

    cfg = dataclasses.replace(
        tiny_cfg, train=dataclasses.replace(
            tiny_cfg.train, d_learning_rate=1e-3, g_learning_rate=5e-5))
    # optax.adam closes over lr; verify via a single-param update magnitude
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.ones((4,))}
    for net, lr in [("gen", 5e-5), ("di", 1e-3), ("dv", 1e-3)]:
        tx = train_state.make_optimizer(cfg, net)
        st = tx.init(p)
        up, _ = tx.update(g, st, p)
        # Adam's first step is -lr * g/(sqrt(g^2)+eps) ~= -lr
        np.testing.assert_allclose(np.asarray(up["w"]), -lr, rtol=1e-3)
