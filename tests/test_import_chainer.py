"""Golden tests for the Chainer npz checkpoint importer (VERDICT round-1
missing #1): every layout conversion is proven against jax's own
NCHW/OIHW convolution (Chainer's native layout) or the conv ADJOINT
(Chainer Deconvolution2D's definition), plus a full roundtrip and an
end-to-end import of a synthetically-written Chainer-convention npz."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocogan_tpu.eval import import_chainer as imp
from mocogan_tpu.ops import layers


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(
        size=shape).astype(np.float32) * 0.1


# ---------------------------------------------------------------------------
# layout conversions vs Chainer-native-layout ground truth
# ---------------------------------------------------------------------------

def test_conv2d_layout_matches_nchw_oihw():
    w_ch = _rand(8, 3, 4, 4, seed=1)              # Chainer Convolution2D W
    x = _rand(2, 16, 16, 3, seed=2)               # our NHWC input
    ours = layers.conv2d({"w": jnp.asarray(imp.conv2d_w(w_ch))},
                         jnp.asarray(x), stride=2)
    truth = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 3, 1, 2)), jnp.asarray(w_ch),
        window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    np.testing.assert_allclose(np.asarray(ours),
                               np.asarray(truth).transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_conv3d_layout_matches_ncdhw_oidhw():
    w_ch = _rand(4, 3, 4, 4, 4, seed=3)           # Chainer ConvolutionND W
    x = _rand(2, 8, 16, 16, 3, seed=4)            # our NDHWC input
    ours = layers.conv3d({"w": jnp.asarray(imp.conv3d_w(w_ch))},
                         jnp.asarray(x), stride=(1, 2, 2))
    truth = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 4, 1, 2, 3)), jnp.asarray(w_ch),
        window_strides=(1, 2, 2), padding="SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    np.testing.assert_allclose(np.asarray(ours),
                               np.asarray(truth).transpose(0, 2, 3, 4, 1),
                               atol=1e-5)


def test_deconv2d_layout_matches_conv_adjoint():
    """Chainer Deconvolution2D(W) IS the adjoint (input-gradient) of the
    strided convolution whose kernel is W viewed OIHW; prove the imported
    kernel reproduces jax's own vjp of that NCHW convolution."""
    c1, c2 = 6, 3                                   # deconv: c1 -> c2, 2x up
    w_ch = _rand(c1, c2, 4, 4, seed=5)              # Chainer deconv W (I,O,..)
    x = _rand(2, 8, 8, c1, seed=6)                  # our NHWC deconv input

    ours = layers.deconv2d({"w": jnp.asarray(imp.deconv2d_w(w_ch))},
                           jnp.asarray(x), stride=2)

    def conv_nchw(y):                               # c2 -> c1 downsampling
        return jax.lax.conv_general_dilated(
            y, jnp.asarray(w_ch), window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    y0 = jnp.zeros((2, c2, 16, 16), jnp.float32)
    truth = jax.vjp(conv_nchw, y0)[1](
        jnp.asarray(x.transpose(0, 3, 1, 2)))[0]    # (2, c2, 16, 16)
    np.testing.assert_allclose(np.asarray(ours),
                               np.asarray(truth).transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_linear_flatten_reorders_chw_to_hwc():
    c, h = 5, 3
    w_ch = _rand(2, c * h * h, seed=7)              # Chainer Linear W (out,in)
    fmap = _rand(4, c, h, h, seed=8)                # NCHW feature map
    truth = fmap.reshape(4, -1) @ w_ch.T            # Chainer flatten: (C,H,W)
    ours = layers.dense(
        {"w": jnp.asarray(imp.linear_w_from_chw(w_ch, c, h, h))},
        jnp.asarray(fmap.transpose(0, 2, 3, 1).reshape(4, -1)))
    np.testing.assert_allclose(np.asarray(ours), truth, atol=1e-5)


def test_linear_flatten_reorders_cthw_to_thwc():
    c, t, h = 4, 2, 3
    w_ch = _rand(2, c * t * h * h, seed=9)
    fmap = _rand(4, c, t, h, h, seed=10)            # NCDHW video features
    truth = fmap.reshape(4, -1) @ w_ch.T
    ours = layers.dense(
        {"w": jnp.asarray(imp.linear_w_from_cthw(w_ch, c, t, h, h))},
        jnp.asarray(fmap.transpose(0, 2, 3, 4, 1).reshape(4, -1)))
    np.testing.assert_allclose(np.asarray(ours), truth, atol=1e-5)


def test_linear_to_feature_map_reorders_columns():
    """Generator fc: Chainer reshapes rows to (C,s,s); ours to (s,s,C)."""
    c, s, din = 6, 2, 5
    w_ch = _rand(c * s * s, din, seed=11)
    z = _rand(3, din, seed=12)
    truth = (z @ w_ch.T).reshape(3, c, s, s)        # Chainer reshape
    ours = np.asarray(layers.dense(
        {"w": jnp.asarray(imp.linear_w_to_chw(w_ch, c, s, s))},
        jnp.asarray(z))).reshape(3, s, s, c)
    np.testing.assert_allclose(ours, truth.transpose(0, 2, 3, 1), atol=1e-5)


def test_gru_fusion_matches_chainer_equations():
    """Fused GRU blocks == Chainer L.GRU's six-Linear computation,
    including reset-before-candidate-matmul and per-Linear biases."""
    from mocogan_tpu.models import motion

    di, dh, b = 4, 3, 5
    rng = np.random.default_rng(13)
    links = {k: rng.normal(size=(dh, di if k.startswith("W") else dh)
                           ).astype(np.float32) * 0.3
             for k in ["W_r", "W_z", "W", "U_r", "U_z", "U"]}
    biases = {k: rng.normal(size=(dh,)).astype(np.float32) * 0.3
              for k in links}
    x = rng.normal(size=(b, di)).astype(np.float32)
    h = rng.normal(size=(b, dh)).astype(np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    def lin(k, v):
        return v @ links[k].T + biases[k]

    r = sig(lin("W_r", x) + lin("U_r", h))
    z = sig(lin("W_z", x) + lin("U_z", h))
    h_bar = np.tanh(lin("W", x) + lin("U", r * h))
    truth = (1 - z) * h + z * h_bar

    fused = {
        "w": np.concatenate([links["W_r"].T, links["W_z"].T, links["W"].T],
                            axis=1),
        "u": np.concatenate([links["U_r"].T, links["U_z"].T, links["U"].T],
                            axis=1),
        "b": np.concatenate([biases["W_r"] + biases["U_r"],
                             biases["W_z"] + biases["U_z"],
                             biases["W"] + biases["U"]]),
    }
    got = motion.gru_cell(jax.tree.map(jnp.asarray, fused), jnp.asarray(h),
                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), truth, atol=1e-5)


# ---------------------------------------------------------------------------
# roundtrip + end-to-end import
# ---------------------------------------------------------------------------

def test_export_import_roundtrip_all_nets(tmp_path, tiny_cfg):
    from mocogan_tpu.train import state as train_state

    state = train_state.create(tiny_cfg)
    for net in ["gen", "di", "dv"]:
        path = str(tmp_path / f"{net}.npz")
        imp.export_net_npz(path, net, jax.device_get(state.params[net]),
                           jax.device_get(state.bn[net]), tiny_cfg.model)
        params, bn, report = imp.import_net_npz(path, net, tiny_cfg.model)
        assert not report["missing"] and not report["shape_mismatch"], report
        want_p = jax.device_get(state.params[net])
        for wl, gl in zip(jax.tree.leaves(want_p), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
        want_b = jax.device_get(state.bn[net])
        assert jax.tree.structure(want_b) == jax.tree.structure(bn)
        for wl, gl in zip(jax.tree.leaves(want_b), jax.tree.leaves(bn)):
            np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))


def test_import_synthetic_chainer_npz_and_generate(tmp_path, tiny_cfg):
    """Write a generator npz FROM SCRATCH in Chainer naming/shapes (as the
    real save_npz would), import it, run generate(): deterministic digest
    + absorbed pre-BN biases reported."""
    from mocogan_tpu.eval.parity import video_digest
    from mocogan_tpu.models import generator
    from mocogan_tpu.ops.layers import out_size_up

    m = tiny_cfg.model
    ngf = m.gen_features
    s0 = out_size_up(m.image_size, 4)
    widths = [ngf * 8, ngf * 4, ngf * 2, ngf]
    rng = np.random.default_rng(7)

    def n(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    entries = {}
    for g, dim in [("W_r", m.dim_eps), ("W_z", m.dim_eps), ("W", m.dim_eps),
                   ("U_r", m.dim_motion), ("U_z", m.dim_motion),
                   ("U", m.dim_motion)]:
        entries[f"gru/{g}/W"] = n(m.dim_motion, dim)
        entries[f"gru/{g}/b"] = n(m.dim_motion)
    entries["fc/W"] = n(widths[0] * s0 * s0, m.dim_z)
    entries["fc/b"] = n(widths[0] * s0 * s0)     # pre-BN: must be absorbed
    for bn_name, c in [("bn_fc", widths[0]), ("bn0", widths[1]),
                       ("bn1", widths[2]), ("bn2", widths[3])]:
        entries[f"{bn_name}/gamma"] = 1 + 0.1 * n(c)
        entries[f"{bn_name}/beta"] = n(c)
        entries[f"{bn_name}/avg_mean"] = n(c)
        entries[f"{bn_name}/avg_var"] = 1 + 0.1 * np.abs(n(c))
        entries[f"{bn_name}/N"] = np.zeros((), np.int32)
    cin = widths[0]
    for i in range(4):
        cout = m.channels if i == 3 else widths[i + 1]
        entries[f"dc{i}/W"] = n(cin, cout, 4, 4)
        entries[f"dc{i}/b"] = n(cout)            # inner ones absorbed
        cin = cout
    path = str(tmp_path / "gen_chainer.npz")
    np.savez(path, **entries)

    params, bn, report = imp.import_net_npz(path, "gen", m)
    assert not report["missing"] and not report["shape_mismatch"], report
    absorbed = {a["key"] for a in report["absorbed"]}
    assert {"fc/b", "dc0/b", "dc1/b", "dc2/b"} <= absorbed
    assert not report["unused"], report["unused"]

    params = jax.tree.map(jnp.asarray, params)
    bn = jax.tree.map(jnp.asarray, bn)
    v1 = jax.device_get(generator.generate(params, bn, jax.random.key(0), 2,
                                           m))
    v2 = jax.device_get(generator.generate(params, bn, jax.random.key(0), 2,
                                           m))
    assert np.isfinite(np.asarray(v1)).all()
    assert video_digest(np.asarray(v1)) == video_digest(np.asarray(v2))


def test_import_rename_and_report(tmp_path, tiny_cfg):
    """Unknown real naming is adapted via --rename; problems are reported
    per tensor instead of failing silently."""
    m = tiny_cfg.model
    # export a valid net, then mangle one key name and one shape
    from mocogan_tpu.train import state as train_state

    state = train_state.create(tiny_cfg)
    imp.export_net_npz(str(tmp_path / "di.npz"), "di",
                       jax.device_get(state.params["di"]),
                       jax.device_get(state.bn["di"]), m)
    data = dict(np.load(str(tmp_path / "di.npz")))
    data["conv_first/W"] = data.pop("c0/W")          # renamed in the "real" repo
    data["fc/W"] = data["fc/W"][:, :5]               # wrong shape
    np.savez(str(tmp_path / "di2.npz"), **data)

    with pytest.raises(ValueError, match="import incomplete"):
        imp.import_net_npz(str(tmp_path / "di2.npz"), "di", m)
    _, _, report = imp.import_net_npz(
        str(tmp_path / "di2.npz"), "di", m,
        rename={"conv_first/W": "c0/W"}, strict=False)
    assert any(r["key"] == "fc/W" for r in report["shape_mismatch"])
    assert "c0/W" in report["matched"]


def test_partial_import_merges_over_random_init(tmp_path, tiny_cfg):
    """strict=False contract: tensors MISSING from the npz keep their
    randomly-initialized values (merge, not wholesale subtree replace —
    a replace leaves holes that crash the first forward)."""
    from mocogan_tpu.models import generator
    from mocogan_tpu.train import state as train_state

    state = train_state.create(tiny_cfg)
    full = str(tmp_path / "gen_full.npz")
    imp.export_net_npz(full, "gen", jax.device_get(state.params["gen"]),
                       jax.device_get(state.bn["gen"]), tiny_cfg.model)
    raw = dict(np.load(full))
    dropped = [k for k in raw if k.startswith("dc3/")]
    assert dropped
    for k in dropped:
        del raw[k]
    partial = str(tmp_path / "gen_partial.npz")
    np.savez(partial, **raw)

    with pytest.raises(ValueError, match="incomplete"):
        imp.import_net_npz(partial, "gen", tiny_cfg.model)  # strict default

    state2, reports = imp.import_experiment(tiny_cfg, gen_npz=partial,
                                            strict=False)
    assert reports["gen"]["missing"]
    # the missing deconv keeps its random init; everything else matches
    p0 = jax.device_get(state.params["gen"])
    p2 = jax.device_get(state2.params["gen"])
    assert jax.tree.structure(p0) == jax.tree.structure(p2)
    np.testing.assert_array_equal(np.asarray(p0["deconv3"]["w"]),
                                  np.asarray(p2["deconv3"]["w"]))
    # and the imported state is actually usable end to end
    v = jax.device_get(generator.generate(
        jax.tree.map(jnp.asarray, p2),
        jax.tree.map(jnp.asarray, jax.device_get(state2.bn["gen"])),
        jax.random.key(0), 2, tiny_cfg.model))
    assert np.isfinite(np.asarray(v)).all()


def test_trainer_snapshot_auto_split(tmp_path, tiny_cfg):
    """A whole Chainer Trainer snapshot npz (updater/model:<name>/... keys
    plus optimizer/iterator noise) imports in ONE call, matching the
    per-net imports exactly (VERDICT r2 next-round #9)."""
    from mocogan_tpu.train import state as train_state

    state = train_state.create(tiny_cfg)
    entries = {}
    group_names = {"gen": "gen", "di": "image_dis", "dv": "video_dis"}
    for net, gname in group_names.items():
        path = str(tmp_path / f"{net}.npz")
        imp.export_net_npz(path, net, jax.device_get(state.params[net]),
                           jax.device_get(state.bn[net]), tiny_cfg.model)
        for k, v in np.load(path).items():
            entries[f"updater/model:{gname}/{k}"] = v
            # realistic non-model noise the splitter must ignore
            entries[f"updater/optimizer:{gname}/{k}/m"] = np.zeros_like(v)
    entries["updater/iteration"] = np.asarray(12345)
    entries["extensions/LogReport/_log"] = np.asarray(0)
    snap = str(tmp_path / "snapshot_iter_12345.npz")
    np.savez(snap, **entries)

    nets, report = imp.split_trainer_snapshot(snap)
    assert set(nets) == {"gen", "di", "dv"}
    assert report["groups"] == group_names and not report["unmapped"]

    state2, reports = imp.import_experiment(tiny_cfg, snapshot_npz=snap)
    for net in ("gen", "di", "dv"):
        assert not reports[net]["missing"], reports[net]
        for a, b in zip(jax.tree.leaves(jax.device_get(state.params[net])),
                        jax.tree.leaves(jax.device_get(state2.params[net]))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # not-a-snapshot file fails loudly
    flat = str(tmp_path / "flat.npz")
    np.savez(flat, **{"dc0/W": np.zeros((2, 2, 4, 4), np.float32)})
    with pytest.raises(ValueError, match="model:"):
        imp.split_trainer_snapshot(flat)

    # two groups claiming the same net fail loudly
    dup = {f"updater/model:gen/{k}": v for k, v in np.load(
        str(tmp_path / "gen.npz")).items()}
    dup.update({f"updater/model:generator2/{k}": v for k, v in np.load(
        str(tmp_path / "gen.npz")).items()})
    dpath = str(tmp_path / "dup.npz")
    np.savez(dpath, **dup)
    with pytest.raises(ValueError, match="two groups"):
        imp.split_trainer_snapshot(dpath)


def test_snapshot_split_short_token_names(tmp_path, tiny_cfg):
    """Short/abbreviated group names map correctly: 'v_dis' must go to dv
    (substring 'di' in 'dis' must NOT capture it for the image net)."""
    from mocogan_tpu.train import state as train_state

    state = train_state.create(tiny_cfg)
    entries = {}
    for net, gname in (("gen", "g_gen"), ("di", "i_dis"), ("dv", "v_dis")):
        path = str(tmp_path / f"{net}.npz")
        imp.export_net_npz(path, net, jax.device_get(state.params[net]),
                           jax.device_get(state.bn[net]), tiny_cfg.model)
        for k, v in np.load(path).items():
            entries[f"updater/model:{gname}/{k}"] = v
    np.savez(str(tmp_path / "s.npz"), **entries)
    nets, report = imp.split_trainer_snapshot(str(tmp_path / "s.npz"))
    assert report["groups"] == {"gen": "g_gen", "di": "i_dis",
                                "dv": "v_dis"}, report
