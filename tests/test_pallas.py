"""Pallas kernel tests (interpret mode on the CPU backend)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.models.encoders import TemporalEncoder
from maunet_tpu.ops.pallas.lstm import _pallas_forward, lstm_last_hidden_scan


@pytest.mark.parametrize("t,lengths", [
    (128, [128, 128]),           # exactly one chunk
    (300, [300, 150]),           # partial final chunk + per-sample masking
    (828, [828, 400]),           # production length
])
def test_lstm_kernel_matches_scan(rng, t, lengths):
    b, hd = 2, 16
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * hd)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(hd, 4 * hd)) * 0.1, jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    ours = _pallas_forward(x_proj, w_hh, lens, interpret=True)
    ref = lstm_last_hidden_scan(x_proj, w_hh, lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_lstm_blocks_respect_vmem_budget():
    """Sweep-sized batches (50-variant curves, 400-variant heatmap grids)
    must block over batch/time so double-buffered input blocks fit VMEM."""
    from maunet_tpu.ops.pallas.lstm import _VMEM_INPUT_BUDGET, _pick_blocks

    for b, four_h in [(1, 384), (8, 384), (50, 384), (400, 384),
                      (50, 64), (4096, 512)]:
        b_block, chunk = _pick_blocks(b, four_h)
        assert b_block % 8 == 0 and chunk % 8 == 0 and chunk <= 128
        assert 2 * b_block * chunk * four_h * 4 <= _VMEM_INPUT_BUDGET
    assert _pick_blocks(8, 384) == (8, 128)  # small batches: full time chunk
    b_block, chunk = _pick_blocks(400, 384)
    assert b_block <= 64


def test_lstm_kernel_large_batch_matches_scan(rng):
    b, t, hd = 50, 200, 16
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * hd)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(hd, 4 * hd)) * 0.1, jnp.float32)
    lens = jnp.asarray([t] * b, jnp.int32)
    ours = _pallas_forward(x_proj, w_hh, lens, interpret=True)
    ref = lstm_last_hidden_scan(x_proj, w_hh, lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("b,t,hd,lengths", [
    (2, 150, 8, [150, 90]),      # batch pad lanes (b < block) + masked tail
    (2, 128, 16, [128, 128]),    # exactly one time chunk
    (3, 300, 16, [300, 150, 40]),  # partial final chunk, reversed blocks
])
def test_lstm_pallas_backward_matches_scan_vjp(rng, b, t, hd, lengths):
    """The Pallas backward kernel (time-reversed scan with recomputed gates)
    must match the scan implementation's gradients, including per-sample
    length masking and the dW reduction excluding pad lanes."""
    from maunet_tpu.ops.pallas.lstm import _pallas_backward, _pallas_forward_stash

    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * hd)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(hd, 4 * hd)) * 0.1, jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)

    h_last, h_all, c_all = _pallas_forward_stash(x_proj, w_hh, lens,
                                                 interpret=True)
    ref = lstm_last_hidden_scan(x_proj, w_hh, lens)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref), atol=1e-5)

    g = jnp.asarray(rng.normal(size=(b, hd)), jnp.float32)
    dx, dw = _pallas_backward(x_proj, w_hh, lens, h_all, c_all, g,
                              interpret=True)
    _, vjp = jax.vjp(lambda x, w: lstm_last_hidden_scan(x, w, lens),
                     x_proj, w_hh)
    dx_ref, dw_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-4)


def test_lstm_custom_vjp_grads_match_scan(rng):
    """Training through the pallas backend: the custom VJP must produce the
    scan implementation's gradients."""
    import maunet_tpu.ops.pallas.lstm as plstm

    b, t, hd = 2, 150, 8
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * hd)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(size=(hd, 4 * hd)) * 0.1, jnp.float32)
    lens = jnp.asarray([150, 90], jnp.int32)

    orig_fwd = plstm._pallas_forward
    orig_stash = plstm._pallas_forward_stash
    orig_bwd = plstm._pallas_backward
    plstm._pallas_forward = lambda x, w, l, interpret=False: \
        orig_fwd(x, w, l, interpret=True)
    plstm._pallas_forward_stash = lambda x, w, l, interpret=False: \
        orig_stash(x, w, l, interpret=True)
    plstm._pallas_backward = lambda *a, interpret=False: \
        orig_bwd(*a, interpret=True)
    try:
        loss_pallas = lambda x, w: jnp.sum(plstm.lstm_last_hidden(x, w, lens) ** 2)
        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh)
    finally:
        plstm._pallas_forward = orig_fwd
        plstm._pallas_forward_stash = orig_stash
        plstm._pallas_backward = orig_bwd
    loss_scan = lambda x, w: jnp.sum(lstm_last_hidden_scan(x, w, lens) ** 2)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_hh)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), atol=1e-5)


def test_masked_class_sums_matches_xla(rng):
    from maunet_tpu.evaluate.metrics import _class_sums_xla
    from maunet_tpu.ops.pallas.masked_stats import masked_class_sums

    b, h, w, c = 2, 16, 16, 2
    pred = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    dw = jnp.asarray(rng.integers(0, 9, size=(b, h, w)), jnp.int32)

    err = pred - tgt
    ref = _class_sums_xla(jnp.abs(err), err * err, dw)
    ours = masked_class_sums(pred, tgt, dw, interpret=True)
    for a, b_ in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_temporal_encoder_backends_agree(rng):
    series = jnp.asarray(rng.normal(size=(2, 300)), jnp.float32)
    lengths = jnp.asarray([300, 123], jnp.int32)
    scan_enc = TemporalEncoder(16, 8, backend="scan", compute_dtype=jnp.float32)
    variables = scan_enc.init(jax.random.PRNGKey(0), series, lengths)
    out_scan = scan_enc.apply(variables, series, lengths)

    import maunet_tpu.ops.pallas.lstm as plstm

    orig = plstm._pallas_forward

    def interpreted(x_proj, w_hh, lens, interpret=False):
        return orig(x_proj, w_hh, lens, interpret=True)

    plstm._pallas_forward = interpreted
    try:
        pallas_enc = TemporalEncoder(16, 8, backend="pallas",
                                     compute_dtype=jnp.float32)
        out_pallas = pallas_enc.apply(variables, series, lengths)
    finally:
        plstm._pallas_forward = orig
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_pallas),
                               atol=1e-5)


def test_resize_pack_kernel_matches_einsum(rng):
    """Fused Pallas resize (interpret) vs the einsum path, packed and
    plain, across the production tile chains."""
    from maunet_tpu.ops.pallas.resize_pack import resize_pack, supported
    from maunet_tpu.ops.resize import resize_align_corners

    cases = [(128, 128, 256, 256, 2, 128), (64, 64, 128, 128, 1, 128),
             (64, 64, 128, 128, 2, 256), (128, 128, 256, 256, 4, 64),
             (16, 16, 32, 32, 1, 32), (8, 8, 16, 16, 1, 256)]
    for h, w, oh, ow, s, c in cases:
        assert supported((h, w), (oh, ow), s, c), (h, w, oh, ow, s, c)
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        got = resize_pack(x, (oh, ow), s, interpret=True)
        ref = resize_align_corners(x, (oh, ow), out_pack=s)
        ref = ref.x if hasattr(ref, "x") else ref
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
    # odd / unsupported shapes fall back
    assert not supported((25, 25), (50, 50), 1, 32)
    # narrow-channel packed resizes stay on the per-phase einsum path:
    # the kernel's per-phase dots would emit c<64 lanes each
    assert not supported((128, 128), (256, 256), 4, 32)
    assert not supported((15, 15), (31, 31), 1, 64)


def test_resize_pack_packed_input_matches_einsum(rng):
    """Packed-input resize (s_in>1 phase-split W-pass) vs the einsum path
    on the unpacked tensor — the production up(x1_*, 0) chain and the
    512² serving shape."""
    from maunet_tpu.ops.packed_conv import pack
    from maunet_tpu.ops.pallas.resize_pack import resize_pack, supported
    from maunet_tpu.ops.resize import resize_align_corners

    cases = [(64, 64, 128, 128, 4, 2, 64),    # up(x1_*, 0) at 128² tiles
             (128, 128, 256, 256, 4, 2, 64),  # same at 256² tiles
             (64, 64, 128, 128, 1, 2, 64)]    # packed in, plain out
    for h, w, oh, ow, s, s_in, c in cases:
        assert supported((h, w), (oh, ow), s, c, s_in=s_in), (h, w, oh, ow)
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        got = resize_pack(pack(x, s_in).x, (oh, ow), s, s_in=s_in,
                          interpret=True)
        ref = resize_align_corners(x, (oh, ow), out_pack=s)
        ref = ref.x if hasattr(ref, "x") else ref
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
    # packed channels must fill a full lane tile
    assert not supported((64, 64), (128, 128), 4, 32, s_in=2)


def test_resize_pack_packed_input_vjp(rng, monkeypatch):
    """Gradient through the packed-input kernel equals the einsum path's,
    arriving in the packed cotangent layout."""
    import maunet_tpu.ops.pallas.resize_pack as rp
    from maunet_tpu.ops.packed_conv import pack
    from maunet_tpu.ops.resize import resize_align_corners

    monkeypatch.setattr(
        rp, "resize_pack",
        functools.partial(rp.resize_pack.__wrapped__, interpret=True))
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)), jnp.float32)

    def loss_kernel(x):
        y = rp.resize_pack_vjp(pack(x, 2).x, (32, 32), 2, 2)
        return jnp.sum(jnp.sin(y))

    def loss_einsum(x):
        y = resize_align_corners(x, (32, 32), out_pack=2).x
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(loss_kernel)(x)
    g2 = jax.grad(loss_einsum)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_resize_pack_vjp_matches_einsum_grad(rng, monkeypatch):
    """The custom VJP (transposed-matrix einsum backward) equals the
    autodiff gradient of the einsum resize."""
    import maunet_tpu.ops.pallas.resize_pack as rp
    from maunet_tpu.ops.resize import resize_align_corners

    monkeypatch.setattr(
        rp, "resize_pack",
        functools.partial(rp.resize_pack.__wrapped__, interpret=True))
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)

    def loss_kernel(x):
        y = rp.resize_pack_vjp(x, (32, 32), 4)
        return jnp.sum(jnp.sin(y))

    def loss_einsum(x):
        y = resize_align_corners(x, (32, 32), out_pack=4).x
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(loss_kernel)(x)
    g2 = jax.grad(loss_einsum)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.parametrize("h,w,s,cout,cins,per_part", [
    # combined-halo path (many small parts: per-part would need more passes)
    (32, 64, 4, 32, (32, 32, 16), False),
    # per-part extended-weight halo path (the classic U-Net conv0_1 shape
    # class: every s*cin a multiple of 128, equal pass counts)
    (16, 32, 2, 64, (64, 128), True),
])
def test_packed_vgg_kernel_matches_xla(rng, h, w, s, cout, cins, per_part):
    """Fused packed conv+affine+ReLU kernel (interpret) vs the part-wise
    packed_conv path, with and without the pre-affine add term.  ``per_part``
    states explicitly which halo form each case must take (an explicit
    expectation, not derived from the case's shape — ADVICE r3)."""
    from maunet_tpu.ops.packed_conv import pack, pack_weights, packed_conv
    from maunet_tpu.ops.pallas.packed_vgg import (_per_part_halo,
                                                  packed_conv3x3_fused,
                                                  supported)

    b = 2
    assert _per_part_halo(cins, s) == per_part
    xs = [jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
          for c in cins]
    ks = [jnp.asarray(rng.normal(size=(3, 3, c, cout)) * 0.1, jnp.float32)
          for c in cins]
    scale = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    # compact add: rows {y=0, interior, y=h-1} (the kernel's VMEM broadcast)
    add = jnp.asarray(rng.normal(size=(b, 3, w // s, s * cout)), jnp.float32)
    add_full = jnp.concatenate(
        [add[:, 0:1], jnp.broadcast_to(add[:, 1:2], (b, h - 2, w // s,
                                                     s * cout)), add[:, 2:3]],
        axis=1)

    conv_sum = sum(packed_conv(pack(x, s), k, s, out_packed=True).x
                   for x, k in zip(xs, ks))
    parts = tuple(pack(x, s).x for x in xs)
    wps = tuple(pack_weights(k, s).reshape(3, (s + 2) * c, s * cout)
                for k, c in zip(ks, cins))
    assert supported([p.shape for p in parts], cins, s, cout)

    for extra in (None, add):
        ref = conv_sum if extra is None else conv_sum + add_full
        ref = jnp.maximum(ref * jnp.tile(scale, s) + jnp.tile(bias, s), 0.0)
        got = packed_conv3x3_fused(
            parts, wps, cins, s, cout,
            (jnp.tile(scale, s), jnp.tile(bias, s)),
            add=extra, relu=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
    # unsupported shapes gate out
    assert not supported([(2, 32, 64, 4 * 23)], (23,), 4, 32)   # cin % 8
    assert not supported([(2, 30, 64, 128)], (32,), 4, 32)      # h % 8


def test_packed_vgg_fused_model_matches_fallback(rng):
    """MetaUNetPP inference through the fused conv+BN+ReLU epilogue kernel
    (INTERPRET hook) equals the XLA packed fallback and the unpacked path,
    with randomized BN statistics."""
    import maunet_tpu.ops.pallas.packed_vgg as pvgg
    from maunet_tpu.models.factory import UrbanPredictor

    args = (jnp.asarray(rng.normal(size=(2, 32, 32, 23)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 48)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
            jnp.full((2,), 48, jnp.int32))
    kw = dict(base_filters=8, temporal_dim=8, meta_dim=8, lstm_dim=8,
              compute_dtype=jnp.float32)
    m = UrbanPredictor("unet++", pack_lanes=True, **kw)
    v = m.init(jax.random.PRNGKey(0), *args)
    # randomize BN stats so the folded affine is nontrivial
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: x + jnp.asarray(
            np.abs(rng.normal(size=x.shape)) * 0.3, x.dtype)
        if any(getattr(k, "key", None) == "batch_stats" or
               getattr(k, "key", None) in ("mean", "var", "scale", "bias")
               for k in p) else x, v)
    base = m.apply(v, *args)
    assert not pvgg.INTERPRET
    pvgg.INTERPRET = True
    try:
        fused = m.apply(v, *args)
    finally:
        pvgg.INTERPRET = False
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-5, rtol=1e-4)
    m0 = UrbanPredictor("unet++", pack_lanes=False, **kw)
    unpacked = m0.apply(v, *args)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unpacked),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("model_type,min_s", [
    ("unet++", 2),   # packs the 64-ch level-1 row at s=2 + level-0 at s=4
    ("unet", 2),     # packs the 64-ch level-0 row at s=2
])
def test_packed_s2_rows_match_unpacked(rng, model_type, min_s):
    """pack_min_s=2 routes the 64-channel rows through the fused kernel
    (including the cin-padded 23-channel first conv): interpret-mode Pallas
    and the XLA packed fallback must both match the unpacked model."""
    import maunet_tpu.ops.pallas.packed_vgg as pvgg
    from maunet_tpu.models.unet import MetaUNet
    from maunet_tpu.models.unetpp import MetaUNetPP

    args = (jnp.asarray(rng.normal(size=(2, 32, 32, 23)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 48)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
            jnp.full((2,), 48, jnp.int32))
    cls = MetaUNet if model_type == "unet" else MetaUNetPP
    # base_filters chosen so an s=2 row genuinely exists: unet level-0 at
    # 64 ch; unet++ level-1 at 64 ch (level-0 packs at s=4).
    kw = dict(base_filters=64 if model_type == "unet" else 32,
              temporal_dim=8, meta_dim=8, lstm_dim=8,
              compute_dtype=jnp.float32)
    m0 = cls(pack_lanes=False, **kw)
    v = m0.init(jax.random.PRNGKey(0), *args)
    # randomize BN stats so the folded affine is nontrivial
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: x + jnp.asarray(
            np.abs(rng.normal(size=x.shape)) * 0.3, x.dtype)
        if any(getattr(k, "key", None) == "batch_stats" for k in p) else x, v)
    base = m0.apply(v, *args)
    m1 = cls(pack_lanes=True, pack_min_s=min_s, **kw)
    fallback = m1.apply(v, *args)  # CPU: XLA packed path
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(base),
                               atol=5e-5, rtol=1e-4)
    assert not pvgg.INTERPRET
    pvgg.INTERPRET = True
    try:
        fused = m1.apply(v, *args)
    finally:
        pvgg.INTERPRET = False
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("model_type", ["unet", "unet++"])
def test_fuse_pair_model_matches_default(rng, model_type):
    """fuse_pair=True (whole-VGGBlock pair kernel) is a pure execution-
    strategy flag: same params, same outputs as the default chained-kernel
    path and the unpacked model.  The mode is default-OFF (measured v5e
    regression, blocks.VGGBlock.fuse_pair) but stays correct."""
    import maunet_tpu.ops.pallas.packed_vgg as pvgg
    from maunet_tpu.models.factory import UrbanPredictor

    args = (jnp.asarray(rng.normal(size=(2, 32, 32, 23)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 48)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
            jnp.full((2,), 48, jnp.int32))
    kw = dict(base_filters=64 if model_type == "unet" else 32,
              temporal_dim=8, meta_dim=8, lstm_dim=8,
              compute_dtype=jnp.float32, pack_lanes=True, pack_min_s=2)
    m0 = UrbanPredictor(model_type, **kw)
    v = m0.init(jax.random.PRNGKey(0), *args)
    v = jax.tree_util.tree_map_with_path(
        lambda p, x: x + jnp.asarray(
            np.abs(rng.normal(size=x.shape)) * 0.3, x.dtype)
        if any(getattr(k, "key", None) == "batch_stats" for k in p) else x, v)
    m1 = UrbanPredictor(model_type, fuse_pair=True, **kw)
    assert not pvgg.INTERPRET
    pvgg.INTERPRET = True
    try:
        base = m0.apply(v, *args)
        paired = m1.apply(v, *args)
    finally:
        pvgg.INTERPRET = False
    np.testing.assert_allclose(np.asarray(paired), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("model_type", ["unet", "unet++"])
def test_train_fused_conv_matches_xla(rng, model_type):
    """train_fused_conv routes the narrow train-mode convs through the
    lane-packed Pallas forward with a custom VJP (ops/train_conv.py):
    forward, loss, parameter gradients, and BN batch-stat updates must all
    match the XLA path at reassociation tolerance (f32)."""
    import maunet_tpu.ops.pallas.packed_vgg as pvgg
    from maunet_tpu.models.factory import UrbanPredictor

    args = (jnp.asarray(rng.normal(size=(2, 32, 32, 23)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 48)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
            jnp.full((2,), 48, jnp.int32))
    kw = dict(base_filters=64 if model_type == "unet" else 32,
              temporal_dim=8, meta_dim=8, lstm_dim=8,
              compute_dtype=jnp.float32)
    m0 = UrbanPredictor(model_type, **kw)
    m1 = UrbanPredictor(model_type, train_fused_conv=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), *args, train=True)
    params, stats = v["params"], v["batch_stats"]

    def loss_fn(m):
        def f(p):
            out, upd = m.apply({"params": p, "batch_stats": stats}, *args,
                               train=True, mutable=["batch_stats"])
            y = out[0] if isinstance(out, (list, tuple)) else out
            return jnp.mean(y.astype(jnp.float32) ** 2), upd
        return f

    (l0, upd0), g0 = jax.value_and_grad(loss_fn(m0), has_aux=True)(params)
    assert not pvgg.INTERPRET
    pvgg.INTERPRET = True
    try:
        (l1, upd1), g1 = jax.value_and_grad(loss_fn(m1), has_aux=True)(params)
    finally:
        pvgg.INTERPRET = False
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): x
             for k, x in jax.tree_util.tree_leaves_with_path(g1)}
    for k, x0 in flat0:
        x1 = flat1[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   atol=5e-4, rtol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))
    s0 = jax.tree_util.tree_leaves(upd0["batch_stats"])
    s1 = jax.tree_util.tree_leaves(upd1["batch_stats"])
    for a, b in zip(s1, s0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("h,w,s,cmid,cins,add_term", [
    # U-Net++ level-0 node class: two 32-ch parts + embedding add, s=4
    (16, 32, 4, 32, (32, 32), True),
    # classic U-Net level-0 conv0_0 class: one part, s=2, no add
    (16, 32, 2, 64, (64,), False),
])
def test_packed_pair_kernel_matches_chained(rng, h, w, s, cmid, cins,
                                            add_term):
    """Whole-VGGBlock fused kernel (conv1+BN+ReLU+conv2+BN+ReLU in one
    pallas_call, mid resident in VMEM) vs the two chained single-conv
    kernels — same math, one HBM round trip less."""
    from maunet_tpu.ops.packed_conv import pack, pack_weights
    from maunet_tpu.ops.pallas.packed_vgg import (packed_conv3x3_fused,
                                                  packed_pair_fused,
                                                  pair_supported)

    b, cout = 2, cmid
    xs = [jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
          for c in cins]
    k1s = [jnp.asarray(rng.normal(size=(3, 3, c, cmid)) * 0.1, jnp.float32)
           for c in cins]
    k2 = jnp.asarray(rng.normal(size=(3, 3, cmid, cout)) * 0.1, jnp.float32)
    a1 = jnp.asarray(rng.normal(size=(cmid,)) * 0.3 + 1.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(cmid,)), jnp.float32)
    a2 = jnp.asarray(rng.normal(size=(cout,)) * 0.3 + 1.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    add = (jnp.asarray(rng.normal(size=(b, 3, w // s, s * cmid)), jnp.float32)
           if add_term else None)

    parts = tuple(pack(x, s).x for x in xs)
    wps1 = tuple(pack_weights(k, s).reshape(3, (s + 2) * c, s * cmid)
                 for k, c in zip(k1s, cins))
    wp2 = pack_weights(k2, s).reshape(3, (s + 2) * cmid, s * cout)
    assert pair_supported([p.shape for p in parts], cins, s, cmid, cout)

    aff1 = (jnp.tile(a1, s), jnp.tile(b1, s))
    aff2 = (jnp.tile(a2, s), jnp.tile(b2, s))
    y1 = packed_conv3x3_fused(parts, wps1, cins, s, cmid, aff1, add=add,
                              relu=True, interpret=True)
    y2 = packed_conv3x3_fused((y1,), (wp2,), (cmid,), s, cout, aff2,
                              relu=True, interpret=True)
    got = packed_pair_fused(parts, wps1, cins, s, cmid, wp2, cout,
                            aff1, aff2, add=add, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y2),
                               atol=3e-5, rtol=1e-5)
