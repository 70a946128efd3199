"""Shape / dtype / grad sanity tests for the model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maunet_tpu.models import MetaUNet, MetaUNetPP, UrbanPredictor


def _inputs(rng, b=2, hw=64, t=48, meta=8):
    return (
        jnp.asarray(rng.normal(size=(b, hw, hw, 23)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, t)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, meta)), jnp.float32),
        jnp.asarray(rng.integers(1, t, size=(b,)), jnp.int32),
    )


@pytest.mark.parametrize("model_type", ["unet", "unet++"])
def test_forward_shapes(rng, model_type):
    model = UrbanPredictor(model_type=model_type, base_filters=8,
                           temporal_dim=4, meta_dim=4, lstm_dim=8,
                           compute_dtype=jnp.float32)
    maps, series, meta, lengths = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    out = model.apply(params, maps, series, meta, lengths)
    assert out.shape == (2, 64, 64, 2)
    assert out.dtype == jnp.float32
    # NDVI channel is tanh-bounded, LST unbounded (reference src/model.py:286-291)
    assert np.all(np.abs(np.asarray(out[..., 0])) <= 1.0)


def test_odd_tile_chain(rng):
    """The reference's odd 250 → 125 → 62 → 31 → 15 chain must work with
    static shapes (SURVEY.md §7 hard parts)."""
    model = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                     compute_dtype=jnp.float32)
    maps, series, meta, lengths = _inputs(rng, b=1, hw=50)
    params = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    out = model.apply(params, maps, series, meta, lengths)
    assert out.shape == (1, 50, 50, 2)


def test_embedding_ablations(rng):
    maps, series, meta, lengths = _inputs(rng)
    for temporal, metadata in [(False, False), (True, False), (False, True)]:
        model = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                         temporal_embeddings=temporal,
                         metadata_embeddings=metadata,
                         compute_dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = [jax.tree_util.keystr(k) for k, _ in flat]
        assert any("temporal_encoder" in n for n in names) == temporal
        assert any("meta_encoder" in n for n in names) == metadata
        out = model.apply(params, maps, series, meta, lengths)
        assert out.shape == (2, 64, 64, 2)


def test_deep_supervision_heads(rng):
    model = MetaUNetPP(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                       deep_supervision=True, compute_dtype=jnp.float32)
    maps, series, meta, lengths = _inputs(rng, b=1, hw=32)
    params = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    outs = model.apply(params, maps, series, meta, lengths)
    assert isinstance(outs, tuple) and len(outs) == 4
    for o in outs:
        assert o.shape == (1, 32, 32, 2)


def test_batchnorm_train_mode_updates_stats(rng):
    model = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                     compute_dtype=jnp.float32)
    maps, series, meta, lengths = _inputs(rng, b=2, hw=32)
    variables = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    out, updates = model.apply(
        variables, maps, series, meta, lengths, train=True,
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 32, 32, 2)
    old = variables["batch_stats"]["conv0_0"]["bn1"]["mean"]
    new = updates["batch_stats"]["conv0_0"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_remat_matches_plain(rng):
    """Rematerialized blocks must be numerically identical in forward and
    backward; only memory behaviour differs."""
    maps, series, meta, lengths = _inputs(rng, b=1, hw=32)
    plain = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                     compute_dtype=jnp.float32)
    rematted = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                        compute_dtype=jnp.float32, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), maps, series, meta, lengths)
    o1 = plain.apply(variables, maps, series, meta, lengths)
    o2 = rematted.apply(variables, maps, series, meta, lengths)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    def loss(m, params):
        return jnp.mean(m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            maps, series, meta, lengths) ** 2)

    g1 = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g2 = jax.grad(lambda p: loss(rematted, p))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6), g1, g2)


def test_grads_flow(rng):
    model = MetaUNet(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
                     compute_dtype=jnp.float32)
    maps, series, meta, lengths = _inputs(rng, b=1, hw=32)
    variables = model.init(jax.random.PRNGKey(0), maps, series, meta, lengths)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            maps, series, meta, lengths, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


@pytest.mark.parametrize("hw", [(9, 11), (3, 3), (2, 5), (1, 1)])
def test_split_conv_matches_concat_conv(rng, hw):
    """SplitConv over [spatial, spatial, broadcast] parts == one conv over
    the explicit channel concat (incl. zero-pad border closed form)."""
    from maunet_tpu.models.blocks import SplitConv, broadcast_embeddings

    h, w = hw
    b, f = 2, 7
    a1 = jnp.asarray(rng.normal(size=(b, h, w, 5)), jnp.float32)
    a2 = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(b, 4)), jnp.float32)

    conv = SplitConv(f, compute_dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(1), [a1, a2, e[:, None, None, :]])
    out = conv.apply(variables, [a1, a2, e[:, None, None, :]])

    full = jnp.concatenate([a1, a2, broadcast_embeddings(e, h, w)], axis=-1)
    import flax.linen as nn
    ref = nn.Conv(f, kernel_size=(3, 3), padding="SAME", dtype=jnp.float32,
                  param_dtype=jnp.float32)
    ref_out = ref.apply({"params": variables["params"]}, full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-5)


def test_pack_lanes_same_params_same_outputs(rng):
    """pack_lanes is a pure execution-strategy flag: identical parameter
    pytree and (up to f32 reassociation) identical outputs."""
    args = (jnp.asarray(rng.normal(size=(2, 32, 32, 23)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 48)), jnp.float32),
            jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
            jnp.full((2,), 48, jnp.int32))
    kw = dict(base_filters=4, temporal_dim=4, meta_dim=4, lstm_dim=8,
              compute_dtype=jnp.float32)
    for mt in ("unet", "unet++"):
        m0 = UrbanPredictor(mt, pack_lanes=False, **kw)
        m1 = UrbanPredictor(mt, pack_lanes=True, **kw)
        v = m0.init(jax.random.PRNGKey(0), *args)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            m1.init(jax.random.PRNGKey(0), *args))
        np.testing.assert_allclose(np.asarray(m0.apply(v, *args)),
                                   np.asarray(m1.apply(v, *args)), atol=2e-5)
