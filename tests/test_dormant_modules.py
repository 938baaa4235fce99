"""Tests for the dormant-capability library: CoordConv, ConvGRU,
RecurrentHourglass, VGG16, DCGAN decoder, DQN selector, transformer stack,
WAE match loss, on-device KMeans."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn.conv_gru import ConvGRUCell
from tpuseg.nn.coord_conv import CoordConv, CoordConvTranspose, add_coordinates
from tpuseg.nn.dcgan_decoder import DcganDecoder
from tpuseg.nn.dqn import DQNSelecter, ReplayBuffer, RLSelect
from tpuseg.nn.hourglass import RecurrentHourglass
from tpuseg.nn.transformer import (
    MultiHeadAttention,
    NonLocalLayer,
    ScalePDAttention,
    TransformerDecoderLayer,
    make_position_encoding,
)
from tpuseg.nn.vgg16 import SkipVGG16, VGG16
from tpuseg.runtime.cluster import kmeans_cluster
from tpuseg.runtime.wae import MatchLoss

KEY = jax.random.PRNGKey(0)


def test_add_coordinates_values():
    x = jnp.zeros((1, 4, 4, 2))
    out = add_coordinates(x, with_r=True)
    assert out.shape == (1, 4, 4, 5)
    arr = np.asarray(out)
    # y plane corners at -1/1 ; center r > 0 scaled to max 1
    assert arr[0, 0, 0, 0] == -1.0 and arr[0, 3, 0, 0] == 1.0
    assert arr[0, 0, 0, 1] == -1.0 and arr[0, 0, 3, 1] == 1.0
    np.testing.assert_allclose(arr[0, 0, 0, 2], 1.0, rtol=1e-6)


def test_coord_conv_shapes():
    m = CoordConv(8, 3, padding=1, with_r=True)
    x = jnp.ones((2, 8, 8, 3))
    v = m.init(KEY, x)
    assert m.apply(v, x).shape == (2, 8, 8, 8)
    mt = CoordConvTranspose(4, 2, stride=2)
    vt = mt.init(KEY, x)
    assert mt.apply(vt, x).shape == (2, 16, 16, 4)


def test_conv_gru_cell():
    m = ConvGRUCell(hidden_size=6, kernel_size=3)
    x = jnp.ones((2, 8, 8, 3))
    v = m.init(KEY, x, None)
    h1 = m.apply(v, x, None)
    assert h1.shape == (2, 8, 8, 6)
    h2 = m.apply(v, x, h1)
    assert h2.shape == (2, 8, 8, 6)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_recurrent_hourglass():
    m = RecurrentHourglass(
        hidden_n_filters=8, kernel_size=3, n_levels=3, embedding_size=4
    )
    x = jnp.ones((1, 16, 16, 3))
    v = m.init(KEY, x)
    assert m.apply(v, x).shape == (1, 16, 16, 4)


def test_vgg16_and_skip():
    x = jnp.ones((1, 32, 32, 3))
    m = VGG16(n_layers=16)
    v = m.init(KEY, x)
    out = m.apply(v, x)
    # 16 torch layers = 2 pools deep, 256 channels
    assert out.shape == (1, 8, 8, 256)
    s = SkipVGG16()
    vs = s.init(KEY, x)
    outs = s.apply(vs, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 64), (1, 16, 16, 128), (1, 8, 8, 256)
    ]


def test_dcgan_decoder():
    m = DcganDecoder(coding=8, num_units=16, num_layers=3, out_shape=(32, 32, 1))
    z = jnp.ones((4, 8))
    v = m.init(KEY, z)
    out = m.apply(v, z)
    assert out.shape == (4, 32, 32)
    arr = np.asarray(out)
    assert arr.min() >= 0 and arr.max() <= 1


def test_rl_select_and_dqn_update():
    sel = DQNSelecter.create(channels=6, h=8, w=8, seed=0)
    state = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6).astype(np.float32))
    mask = jnp.asarray((np.random.RandomState(1).rand(2, 64) < 0.5).astype(np.float32))
    q = sel.q_values(state, mask)
    assert q.shape == (2, 64)
    actions = sel.act(jax.random.PRNGKey(2), state, mask)
    # actions always land on masked-in pixels
    assert all(float(mask[i, int(a)]) > 0 for i, a in enumerate(actions))
    # replay + update
    for _ in range(12):
        sel.buffer.push(
            [
                [np.asarray(state[0]), np.asarray(state[1])],
                [int(actions[0]), int(actions[1])],
                [0.5, 0.1],
                [np.asarray(mask[0]), np.asarray(mask[1])],
                [np.asarray(mask[0]), np.asarray(mask[1])],
                [0.0, 1.0],
            ]
        )
    before = jax.tree_util.tree_leaves(sel.params)[0].copy()
    sel.update()
    after = jax.tree_util.tree_leaves(sel.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_transformer_stack():
    mha = MultiHeadAttention(n_head=2, d_model=8, d_k=4, d_v=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    v = mha.init(KEY, x, x, x)
    out, attn = mha.apply(v, x, x, x)
    assert out.shape == (2, 5, 8) and attn.shape == (4, 5, 5)

    dec = TransformerDecoderLayer(d_model=8, d_inner=16, n_head=2, d_k=4, d_v=4)
    enc_out = jnp.asarray(np.random.RandomState(1).randn(2, 7, 8).astype(np.float32))
    mask = jnp.ones((2, 7))
    vd = dec.init(KEY, x, enc_out, mask)
    o, _, _ = dec.apply(vd, x, enc_out, mask)
    assert o.shape == (2, 5, 8)

    pe = make_position_encoding(1, 10, 8)
    assert pe.shape == (1, 8, 10)
    np.testing.assert_allclose(pe[0, 0, 0], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 4, 0], 1.0, atol=1e-7)  # cos(0)


def test_scale_pd_attention_local_window():
    m = ScalePDAttention(d_k=4, d_v=4, d_model=8, dilation=2)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 8).astype(np.float32))
    nomask = jnp.zeros((1, 8, 8, 1))
    v = m.init(KEY, x, x, nomask)
    out = m.apply(v, x, x, nomask)
    assert out.shape == (1, 8, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_nonlocal_layer():
    m = NonLocalLayer(in_ch=8, out_ch=8, mode="Concatenation")
    fmap = jnp.ones((2, 4, 4, 8))
    x = jnp.ones((2, 8))
    v = m.init(KEY, fmap, x)
    assert m.apply(v, fmap, x).shape == (2, 4, 4, 8)


def test_match_loss_step():
    ml = MatchLoss.create(coding=8, out_shape=(16, 16, 1))
    z = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    masks = jnp.asarray((np.random.RandomState(1).rand(4, 16, 16) < 0.3).astype(np.float32))
    total, parts = ml.step(z, masks, jax.random.PRNGKey(3))
    assert np.isfinite(float(total))
    for k, v in parts.items():
        assert np.isfinite(float(v)), k
    ml.scheduler_step(float(total))


def test_kmeans_cluster_separates_blobs():
    rng = np.random.RandomState(0)
    h = w = 16
    emb = np.zeros((h, w, 2), np.float32)
    emb[:8] = [0.0, 0.0]
    emb[8:] = [10.0, 10.0]
    emb += rng.randn(h, w, 2) * 0.1
    fg = np.ones((h, w), np.float32)
    ids, inertia = kmeans_cluster(
        jnp.asarray(emb), jnp.asarray(fg), jnp.asarray(2),
        jax.random.PRNGKey(0), max_clusters=4, n_init=4,
    )
    ids = np.asarray(ids)
    # two clusters, each half uniform
    assert len(np.unique(ids[:8])) == 1
    assert len(np.unique(ids[8:])) == 1
    assert ids[0, 0] != ids[15, 15]
    assert float(inertia) < 20.0


def test_coordconvnet_retrofit_equivalence():
    """CoordConvNet weight surgery (coord_conv.py:174-260): zero coord
    weights make the retrofitted net exactly reproduce the original."""
    from tpuseg.nn.coord_conv import CoordConvNet, retrofit_coordconv_params

    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3), jnp.float32)
    plain = VGG16(n_layers=6, use_coordinates=False)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    y_plain = plain.apply({"params": params}, x)

    retro = CoordConvNet(n_layers=6, with_r=True)
    retro_params = retrofit_coordconv_params(params, with_r=True)
    # shape-compat check against a fresh init
    fresh = retro.init(jax.random.PRNGKey(1), x)["params"]
    for k in fresh:
        assert fresh[k]["kernel"].shape == retro_params[k]["kernel"].shape
    outs = retro.apply({"params": retro_params}, x)
    assert len(outs) == 6  # every layer's output, reference-style
    np.testing.assert_allclose(
        np.asarray(y_plain), np.asarray(outs[-1]), rtol=1e-5, atol=1e-5
    )
