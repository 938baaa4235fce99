"""End-to-end ReSeg model tests on tiny shapes (32x32, 4 instances)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.configs import cvppp_config
from tpuseg.models import ReSeg


@pytest.fixture(scope="module")
def tiny():
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=4
        ),
    )
    model = ReSeg(cfg=cfg)
    B, H, W, N = 2, 32, 32, 4
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 21).astype(np.float32)
    )
    labels = np.zeros((B, H, W), np.int32)
    labels[:, 8:24, 8:24] = 1
    sem = jax.nn.one_hot(jnp.asarray(labels), 2)
    ins = np.zeros((B, H, W, N), np.float32)
    ins[:, 8:16, 8:24, 0] = 1
    ins[:, 16:24, 8:24, 1] = 1
    ins = jnp.asarray(ins)
    n_obj = jnp.asarray([2, 2], jnp.int32)
    variables = jax.jit(
        model.init, static_argnames=("train", "mode")
    )(
        {"params": rng, "glimpse": rng, "dropout": rng},
        images, sem, ins, n_obj, train=True, mode="loss",
    )
    return cfg, model, variables, (images, sem, ins, n_obj)


def test_param_count_in_expected_range(tiny):
    _, _, variables, _ = tiny
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    # reference model is ~4.8M params; backbone dims are resolution-free
    assert 4_000_000 < n < 6_000_000


def test_train_loss_finite_and_state_updates(tiny):
    cfg, model, variables, batch = tiny
    images, sem, ins, n_obj = batch
    out, mut = jax.jit(
        lambda v, r: model.apply(
            v, *batch, train=True, mode="loss",
            rngs={"glimpse": r, "dropout": r},
            mutable=["batch_stats", "decoder_state"],
        )
    )(variables, jax.random.PRNGKey(1))
    sem_logits, sem_mask, losses = out
    assert sem_logits.shape == (2, 32, 32, 2)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k  # count_logits is (B, C)
    # REINFORCE baseline EMA moved off zero
    assert float(mut["decoder_state"]["decoder"]["baseline"]) != 0.0


def test_gradients_flow_to_all_components(tiny):
    cfg, model, variables, batch = tiny

    def loss_fn(params):
        (l, _, losses), _ = model.apply(
            {**variables, "params": params}, *batch, train=True, mode="loss",
            rngs={"glimpse": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats", "decoder_state"],
        )
        return losses["loss"] + jnp.mean(l)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    finite = all(bool(jnp.all(jnp.isfinite(g))) for _, g in flat)
    assert finite
    # every top-level component receives gradient somewhere
    for comp in ["base", "decoder", "ins_stem", "sem_seg_output", "channel_attend"]:
        sub = grads[comp]
        total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(sub))
        assert total > 0, f"no gradient reached {comp}"


def test_eval_loss_path(tiny):
    cfg, model, variables, batch = tiny
    out = jax.jit(
        lambda v, r: model.apply(
            v, *batch, train=False, mode="loss", rngs={"glimpse": r}
        )
    )(variables, jax.random.PRNGKey(4))
    _, _, losses = out
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k  # count_logits is (B, C)


def test_infer_path_shapes_and_determinism(tiny):
    cfg, model, variables, batch = tiny
    images = batch[0]
    f = jax.jit(lambda v, x: model.apply(v, x, mode="infer"))
    probs1, idmap1, counts1 = f(variables, images)
    probs2, idmap2, counts2 = f(variables, images)
    assert probs1.shape == (2, 32, 32, 2)
    assert idmap1.shape == (2, 32, 32)
    assert counts1.shape == (2,)
    np.testing.assert_array_equal(np.asarray(idmap1), np.asarray(idmap2))
    np.testing.assert_array_equal(np.asarray(counts1), np.asarray(counts2))
    # id map ids never exceed counts, background stays 0 outside fg
    assert int(idmap1.max()) <= int(counts1.max())


def test_semantic_only_path(tiny):
    cfg, model, variables, batch = tiny
    probs = jax.jit(lambda v, x: model.apply(v, x, mode="semantic"))(
        variables, batch[0]
    )
    assert probs.shape == (2, 32, 32, 2)
    np.testing.assert_allclose(
        np.asarray(probs.sum(-1)), np.ones((2, 32, 32)), rtol=1e-5
    )
