"""Density-regression counting head (models/reseg.py::_DensityHead).

The density map integrates to the instance count (unit mass per GT
instance); at inference it supersedes the classifier head as the
extraction-budget source.  No reference analogue — the reference
hardcodes ``n_objects_prediction = 16`` (code/lib/model.py:496).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.models.reseg import (
    DENSITY_SCALE, density_count, density_target, pool_density,
)


def _cfg(res=64, max_n=8, density=True, count=True):
    cfg = cvppp_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=res, image_width=res, max_n_objects=max_n
        ),
        model=dataclasses.replace(
            cfg.model, n_filters=8, use_density_head=density,
            use_count_head=count,
        ),
    )


def test_density_target_unit_mass():
    """Each valid instance contributes exactly DENSITY_SCALE mass; padded
    slots and empty masks contribute nothing."""
    rng = np.random.default_rng(0)
    masks = np.zeros((2, 16, 16, 4), np.float32)
    masks[0, 2:6, 2:6, 0] = 1.0   # area 16
    masks[0, 8:16, 8:16, 1] = 1.0  # area 64
    masks[0, :3, 10:13, 2] = 1.0   # padded away by n_objects=2
    masks[1, :, :, 0] = 1.0        # full-image instance
    n = jnp.asarray([2, 1])
    gt = density_target(jnp.asarray(masks), n)
    sums = np.asarray(jnp.sum(gt, axis=(1, 2, 3))) / DENSITY_SCALE
    np.testing.assert_allclose(sums, [2.0, 1.0], rtol=1e-5)
    # mass concentrates at 1/area per pixel
    assert np.isclose(float(gt[0, 3, 3, 0]), DENSITY_SCALE / 16, rtol=1e-5)
    assert np.isclose(float(gt[0, 9, 9, 0]), DENSITY_SCALE / 64, rtol=1e-5)
    est = np.asarray(density_count(gt))
    np.testing.assert_array_equal(est, [2, 1])


def test_density_mode_and_loss_wiring():
    """mode='density' returns a (B,H,W,1) non-negative f32 map; loss mode
    carries density_loss / density_count; the budget in infer_prep comes
    from the density integral (overriding the classifier head)."""
    cfg = _cfg()
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)
    assert "density_head" in variables["params"]

    B, H, W = 2, 64, 64
    imgs = jnp.zeros((B, H, W, cfg.data.n_channels), jnp.float32)
    dens = model.apply(variables, imgs, mode="density")
    assert dens.shape == (B, H // 4, W // 4, 1)
    assert dens.dtype == jnp.float32
    assert float(jnp.min(dens)) >= 0.0

    sem = jax.nn.one_hot(jnp.zeros((B, H, W), jnp.int32), cfg.data.n_classes)
    ins = jnp.zeros((B, H, W, cfg.data.max_n_objects), jnp.float32)
    nobj = jnp.asarray([3, 5])
    (sem_logits, _, losses), _ = model.apply(
        variables, imgs, sem, ins, nobj, train=True, mode="loss",
        rngs={"glimpse": jax.random.PRNGKey(0),
              "dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats", "decoder_state"],
    )
    assert np.isfinite(float(losses["density_loss"]))
    assert np.isfinite(float(losses["density_count_loss"]))
    assert losses["density_count"].shape == (B,)

    # infer_prep budget: equals the clipped density integral
    out = model.apply(variables, imgs, mode="infer_prep")
    budget = np.asarray(out[2])
    expect = np.asarray(
        jnp.clip(density_count(dens), 1, cfg.data.max_n_objects)
    )
    np.testing.assert_array_equal(budget, expect)


def test_density_head_gradient_isolation():
    """stop_gradient: the density loss must produce ZERO gradient in the
    backbone — head training cannot perturb segmentation quality."""
    cfg = _cfg()
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=1)
    imgs = jnp.ones((1, 64, 64, cfg.data.n_channels), jnp.float32) * 0.1
    masks = jnp.zeros((1, 64, 64, cfg.data.max_n_objects), jnp.float32)
    masks = masks.at[0, 10:20, 10:20, 0].set(1.0)
    nobj = jnp.asarray([1])

    def loss(params):
        dens = model.apply(
            {**variables, "params": params}, imgs, train=False,
            mode="density",
        )
        gt = pool_density(density_target(masks, nobj), 16, 16)
        return jnp.mean(jnp.square(dens - gt))

    grads = jax.grad(loss)(variables["params"])
    head_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["density_head"])
    )
    base_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["base"])
    )
    assert head_norm > 0.0
    assert base_norm == 0.0


def test_adapt_cfg_disables_missing_density_head(tmp_path):
    """Checkpoints without a density head must not have their budgets set
    by a fresh-init head (cli/common.adapt_cfg_to_checkpoint)."""
    import flax.serialization

    from tpuseg.cli.common import adapt_cfg_to_checkpoint

    cfg = _cfg(density=False, count=False)
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=2)
    path = str(tmp_path / "old.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(dict(variables))))

    cfg2 = _cfg(density=True, count=True)
    adapted = adapt_cfg_to_checkpoint(cfg2, path)
    assert not adapted.model.use_density_head
    assert not adapted.model.use_count_head


def test_stop_scalars_backcompat():
    """2-tuple stop_params (pre-r3 stop_params.json) keep the config's
    suppression factor; 3-tuples carry their own; shorter tuples keep
    the config's stop fraction, and a non-positive stop fraction
    resolves to min_frac (the pre-split coupled rule)."""
    import dataclasses as dc

    from tpuseg.configs import cvppp_config
    from tpuseg.decoder.instance import InstanceDecoder

    dec_cfg = dc.replace(cvppp_config().decoder, peak_suppress_factor=0.7)
    mf, mm, sup, st = InstanceDecoder._stop_scalars(dec_cfg, None)
    assert np.isclose(float(sup), 0.7)
    # config default stop_remaining_frac=-1 -> follows min_frac
    assert np.isclose(float(st), float(mf))
    mf, mm, sup, st = InstanceDecoder._stop_scalars(dec_cfg, (0.01, 2))
    assert np.isclose(float(mf), 0.01) and int(mm) == 2
    assert np.isclose(float(sup), 0.7)
    assert np.isclose(float(st), 0.01)
    mf, mm, sup, st = InstanceDecoder._stop_scalars(dec_cfg, (0.01, 2, 1.5))
    assert np.isclose(float(mf), 0.01) and int(mm) == 2
    assert float(sup) == 1.5
    assert np.isclose(float(st), 0.01)
    mf, mm, sup, st = InstanceDecoder._stop_scalars(
        dec_cfg, (0.01, 2, 1.5, 0.004)
    )
    assert np.isclose(float(st), 0.004)
    mf, mm, sup, st = InstanceDecoder._stop_scalars(
        dec_cfg, (0.01, 2, 1.5, -1.0)
    )
    assert np.isclose(float(st), 0.01)


def test_load_stop_params_three_tuple(tmp_path):
    import json

    from tpuseg.cli.common import load_stop_params

    p2 = tmp_path / "sp2.json"
    json.dump({"min_remaining_frac": 0.01, "max_extract_misses": 2},
              open(p2, "w"))
    assert load_stop_params(str(p2)) == (0.01, 2)
    p3 = tmp_path / "sp3.json"
    json.dump({"min_remaining_frac": 0.01, "max_extract_misses": 2,
               "peak_suppress_factor": 1.3}, open(p3, "w"))
    assert load_stop_params(str(p3)) == (0.01, 2, 1.3)
    p4 = tmp_path / "sp4.json"
    json.dump({"min_remaining_frac": 0.01, "max_extract_misses": 2,
               "peak_suppress_factor": 1.3,
               "stop_remaining_frac": 0.004}, open(p4, "w"))
    assert load_stop_params(str(p4)) == (0.01, 2, 1.3, 0.004)
