"""Runtime tests: train step, plateau schedule, checkpointing, and
data-parallel execution on the faked 8-device CPU mesh."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.configs import cvppp_config
from tpuseg.models import ReSeg
from tpuseg.parallel import make_mesh, replicate, shard_batch
from tpuseg.runtime import (
    PlateauState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from tpuseg.runtime.checkpoint import restore_checkpoint, save_checkpoint


def _tiny_cfg(batch_size=2):
    cfg = cvppp_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=4
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch_size),
    )


def _batch(b, h=32, w=32, n=4, seed=0):
    rng = np.random.RandomState(seed)
    labels = np.zeros((b, h, w), np.int32)
    labels[:, 8:24, 8:24] = 1
    ins = np.zeros((b, h, w, n), np.float32)
    ins[:, 8:16, 8:24, 0] = 1
    ins[:, 16:24, 8:24, 1] = 1
    return {
        "images": rng.randn(b, h, w, 21).astype(np.float32),
        "sem_onehot": np.eye(2, dtype=np.float32)[labels],
        "ins_masks": ins,
        "n_objects": np.full((b,), 2, np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = ReSeg(cfg=cfg)
    batch = {k: jnp.asarray(v) for k, v in _batch(2).items()}
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "glimpse": rng, "dropout": rng},
        batch["images"], batch["sem_onehot"], batch["ins_masks"],
        batch["n_objects"], train=True, mode="loss",
    )
    state = create_train_state(cfg, variables)
    return cfg, model, state, batch


def test_train_step_updates_params_and_runs_twice(setup):
    cfg, model, state, batch = setup
    step = make_train_step(cfg, model)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), k
    # params changed
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state.params, s2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # raw gradient norm is finite and nonzero (clipping happens inside the
    # optax chain, not in this metric)
    assert 0 < float(m2["grad_norm"]) < 1e9


def test_eval_step_runs(setup):
    cfg, model, state, batch = setup
    estep = make_eval_step(cfg, model)
    m = estep(state, batch, jax.random.PRNGKey(3))
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_plateau_schedule():
    p = PlateauState.create(1.0, 0.5, patience=2)
    # improving metric: lr constant
    for v in [1.0, 0.9, 0.8]:
        p = p.step(v)
    assert float(p.lr) == 1.0
    # stall for patience+1 epochs -> drop
    for v in [0.9, 0.9, 0.9]:
        p = p.step(v)
    assert float(p.lr) == 0.5
    assert int(p.num_bad) == 0


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, state, batch = setup
    step = make_train_step(cfg, model)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, s1, metadata={"epoch": 0})
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == int(s1.step)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    np.testing.assert_allclose(
        float(restored.plateau.lr), float(s1.plateau.lr)
    )


def test_data_parallel_train_step_8_devices(setup):
    """Data-parallel: batch sharded over the 8-device CPU mesh, state
    replicated; XLA inserts the gradient all-reduce automatically."""
    cfg, model, state, _ = setup
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    mesh = make_mesh(8)
    big = {k: jnp.asarray(v) for k, v in _batch(8).items()}
    sharded = shard_batch(big, mesh)
    rstate = replicate(state, mesh)
    step = make_train_step(cfg, model)
    with mesh:
        s1, m = step(rstate, sharded, jax.random.PRNGKey(5))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # updated params are fully replicated (all-reduced)
    leaf = jax.tree_util.tree_leaves(s1.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_fit_loop_writes_logs_and_checkpoints(tmp_path):
    """Two-epoch fit on tiny synthetic batches: CSV/jsonl logs, best-val
    checkpoint, plateau state advance."""
    import os

    from tpuseg.runtime.loop import fit

    cfg = _tiny_cfg()
    model = ReSeg(cfg=cfg)
    batch = {k: jnp.asarray(v) for k, v in _batch(2).items()}
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "glimpse": rng, "dropout": rng},
        batch["images"], batch["sem_onehot"], batch["ins_masks"],
        batch["n_objects"], train=True, mode="loss",
    )
    state = create_train_state(cfg, variables)
    run_dir = os.path.join(tmp_path, "run")

    def loader(epoch):
        return [batch]

    state = fit(cfg, model, state, loader, loader, run_dir, n_epochs=2,
                rng=jax.random.PRNGKey(1),
                debug_dir=os.path.join(run_dir, "debug"), debug_every=40)
    assert int(state.step) == 2
    files = os.listdir(run_dir)
    assert "training.log" in files and "validation.log" in files
    assert "metrics.jsonl" in files
    with open(os.path.join(run_dir, "training.log")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "Epoch,Cost" and len(lines) == 3
    ckpts = [f for f in files if f.startswith("model_")]
    assert ckpts, files
    # debug-image dumps (reference attenet2.py:247-251 artifact kinds):
    # iteration 1 of each epoch dumps under a deterministic directory
    for ep in (0, 1):
        ddir = os.path.join(run_dir, "debug", f"ep{ep:03d}_it00001")
        dumped = set(os.listdir(ddir))
        assert {"p_0.jpg", "pred_0.jpg", "target_0.jpg",
                "p_4.jpg", "pred_4.jpg", "target_4.jpg",
                "pro.jpg", "proall.jpg", "mas.jpg"} <= dumped, dumped


def test_live_metrics_and_tensorboard(tmp_path, capsys):
    """LiveView sparklines + TensorBoard scalars (the reference's visdom
    plots, model.py:409-419, without the server dependency)."""
    from tpuseg.runtime.metrics_log import MetricLogger, sparkline

    assert sparkline([]) == ""
    assert sparkline([1.0]) == "▁"
    s = sparkline([0.0, 0.5, 1.0])
    assert s[0] == "▁" and s[-1] == "█" and len(s) == 3
    # constant history must not divide by zero
    assert sparkline([2.0, 2.0, 2.0]) == "▁▁▁"

    run_dir = str(tmp_path / "run")
    logger = MetricLogger(run_dir, live=True, tensorboard=True)
    for epoch in range(3):
        logger.log("train", epoch, {"cost": 1.0 - 0.1 * epoch})
        logger.log("val", epoch, {"cost": 1.2 - 0.1 * epoch})
    logger.close()

    out = capsys.readouterr().out
    assert "live metrics:" in out
    assert "train/cost" in out and "val/cost" in out

    tb_dir = os.path.join(run_dir, "tb")
    assert os.path.isdir(tb_dir)
    assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_averager():
    from tpuseg.runtime.metrics_log import Averager

    a = Averager()
    a.add(np.array([1.0, 2.0, 3.0]))
    a.add(4.0)
    np.testing.assert_allclose(a.val(), 10.0 / 4.0)
    a.reset()
    assert a.val() == 0.0


def test_merge_restore_and_cfg_adaptation(tmp_path):
    """Non-strict checkpoint merge (reference model.py:62-79) + automatic
    count-head disable for checkpoints that never trained one."""
    import dataclasses

    import flax.serialization

    from tpuseg.cli.common import (
        _merge_restore, adapt_cfg_to_checkpoint, build_model, init_variables,
        load_variables,
    )
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=4
        ),
        model=dataclasses.replace(cfg.model, n_filters=8),
    )
    # a checkpoint saved WITHOUT the count head
    old_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_count_head=False)
    )
    old_model = build_model(old_cfg)
    old_vars = init_variables(old_cfg, old_model, seed=1)
    path = str(tmp_path / "old.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(dict(old_vars)))

    # adaptation must disable the head for this checkpoint
    adapted = adapt_cfg_to_checkpoint(cfg, path)
    assert not adapted.model.use_count_head
    assert cfg.model.use_count_head  # original untouched

    # merge-load into the count-head model keeps the head at init and
    # overlays everything else
    model = build_model(cfg)
    restored = load_variables(cfg, model, path, seed=0)
    assert "count_head" in restored["params"]
    got = jax.tree_util.tree_leaves(restored["params"]["base"])[0]
    want = jax.tree_util.tree_leaves(old_vars["params"]["base"])[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # shape-mismatched leaf keeps init instead of crashing
    stored = flax.serialization.msgpack_restore(open(path, "rb").read())
    bad = jax.tree_util.tree_map(lambda x: x, dict(restored))
    merged = _merge_restore(bad, stored)
    assert "count_head" in merged["params"]


def test_hoist_skips_train_parity():
    """cfg.decoder.hoist_skips_train: the two-apply hoisted train step
    (loss_prep + loss_tail, runtime/train.py) must match the single-apply
    reference-shaped step exactly when drop_rate == 0 — same loss terms,
    same updated params, same batch_stats (the transform BN running stats
    via the momentum^K fix-up, _fixup_k_updates)."""
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, drop_rate=0.0),
    )
    model = ReSeg(cfg=cfg)
    batch = {k: jnp.asarray(v) for k, v in _batch(2, seed=7).items()}
    rng = jax.random.PRNGKey(11)
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "glimpse": rng, "dropout": rng},
        batch["images"], batch["sem_onehot"], batch["ins_masks"],
        batch["n_objects"], train=True, mode="loss",
    )
    state0 = create_train_state(cfg, variables)

    cfg_h = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, hoist_skips_train=True)
    )
    cfg_n = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, hoist_skips_train=False)
    )
    step_rng = jax.random.PRNGKey(5)
    s_h, m_h = make_train_step(cfg_h, model)(state0, batch, step_rng)
    s_n, m_n = make_train_step(cfg_n, model)(state0, batch, step_rng)

    for k in m_n:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_n[k]), rtol=2e-4, atol=1e-5, err_msg=k
        )

    def _cmp(tree_a, tree_b, what, rtol=2e-4, atol=2e-5):
        fa = jax.tree_util.tree_leaves_with_path(tree_a)
        fb = jax.tree_util.tree_leaves(tree_b)
        assert len(fa) == len(fb)
        for (path, a), b in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
                err_msg=f"{what}{jax.tree_util.keystr(path)}",
            )

    _cmp(s_h.params, s_n.params, "params")
    _cmp(s_h.batch_stats, s_n.batch_stats, "batch_stats")
    _cmp(s_h.decoder_state, s_n.decoder_state, "decoder_state")


def test_hoist_skips_train_with_dropout_runs():
    """With dropout active the hoist shares one transform mask across the
    K glimpses (documented deviation) — the step must still run finite
    and update params."""
    cfg = _tiny_cfg()  # drop_rate 0.5 default
    model = ReSeg(cfg=cfg)
    batch = {k: jnp.asarray(v) for k, v in _batch(2, seed=3).items()}
    rng = jax.random.PRNGKey(2)
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "glimpse": rng, "dropout": rng},
        batch["images"], batch["sem_onehot"], batch["ins_masks"],
        batch["n_objects"], train=True, mode="loss",
    )
    state0 = create_train_state(cfg, variables)
    assert cfg.decoder.hoist_skips_train  # default on
    s1, m1 = make_train_step(cfg, model)(state0, batch, jax.random.PRNGKey(4))
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state0.params, s1.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
