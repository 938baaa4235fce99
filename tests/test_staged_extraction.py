"""Staged extraction dispatch == the monolithic infer program.

The staged path (runtime/predict.py::_infer_staged) splits inference into
a prep program (backbone + attend + skip transforms + count budget) and a
rounds program compiled for the round count the batch actually needs,
with a device-resident continuation carry.  Identical round math, so the
idmap/count outputs must match the single mode="infer" program EXACTLY —
these tests pin that, including the carry_in continuation path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.data.synthetic import make_scene
from tpuseg.runtime.predict import Predictor


def _small_cfg(max_n=8):
    cfg = cvppp_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=64, image_width=64, max_n_objects=max_n
        ),
        model=dataclasses.replace(cfg.model, n_filters=8),
    )


def _setup(max_n=8, seed=0):
    cfg = _small_cfg(max_n)
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=seed)
    rng = np.random.default_rng(seed)
    imgs = np.stack(
        [make_scene(rng, 64, 64)[0] for _ in range(4)]
    ).astype(np.uint8)
    return cfg, model, variables, imgs


def test_staged_matches_monolithic():
    cfg, model, variables, imgs = _setup()
    plain = Predictor(cfg, model, variables, batch_size=4, staged=False)
    staged = Predictor(cfg, model, variables, batch_size=4, staged=True)

    _, fg0, id0, n0 = plain.predict_batch_arrays(imgs, with_probs=False)
    _, fg1, id1, n1 = staged.predict_batch_arrays(imgs, with_probs=False)

    np.testing.assert_array_equal(np.asarray(fg0), np.asarray(fg1))
    np.testing.assert_array_equal(np.asarray(id0), np.asarray(id1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    # the staged run sized its first dispatch from the budget readback:
    # at least one rounds program was compiled, none longer than the
    # static ceiling
    G = cfg.decoder.extract_group
    max_rounds = -(-cfg.data.max_n_objects // G)
    assert staged._rounds_cache
    assert all(1 <= n <= max_rounds for n in staged._rounds_cache)


def test_extract_rounds_continuation_equals_one_shot():
    """Running n=1 then continuing (carry_in) for the rest must equal one
    n=max_rounds dispatch — the carry is the full extraction state."""
    cfg, model, variables, imgs = _setup(seed=1)
    p = Predictor(cfg, model, variables, batch_size=4, staged=True)
    x = jnp.asarray(imgs)
    fg, sem_mask, budget, score, skips_t = p._infer_prep(p.variables, x)
    dec_vars = p._decoder_variables()
    G = cfg.decoder.extract_group
    max_rounds = -(-cfg.data.max_n_objects // G)

    id_full, n_full, _ = p._rounds_fn(max_rounds)(
        dec_vars, sem_mask, score, skips_t, budget, None
    )

    id1, n1, carry = p._rounds_fn(1)(
        dec_vars, sem_mask, score, skips_t, budget, None
    )
    id2, n2, _ = p._rounds_fn(max_rounds - 1)(
        dec_vars, sem_mask, score, skips_t, budget, carry
    )

    np.testing.assert_array_equal(np.asarray(id_full), np.asarray(id2))
    np.testing.assert_array_equal(np.asarray(n_full), np.asarray(n2))


def test_staged_no_count_head():
    """Without the count head the budget is the static cap — staged still
    matches (single dispatch at the full round count)."""
    cfg = _small_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_count_head=False)
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=2)
    rng = np.random.default_rng(2)
    imgs = np.stack(
        [make_scene(rng, 64, 64)[0] for _ in range(2)]
    ).astype(np.uint8)

    plain = Predictor(cfg, model, variables, batch_size=2, staged=False)
    staged = Predictor(cfg, model, variables, batch_size=2, staged=True)
    _, _, id0, n0 = plain.predict_batch_arrays(imgs, with_probs=False)
    _, _, id1, n1 = staged.predict_batch_arrays(imgs, with_probs=False)
    np.testing.assert_array_equal(np.asarray(id0), np.asarray(id1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))


def test_pipelined_window_matches_monolithic():
    """predict_batches_staged (window dispatch, concatenated readbacks)
    must equal the monolithic program batch for batch."""
    cfg, model, variables, imgs = _setup(seed=3)
    rng = np.random.default_rng(7)
    more = np.stack(
        [make_scene(rng, 64, 64)[0] for _ in range(8)]
    ).astype(np.uint8)
    batches_np = [imgs, more[:4], more[4:]]

    plain = Predictor(cfg, model, variables, batch_size=4, staged=False)
    staged = Predictor(cfg, model, variables, batch_size=4, staged=True)

    outs = staged.predict_batches_staged([jnp.asarray(b) for b in batches_np])
    assert len(outs) == 3
    for b, (fg1, id1, n1) in zip(batches_np, outs):
        _, fg0, id0, n0 = plain.predict_batch_arrays(b, with_probs=False)
        np.testing.assert_array_equal(np.asarray(fg0), np.asarray(fg1))
        np.testing.assert_array_equal(np.asarray(id0), np.asarray(id1))
        np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))


def test_predict_paths_windowed(tmp_path):
    """The windowed staged predict_paths yields the same per-image results
    as the monolithic path, across a window boundary."""
    from PIL import Image as PILImage

    cfg, model, variables, imgs = _setup(seed=4)
    rng = np.random.default_rng(11)
    paths = []
    for i in range(10):  # batch_size=4 -> 3 chunks, window=2 -> 2 groups
        arr = make_scene(rng, 64, 64)[0].astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        PILImage.fromarray(arr).save(p)
        paths.append(str(p))

    plain = Predictor(cfg, model, variables, batch_size=4, staged=False)
    staged = Predictor(cfg, model, variables, batch_size=4, staged=True)
    r0 = list(plain.predict_paths(paths))
    r1 = list(staged.predict_paths(paths, window=2))
    assert [r["path"] for r in r0] == [r["path"] for r in r1]
    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(a["fg_mask"], b["fg_mask"])
        np.testing.assert_array_equal(a["ins_mask"], b["ins_mask"])
        assert a["n_objects"] == b["n_objects"]


def test_packed_transfer_roundtrip():
    """pack_masks/unpack_masks: the one-plane uint8 transfer must carry
    exactly the (fg, idmap) pair of the unpacked path."""
    from tpuseg.runtime.predict import unpack_masks

    cfg, model, variables, imgs = _setup(seed=5)
    p = Predictor(cfg, model, variables, batch_size=4, staged=False)
    _, fg0, id0, n0 = p.predict_batch_arrays(imgs, with_probs=False)
    packed, n1 = p.predict_batch_packed(imgs)
    fg1, id1 = unpack_masks(np.asarray(packed))
    np.testing.assert_array_equal(np.asarray(fg0), fg1)
    np.testing.assert_array_equal(np.asarray(id0), id1)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))

    staged = Predictor(cfg, model, variables, batch_size=4, staged=True)
    (packed2, n2), = staged.predict_batches_staged(
        [jnp.asarray(imgs)], packed=True
    )
    fg2, id2 = unpack_masks(np.asarray(packed2))
    np.testing.assert_array_equal(np.asarray(fg0), fg2)
    np.testing.assert_array_equal(np.asarray(id0), id2)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n2))
