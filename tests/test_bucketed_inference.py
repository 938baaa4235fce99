"""Mixed-resolution bucketed inference (BASELINE.md stretch config;
reference native-res handling at prediction.py:32-50 resizes everything to
256 and nearest-upsamples back — the bucketed path runs each image near
native resolution instead)."""

import dataclasses

import numpy as np
from PIL import Image

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.runtime.predict import Predictor


def _small_predictor(batch_size=2):
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=2
        ),
        model=dataclasses.replace(cfg.model, n_filters=8),
        # 1 glimpse/round: the pyramid-decode compile dominates this
        # CPU test; batch-folding is covered by the main extraction tests
        decoder=dataclasses.replace(cfg.decoder, extract_group=1),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)
    return Predictor(cfg, model, variables, batch_size=batch_size)


def test_bucket_shape():
    assert Predictor._bucket_shape(250, 500, 64) == (256, 512)
    assert Predictor._bucket_shape(64, 64, 64) == (64, 64)
    assert Predictor._bucket_shape(1, 1, 64) == (64, 64)
    assert Predictor._bucket_shape(5000, 100, 64, cap=1024) == (1024, 128)


def test_bucketed_matches_single_runs(tmp_path):
    rng = np.random.RandomState(3)
    sizes = [(32, 32), (48, 32), (32, 32)]
    paths = []
    for i, (h, w) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    pred = _small_predictor(batch_size=2)
    joint = list(pred.predict_paths_bucketed(paths, multiple=32))
    assert [r["path"] for r in joint] == paths  # original order restored
    for r, (h, w) in zip(joint, sizes):
        assert r["fg_mask"].shape == (h, w)   # pixel-aligned native res
        assert r["ins_mask"].shape == (h, w)

    # each image through its own run gives identical masks
    for i in [0, 1]:
        solo = next(iter(pred.predict_paths_bucketed([paths[i]],
                                                     multiple=32)))
        np.testing.assert_array_equal(solo["fg_mask"], joint[i]["fg_mask"])
        np.testing.assert_array_equal(solo["ins_mask"], joint[i]["ins_mask"])
        assert solo["n_objects"] == joint[i]["n_objects"]
