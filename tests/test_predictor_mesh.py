"""Predictor over the faked 8-device mesh: batch sharded across devices,
same results as single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.runtime.predict import Predictor


@pytest.fixture(scope="module")
def tiny_pred():
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=4
        ),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)
    return cfg, model, variables


def test_predict_batch_mesh_matches_single_device(tiny_pred):
    cfg, model, variables = tiny_pred
    assert jax.device_count() >= 8
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (8, 32, 32, 3)).astype(np.uint8)

    single = Predictor(cfg, model, variables, batch_size=8, use_mesh=False)
    meshed = Predictor(cfg, model, variables, batch_size=8, use_mesh=True)
    s_probs, s_fg, s_id, s_cnt = single.predict_batch_arrays(images)
    m_probs, m_fg, m_id, m_cnt = meshed.predict_batch_arrays(images)
    np.testing.assert_allclose(
        np.asarray(s_probs), np.asarray(m_probs), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(s_id), np.asarray(m_id))
    np.testing.assert_array_equal(np.asarray(s_cnt), np.asarray(m_cnt))
