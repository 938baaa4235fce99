"""VGG16 torch-weight loading + forward parity.

The reference relies on torchvision ImageNet weights applied in-place
(``code/lib/archs/modules/vgg16.py:25-30``).  Here a torch VGG16
``features`` stack (rebuilt layer-for-layer from cfg 'D' — torchvision is
not installed, but the Sequential layout and state-dict keys are
identical) is randomly initialised, exported to ``.npz`` exactly as the
documented recipe produces, loaded via :func:`tpuseg.nn.vgg16.load_npz`,
and the flax forward is checked against the torch forward — full stack,
truncated stack, and the SkipVGG16 intermediate taps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tpuseg.nn.vgg16 import (  # noqa: E402
    _CFG_D,
    VGG16,
    SkipVGG16,
    load_npz,
)


def _torch_features():
    """torchvision.models.vgg16().features rebuilt from cfg 'D'."""
    layers = []
    in_ch = 3
    for v in _CFG_D:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    torch.manual_seed(0)
    feats = _torch_features()
    path = tmp_path_factory.mktemp("vgg") / "vgg16_features.npz"
    # full-model key layout ("features.{i}.weight"), as the documented
    # export recipe produces from a torchvision state_dict
    np.savez(
        path,
        **{
            f"features.{k}": v.detach().numpy()
            for k, v in feats.state_dict().items()
        },
    )
    return str(path), feats


def _forward_torch(feats, x_nhwc, upto=None):
    with torch.no_grad():
        t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
        mods = list(feats)[: upto if upto is not None else len(list(feats))]
        for m in mods:
            t = m(t)
        return t.numpy().transpose(0, 2, 3, 1)


def test_load_npz_full_forward_parity(npz_path):
    path, feats = npz_path
    variables = load_npz(path)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    out = VGG16().apply(variables, jnp.asarray(x))
    ref = _forward_torch(feats, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_load_npz_truncated_forward_parity(npz_path):
    path, feats = npz_path
    variables = load_npz(path)
    rng = np.random.RandomState(2)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    out = VGG16(n_layers=16).apply(variables, jnp.asarray(x))
    ref = _forward_torch(feats, x, upto=16)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_load_npz_skip_taps_parity(npz_path):
    path, feats = npz_path
    variables = load_npz(path, skip_prefix=True)
    rng = np.random.RandomState(3)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    outs = SkipVGG16().apply(variables, jnp.asarray(x))
    assert len(outs) == 3
    # torch layer indices 3, 8 are the relu outputs SkipVGG16 taps
    for out, upto in zip(outs, [4, 9, 16]):
        ref = _forward_torch(feats, x, upto=upto)
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-4, atol=1e-5
        )


def test_load_npz_features_only_keys(npz_path, tmp_path):
    """A features-only export ("{i}.weight" keys) loads identically."""
    path, feats = npz_path
    alt = tmp_path / "feats_only.npz"
    np.savez(
        alt,
        **{k: v.detach().numpy() for k, v in feats.state_dict().items()},
    )
    a = load_npz(path)
    b = load_npz(str(alt))
    for name in a["params"]:
        np.testing.assert_array_equal(
            np.asarray(a["params"][name]["kernel"]),
            np.asarray(b["params"][name]["kernel"]),
        )
