"""VGG16 feature extractor (truncatable) + skip variant.

Reference: ``code/lib/archs/modules/vgg16.py`` — torchvision VGG16
features, optionally truncated at layer ``n_layers`` and optionally
CoordConv-augmented (:6-79); ``SkipVGG16`` returns the outputs of layers
3, 8 and the last (:82-140).  Pretrained ImageNet weights are a
torchvision download the reference relies on; this environment has no
egress, so initialisation is He-uniform with :func:`load_npz` for locally
provided weight exports (forward-parity-tested against torch in
``tests/test_vgg16.py``).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpuseg.nn.coord_conv import add_coordinates

# torchvision cfg 'D': numbers are conv output channels, 'M' is maxpool.
_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M"]


def _layer_types() -> List[str]:
    """The per-index layer list of torchvision vgg16.features (conv+relu
    pairs and pools), used to interpret truncation indices."""
    types = []
    for v in _CFG_D:
        if v == "M":
            types.append("pool")
        else:
            types.append(f"conv{v}")
            types.append("relu")
    return types


class VGG16(nn.Module):
    n_layers: Optional[int] = None  # truncate after this many torch layers
    use_coordinates: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, return_intermediate: Optional[List[int]] = None):
        types = _layer_types()
        n = self.n_layers if self.n_layers is not None else len(types)
        outs = []
        conv_i = 0
        for i, t in enumerate(types[:n]):
            if t == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif t == "relu":
                x = nn.relu(x)
            else:
                feats = int(t[4:])
                if self.use_coordinates:
                    x = add_coordinates(x, with_r=True)
                x = nn.Conv(
                    feats, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                conv_i += 1
            if return_intermediate and i in return_intermediate:
                outs.append(x)
        if return_intermediate:
            outs.append(x)
            return outs
        return x


def params_from_torch_features(
    arrays: Mapping[str, np.ndarray], skip_prefix: bool = False
) -> Dict:
    """Convert a torchvision ``vgg16().features`` state-dict (as numpy
    arrays) into the flax param tree of :class:`VGG16`.

    Keys may be ``features.{i}.weight``/``.bias`` (full-model export) or
    ``{i}.weight``/``.bias`` (features-only export), where ``i`` is the
    torch Sequential index; conv weights are OIHW and become HWIO.  With
    ``skip_prefix`` the result is nested under ``features`` as
    :class:`SkipVGG16` expects.

    The reference applies torchvision weights in-place after construction
    (``code/lib/archs/modules/vgg16.py:25-30``); here the conversion is a
    pure function producing a pytree for ``model.apply``.
    """
    types = _layer_types()
    params: Dict = {}
    conv_i = 0
    for i, t in enumerate(types):
        if not t.startswith("conv"):
            continue
        for full_key in (f"features.{i}.weight", f"{i}.weight"):
            if full_key in arrays:
                break
        else:
            raise KeyError(f"missing weights for torch layer {i} ({t})")
        w = np.asarray(arrays[full_key])
        b = np.asarray(arrays[full_key[:-6] + "bias"])
        params[f"conv{conv_i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": jnp.asarray(b),
        }
        conv_i += 1
    if skip_prefix:
        return {"features": params}
    return params


def load_npz(path: str, skip_prefix: bool = False) -> Dict:
    """Load a ``.npz`` export of torchvision VGG16 weights into a flax
    ``{"params": ...}`` variables dict.

    Export recipe (on a machine with egress)::

        sd = torchvision.models.vgg16(weights="IMAGENET1K_V1").state_dict()
        np.savez(path, **{k: v.numpy() for k, v in sd.items()
                          if k.startswith("features.")})
    """
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    return {"params": params_from_torch_features(arrays, skip_prefix)}


class SkipVGG16(nn.Module):
    """Outputs of torch layers 3 and 8 plus the final truncated output
    (reference vgg16.py:82-140, n_layers=16)."""

    use_coordinates: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return VGG16(
            n_layers=16, use_coordinates=self.use_coordinates,
            dtype=self.dtype, name="features",
        )(x, return_intermediate=[3, 8])
