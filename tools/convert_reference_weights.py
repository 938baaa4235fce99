"""Convert a reference (PyTorch ReSeg) state_dict into tpuseg variables.

Enables the BASELINE.md parity configs: identical initial weights for the
loss-curve parity run (config #4) and identical trained weights for the
mask-match configs (#1/#2).  The mapping is explicit per module — every
live tpuseg parameter must be assigned exactly once, every unmapped
reference key must be on the documented skip list (dormant submodules the
live forward never touches), otherwise conversion fails loudly.

Layout rules (NCHW torch -> NHWC flax):
  Conv2d          (O,I,kh,kw)  -> (kh,kw,I,O)
  depthwise Conv  (C,1,kh,kw)  -> (kh,kw,1,C)
  ConvTranspose2d (I,O,kh,kw)  -> (kh,kw,I,O) + spatial flip (verified
                                   numerically vs torch, see parity tests)
  Linear          (O,I)        -> (I,O)
  BatchNorm       weight/bias  -> scale/bias; running_mean/var -> mean/var

NOTE: conversion requires the parity model configuration — the reference
constructs its SpatialAttentionLayer with ``d_h`` in the ``reduction``
position (attenet2.py:29), so its bottleneck is ``d_model//20 == 1``
channel; build the tpuseg model with ``DecoderConfig.sp_reduction=20``
(the default mirrors the reference's effective value).
"""

from __future__ import annotations

import os
import sys
from typing import Dict

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# reference keys the live forward never touches (dormant submodules)
SKIP_PREFIXES = (
    "decoder.pred.",        # DecoderLayer-level L0 head, unused in forward
    "decoder.embedding.",   # Embedding/CalPosition, unused in forward
    "decoder.attend.l2.",   # HardAttentionLayer h_t branch, commented out
)
SKIP_SUFFIXES = ("num_batches_tracked",)


def t_conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_dw(w):
    # torch depthwise (C,1,kh,kw) -> flax grouped kernel (kh,kw,1,C)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_convT(w):
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def t_linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


class _Assigner:
    def __init__(self, sd: Dict[str, "np.ndarray"]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()
        self.params: Dict[str, np.ndarray] = {}
        self.stats: Dict[str, np.ndarray] = {}

    def take(self, key):
        assert key in self.sd, f"missing reference key {key}"
        assert key not in self.used, f"reference key used twice: {key}"
        self.used.add(key)
        return self.sd[key]

    def put(self, path, value, collection="params"):
        dst = self.params if collection == "params" else self.stats
        assert path not in dst, f"flax path assigned twice: {path}"
        dst[path] = value

    # ---- composite blocks -------------------------------------------
    def conv(self, ref, path, depthwise=False, bias=True):
        w = self.take(ref + ".weight")
        self.put(path + "/kernel", t_dw(w) if depthwise else t_conv(w))
        if bias:
            self.put(path + "/bias", self.take(ref + ".bias"))

    def convT(self, ref, path):
        self.put(path + "/kernel", t_convT(self.take(ref + ".weight")))
        self.put(path + "/bias", self.take(ref + ".bias"))

    def linear(self, ref, path, bias=True):
        self.put(path + "/kernel", t_linear(self.take(ref + ".weight")))
        if bias:
            self.put(path + "/bias", self.take(ref + ".bias"))

    def bn(self, ref, path, stats_path=None):
        self.put(path + "/scale", self.take(ref + ".weight"))
        self.put(path + "/bias", self.take(ref + ".bias"))
        sp = stats_path if stats_path is not None else path
        self.put(sp + "/mean", self.take(ref + ".running_mean"), "batch_stats")
        self.put(sp + "/var", self.take(ref + ".running_var"), "batch_stats")
        self.used.add(ref + ".num_batches_tracked")

    def iv1r(self, ref, path):
        """InvertedV1Residual: conv.[0 dw,1 bn,3 pw,4 bn] ->
        Conv_0/_BN_0/Conv_1/_BN_1 (blocks.py:69-98)."""
        self.conv(ref + ".conv.0", path + "/Conv_0", depthwise=True,
                  bias=False)
        self.bn(ref + ".conv.1", path + "/_BN_0/BatchNorm_0")
        self.conv(ref + ".conv.3", path + "/Conv_1", bias=False)
        self.bn(ref + ".conv.4", path + "/_BN_1/BatchNorm_0")

    def ir(self, ref, path):
        """InvertedResidual: conv.[0 pw,1 bn,3 dw,4 bn,6 pw,7 bn] ->
        Conv_0.._BN_2 (blocks.py:101-130)."""
        self.conv(ref + ".conv.0", path + "/Conv_0", bias=False)
        self.bn(ref + ".conv.1", path + "/_BN_0/BatchNorm_0")
        self.conv(ref + ".conv.3", path + "/Conv_1", depthwise=True,
                  bias=False)
        self.bn(ref + ".conv.4", path + "/_BN_1/BatchNorm_0")
        self.conv(ref + ".conv.6", path + "/Conv_2", bias=False)
        self.bn(ref + ".conv.7", path + "/_BN_2/BatchNorm_0")

    def double_conv(self, ref, path):
        for i in range(2):
            self.iv1r(f"{ref}.down_conv_{i}", f"{path}/InvertedV1Residual_{i}")


def convert_state_dict(sd: Dict) -> Dict:
    """Returns {'params': flat, 'batch_stats': flat} with '/'-joined keys."""
    a = _Assigner(sd)

    # --- UNet backbone (unet_model.py / unet_parts.py)
    a.double_conv("base.inc.conv.conv", "base/inc")
    for k in range(1, 5):
        a.double_conv(f"base.down{k}.mpconv.conv",
                      f"base/down{k}/DoubleConv_0")
    for k in range(1, 5):
        a.convT(f"base.up{k}.up", f"base/up{k}/ConvTranspose_0")
        a.double_conv(f"base.up{k}.conv.conv", f"base/up{k}/DoubleConv_0")

    # --- semantic head (reseg.py:72-75)
    a.linear("channelAttend.fc.0", "channel_attend/Dense_0")
    a.linear("channelAttend.fc.2", "channel_attend/Dense_1")
    a.conv("sem_seg_output", "sem_seg_output")

    # --- instance stem (reseg.py:78-102) -> models/reseg.py::_InsStem
    a.conv("ins_seg_output_1.0", "ins_stem/Conv_0", depthwise=True)
    a.bn("ins_seg_output_1.1", "ins_stem/_BN_0/BatchNorm_0")
    a.conv("ins_seg_output_1.3", "ins_stem/Conv_1")
    a.bn("ins_seg_output_1.4", "ins_stem/_BN_1/BatchNorm_0")
    a.conv("ins_seg_output_2.0", "ins_stem/Conv_2")
    a.bn("ins_seg_output_2.1", "ins_stem/_BN_2/BatchNorm_0")
    a.conv("ins_seg_output_2.3", "ins_stem/Conv_3", depthwise=True)
    a.bn("ins_seg_output_2.4", "ins_stem/_BN_3/BatchNorm_0")
    a.conv("ins_seg_output_2.6", "ins_stem/Conv_4")
    a.bn("ins_seg_output_2.7", "ins_stem/_BN_4/BatchNorm_0")

    # --- spatial attention (utils.py:457-523) -> nn/attention.py
    a.conv("decoder.s_sp.l_v", "decoder/s_sp/Conv_0")
    a.linear("decoder.s_sp.l_h", "decoder/s_sp/Dense_0", bias=False)
    a.conv("decoder.s_sp.spatial_fc.1", "decoder/s_sp/Conv_1")
    a.bn("decoder.s_sp.bn", "decoder/s_sp/BatchNorm_0")

    # --- hard attention (utils.py:613-663)
    a.conv("decoder.attend.l1", "decoder/attend/Conv_0")
    a.conv("decoder.attend.attend_fc.1", "decoder/attend/Conv_1")
    a.bn("decoder.attend.bn", "decoder/attend/MaskedBatchNorm_0")

    # --- pyramid decoder (attenet2.py:410-473, utils.py:816-1112)
    for i in range(5):
        ref = f"decoder.bone.upAtten{i}"
        path = f"decoder/glimpse/bone/up_atten{i}"
        if i > 0:
            a.convT(f"{ref}.UpAtten.up", f"{path}/up")
        a.ir(f"{ref}.UpAtten.cross.up_feature.0", f"{path}/cross1")
        a.ir(f"{ref}.UpAtten.cross.up_feature.2", f"{path}/cross2")
        a.conv(f"{ref}.UpAtten.conv1.0", f"{path}/conv1/Conv_0", bias=False)
        a.bn(f"{ref}.UpAtten.conv1.1", f"{path}/conv1/_BN_0/BatchNorm_0")
        a.ir(f"{ref}.UpAtten.dilation_part1.0", f"{path}/dil1a")
        a.ir(f"{ref}.UpAtten.dilation_part1.1", f"{path}/dil1b")
        a.ir(f"{ref}.UpAtten.dilation_part2.0", f"{path}/dil2a")
        a.ir(f"{ref}.UpAtten.dilation_part2.1", f"{path}/dil2b")
        a.conv(f"{ref}.pred.l_i", f"decoder/glimpse/bone/pred{i}/Conv_0")
        a.conv(f"{ref}.pred.last_fc.1", f"decoder/glimpse/bone/pred{i}/Conv_1")

    unused = [
        k for k in a.sd
        if k not in a.used
        and not any(k.startswith(p) for p in SKIP_PREFIXES)
        and not k.endswith(SKIP_SUFFIXES)
    ]
    assert not unused, f"unmapped reference keys: {unused[:10]}"
    return {"params": a.params, "batch_stats": a.stats}


def to_variables(flat: Dict, template) -> Dict:
    """Unflatten into the tpuseg variables structure, checking that every
    template leaf is covered and shapes agree."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    out = {}
    for coll in ("params", "batch_stats"):
        tmpl = flatten_dict(template.get(coll, {}))
        src = flat[coll]
        built = {}
        for k, v in tmpl.items():
            path = "/".join(k)
            assert path in src, f"{coll} leaf not converted: {path}"
            got = src.pop(path)
            assert tuple(got.shape) == tuple(v.shape), (
                f"{coll}:{path} shape {got.shape} != template {v.shape} — "
                "build the tpuseg model with the parity config "
                "(sp_reduction=20)"
            )
            built[k] = jnp.asarray(got, jnp.float32)
        assert not src, f"converted {coll} leaves without a home: " \
                        f"{list(src)[:10]}"
        out[coll] = unflatten_dict(built)
    for coll in template:
        if coll not in out:
            out[coll] = template[coll]  # e.g. decoder_state (baseline EMA)
    return out


def convert(torch_module_or_sd, template) -> Dict:
    sd = torch_module_or_sd
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in sd.items()}
    return to_variables(convert_state_dict(sd), template)
