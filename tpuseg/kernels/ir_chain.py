"""Fused inverted-residual decode chain (Pallas TPU, inference).

STATUS: measured dead end, kept off the production path (PERF.md).
Interpret-mode parity passes and the kernel runs correctly on-chip
(tools/bench_ir_chain.py), but in isolation it is 13% SLOWER than XLA at
the production shapes — and tracing the real inference program showed
XLA already runs these blocks at ~HBM peak with a layout this kernel
cannot use (batch folded into the 128-lane minor dim), leaving no
bandwidth to recover; the chain's floor is the tiny-K (32/64) matmul MXU
efficiency, which fusing does not change.

The hot loop of the pyramid decoder runs, per level and per extraction
round, four MobileNetV2 ``InvertedResidual`` blocks back to back
(``tpuseg/decoder/pyramid.py`` ``dil1a..dil2b``; reference ``UpAttenLayer``,
``code/lib/archs/modules/utils.py:977-1111``).  Under XLA each block
compiles to two near-peak-bandwidth fusions that materialise the (N, H, W,
2C) hidden and the (N, H, W, C) output in HBM — ~3.2 GB of intermediate
traffic per block at the production decode batch.  This kernel runs the
whole chain out of VMEM: one read of ``x`` (+ the mid-chain skip ``x1u``),
one write of the result.

Layout/tiling: grid over (batch, row-blocks).  Each program loads a
row-block with a 4-row halo per side (one row per chained 3x3 depthwise
conv), runs

    y = IR4(IR3(IR2(IR1(x)) + x1u))          IR(v) = v + pw2(relu6(bn2(
                                                 dw3x3(relu6(bn1(pw1(v)))))))

with the BatchNorms folded into the conv weights (inference affine), and
writes the central ``hb`` rows.  Depthwise taps are 9 shifted
multiply-adds; row shifts use the halo, column shifts zero-fill at the
image edge (= conv SAME).  Rows outside the image are re-zeroed before
every depthwise so the chain reproduces XLA's per-conv SAME padding
exactly.

Weights arrive stacked over the 4 blocks: W1 (4, C, 2C), B1 (4, 2C),
WD (4, 3, 3, 2C), B2 (4, 2C), W2 (4, 2C, C), B3 (4, C).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4  # one row per chained depthwise conv


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _shift_rows(h, dy):
    """out[r] = h[r + dy]; vacated rows zero (they live in the halo)."""
    if dy == 0:
        return h
    zeros = jnp.zeros(h.shape[:1][:0] + (1,) + h.shape[1:], h.dtype)
    if dy == 1:
        return jnp.concatenate([h[1:], zeros], axis=0)
    return jnp.concatenate([zeros, h[:-1]], axis=0)


def _shift_cols(h, dx):
    """out[:, w] = h[:, w + dx]; zero-fill = conv SAME at the W edges."""
    if dx == 0:
        return h
    zeros = jnp.zeros((h.shape[0], 1) + h.shape[2:], h.dtype)
    if dx == 1:
        return jnp.concatenate([h[:, 1:], zeros], axis=1)
    return jnp.concatenate([zeros, h[:, :-1]], axis=1)


def _ir_block(v, row_ok, w1, b1, wd, b2, w2, b3, out_dtype):
    """One folded inverted residual on a (R, W, C) VMEM block."""
    f32 = jnp.float32
    h = jax.lax.dot_general(
        v, w1, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )
    h = _relu6(h + b1)
    # conv-SAME at the image top/bottom: the depthwise must see zeros for
    # rows beyond the image, not bn-shifted pad rows
    h = jnp.where(row_ok, h, 0.0).astype(out_dtype)
    # dw3x3 = per-dx row-combines (cheap dim-0 slices), then 2 column
    # shifts — 2 sublane moves total instead of 6 shifted full copies
    wd = wd.astype(out_dtype)

    def rowmix(dx):
        return (h[:-2] * wd[0, dx + 1] + h[1:-1] * wd[1, dx + 1]
                + h[2:] * wd[2, dx + 1])  # (R-2, W, Ch), = rows 1..R-1

    t = rowmix(0) + _shift_cols(rowmix(-1), -1) + _shift_cols(rowmix(1), 1)
    h = _relu6(t.astype(f32) + b2).astype(out_dtype)
    o = jax.lax.dot_general(
        h, w2, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )
    # output covers rows 1..R-1 of the input block: residual from v[1:-1]
    return (v[1:-1].astype(f32) + o + b3).astype(out_dtype)


def _kernel(x_ref, x1u_ref, w1_ref, b1_ref, wd_ref, b2_ref, w2_ref, b3_ref,
            out_ref, *, hb: int, height: int, mid_add: bool):
    i = pl.program_id(1)
    R = hb + 2 * HALO

    v = x_ref[0]
    dt = v.dtype
    for s in range(4):
        # stage s consumes rows [s, R-s) of the block and emits [s+1, R-s-1)
        rs = R - 2 * s
        # absolute (unpadded) image row of this stage's local row r is
        # i*hb - HALO + s + r
        row = (jax.lax.broadcasted_iota(jnp.int32, (rs, 1, 1), 0)
               + i * hb - HALO + s)
        row_ok = (row >= 0) & (row < height)
        if mid_add and s == 2:
            v = (v.astype(jnp.float32)
                 + x1u_ref[0][2:R - 2].astype(jnp.float32)).astype(dt)
        v = _ir_block(
            v, row_ok,
            w1_ref[s], b1_ref[s].astype(jnp.float32),
            wd_ref[s], b2_ref[s].astype(jnp.float32),
            w2_ref[s], b3_ref[s].astype(jnp.float32),
            dt,
        )
    out_ref[...] = v


@functools.partial(
    jax.jit, static_argnames=("hb", "interpret")
)
def ir_chain(x, x1u, w1, b1, wd, b2, w2, b3, hb: Optional[int] = None,
             interpret: bool = False):
    """Fused 4-block inverted-residual chain.

    x: (N, H, W, C); x1u: same shape or None (added before block 3).
    Stacked folded weights as in the module docstring.  Returns (N,H,W,C).
    """
    n, height, width, ch = x.shape
    if hb is None:
        hb = min(32, height)
    assert height % hb == 0, (height, hb)
    R = hb + 2 * HALO

    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
    mid_add = x1u is not None
    if mid_add:
        x1p = jnp.pad(x1u, ((0, 0), (HALO, HALO), (0, 0), (0, 0)))
    else:
        x1p = jnp.zeros((n, 1, width, ch), x.dtype)  # placeholder, unread

    grid = (n, height // hb)

    def xmap(b, i):
        # overlapping halo windows: pl.Element dims take ELEMENT offsets
        # into the padded array (probe-verified); the batch dim is a
        # squeezed size-1 block indexed in blocks
        return (b, i * hb, 0, 0)

    # mosaic requires every dim of a spec to be Element (or none): the
    # batch dim becomes Element(1) with an element offset, and the kernel
    # indexes the leading size-1 dim away
    elem = (pl.Element(1), pl.Element(R), pl.Element(width), pl.Element(ch))
    win = pl.BlockSpec(elem, xmap)
    x1_spec = (
        pl.BlockSpec(elem, xmap)
        if mid_add
        else pl.BlockSpec(
            (pl.Element(1), pl.Element(1), pl.Element(width),
             pl.Element(ch)),
            lambda b, i: (b, 0, 0, 0),
        )
    )

    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim)

    out = pl.pallas_call(
        functools.partial(_kernel, hb=hb, height=height, mid_add=mid_add),
        grid=grid,
        in_specs=[
            win, x1_spec,
            full(w1), full(b1), full(wd), full(b2), full(w2), full(b3),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), hb, width, ch), lambda b, i: (b, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(xp, x1p, w1, b1, wd, b2, w2, b3)
    return out


# ---------------------------------------------------------------------------
# BN folding from flax variables
# ---------------------------------------------------------------------------


def fold_ir_params(ir_vars, eps: float = 1e-5):
    """(w1, b1, wd, b2, w2, b3) from one ``InvertedResidual``'s variables
    ({'params': ..., 'batch_stats': ...}), BNs folded to inference affine."""
    p = ir_vars["params"]
    s = ir_vars["batch_stats"]

    def bn(i):
        bp = p[f"_BN_{i}"]["BatchNorm_0"]
        bs = s[f"_BN_{i}"]["BatchNorm_0"]
        scale = bp["scale"] / jnp.sqrt(bs["var"] + eps)
        shift = bp["bias"] - bs["mean"] * scale
        return scale, shift

    s1, t1 = bn(0)
    s2, t2 = bn(1)
    s3, t3 = bn(2)
    w1 = p["Conv_0"]["kernel"][0, 0] * s1[None, :]            # (C, 2C)
    wd = p["Conv_1"]["kernel"][:, :, 0, :] * s2[None, None, :]  # (3,3,2C)
    w2 = p["Conv_2"]["kernel"][0, 0] * s3[None, :]            # (2C, C)
    return w1, t1, wd, t2, w2, t3


def stack_chain_params(ir_vars_list, dtype=jnp.bfloat16):
    """Stack 4 blocks' folded params into the kernel's inputs."""
    folded = [fold_ir_params(v) for v in ir_vars_list]
    w1, b1, wd, b2, w2, b3 = (
        jnp.stack([f[i] for f in folded]) for i in range(6)
    )
    return (w1.astype(dtype), b1.astype(jnp.float32), wd.astype(jnp.float32),
            b2.astype(jnp.float32), w2.astype(dtype), b3.astype(jnp.float32))
