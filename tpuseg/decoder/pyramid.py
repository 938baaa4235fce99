"""Point-conditioned 5-level pyramid mask decoder.

Reference: ``AttenDecoder``/``UpDecoderLayer``/``UpAttenLayer``
(``code/lib/archs/modules/attenet2.py:410-493`` and
``code/lib/archs/modules/utils.py:816-1112``).

Given one sampled glimpse point per batch element and the UNet encoder
pyramid (x1..x5 at 1x..1/16x), decodes a full-resolution binary mask for
the instance containing that point, producing 2-class logits at every level
(16^2 .. 256^2) for the pyramid loss.

TPU redesign of the reference's host-side machinery:
  * the glimpse point is a flat on-device int32 index per sample; the
    per-level integer coordinates and the binary sub-pixel position code
    (reference ``resize_p``/``bin``, utils.py:823-836) are bit arithmetic;
  * ``conPosition`` (utils.py:1027-1045) — a python loop writing one pixel
    per sample — becomes a vectorised one-hot outer product;
  * level resizing of gold/attention/semantic masks (utils.py:838-867) is
    max/avg reduce-window pooling, which XLA maps to native TPU ops;
  * the skip-feature transforms (reference ``cross`` chains,
    utils.py:977-991) are glimpse-independent, so ``transform_skips`` is
    exposed separately — inference loops hoist it out of the per-glimpse
    scan and reuse the result for every glimpse.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.configs import DecoderConfig
from tpuseg.nn.blocks import Conv1x1BN, InvertedResidual
from tpuseg.nn.heads import L0Head

_FACTORS = (16, 8, 4, 2, 1)


def level_channels(n_filters: int = 32) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """(skip channels coarse->fine, level output channels)."""
    f = n_filters
    skips = (16 * f, 8 * f, 4 * f, 2 * f, f)
    outs = (8 * f, 4 * f, 2 * f, f, f)
    return skips, outs


def n_position_extra(factor: int, use_mask: bool, position_type: int) -> int:
    return (2 * int(math.log2(factor)) if position_type else 0) + (
        2 if use_mask else 0
    )


def skip_transform_shapes(
    batch: int, height: int, width: int, n_filters: int = 32,
    use_mask: bool = True, position_type: int = 1,
) -> List[Tuple[int, int, int, int]]:
    """Shapes of ``AttenDecoder.transform_skips`` outputs (coarse->fine)."""
    _, outs = level_channels(n_filters)
    shapes = []
    for factor, oc in zip(_FACTORS, outs):
        n_extra = n_position_extra(factor, use_mask, position_type)
        shapes.append(
            (batch, height // factor, width // factor, oc - n_extra)
        )
    return shapes


def point_level_code(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int], level_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(row_l, col_l, code): level-resolution point coordinates and the
    (B, 2N+1) per-sample channel code of the position planes — the planes
    are ``one_hot(row_l, col_l) ⊗ code``, so consumers that are linear in
    the planes (conv1) can scatter ``code @ W`` at one pixel instead of
    materialising B×h×w×(2N+1) activations (pyramid ``call_split``)."""
    H, W = full_hw
    h, w = level_hw
    f = H // h
    n_bits = int(math.log2(f)) if f > 1 else 0
    b = point_flat.shape[0]
    row = point_flat // W
    col = point_flat % W
    row_l, col_l = row // f, col // f
    row_r, col_r = row % f, col % f

    vals = []
    for t in range(n_bits):
        vals.append(((row_r >> (n_bits - 1 - t)) & 1).astype(jnp.float32))
    for t in range(n_bits):
        vals.append(((col_r >> (n_bits - 1 - t)) & 1).astype(jnp.float32))
    vals.append(jnp.ones((b,), jnp.float32))
    code = jnp.stack(vals, axis=-1)  # (B, 2N+1)
    return row_l, col_l, code


def point_position_planes(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int], level_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Build the (B, h, w, 2N+1) glimpse-position planes for one level.

    Channel layout matches the reference (utils.py:1027-1036): channels
    0..2N-1 hold the binary code of the sub-pixel offset (row bits then
    col bits, MSB first) written at the level-resolution point pixel;
    channel 2N is the one-hot point indicator.
    """
    h, w = level_hw
    row_l, col_l, code = point_level_code(point_flat, full_hw, level_hw)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    onehot = (
        (yy[None] == row_l[:, None, None]) & (xx[None] == col_l[:, None, None])
    ).astype(jnp.float32)  # (B, h, w)
    return onehot[..., None] * code[:, None, None, :]


def window_origin(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int], win: int,
    stride: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int, int]:
    """Quantised decode-window origin for each glimpse point.

    Origins live on a ``stride`` grid (default win/2) so every
    downstream crop and paste is a STATIC slice selected by a one-hot —
    TPU scatter/gather forces layout copies, PERF.md dead ends.  The
    nearest grid origin to the centered window is chosen, guaranteeing
    interior points sit at least (win - stride)/2 from every window
    edge — a DENSER grid (smaller stride) centers the instance better
    at identical decode compute (only the one-hot select reads grow,
    ~0.5 ms/round at K=25, B*G=128, 256²).

    Returns (ir, ic, onehot, n_r, n_c): per-point grid indices, the
    (N, n_r*n_c) selection one-hot, and the grid extent.
    """
    H, W = full_hw
    s = stride or (win // 2)
    n_r = max((H - win) // s + 1, 1)
    n_c = max((W - win) // s + 1, 1)
    row = point_flat // W
    col = point_flat % W
    # nearest grid index to (row - win/2): floor((row - win/2 + s/2)/s)
    ir = jnp.clip((row - win // 2 + s // 2) // s, 0, n_r - 1)
    ic = jnp.clip((col - win // 2 + s // 2) // s, 0, n_c - 1)
    onehot = jax.nn.one_hot(ir * n_c + ic, n_r * n_c, dtype=jnp.float32)
    return ir, ic, onehot, n_r, n_c


def window_origin_fg(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int], win: int,
    stride: int, fg_mask: jnp.ndarray, group: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int, int]:
    """Foreground-seeking window origin (quality variant of
    ``window_origin``): among the grid origins that keep the glimpse at
    least win/8 inside the window, pick the one whose window contains
    the most remaining foreground.  Elongated instances extend toward
    the plant's mass, so point-CENTERED windows waste half their area on
    empty background and truncate the leaf body — mass-seeking windows
    recover that (measured on the frozen eval; see PERF.md).  Costs one
    reduce_window over the fg mask per round (~8 MB read at 256² B=32).

    fg_mask: (B, H, W, 1) remaining-foreground; point_flat: (B*group,).
    """
    H, W = full_hw
    s = stride
    n_r = max((H - win) // s + 1, 1)
    n_c = max((W - win) // s + 1, 1)
    row = point_flat // W
    col = point_flat % W
    ir0 = jnp.clip((row - win // 2 + s // 2) // s, 0, n_r - 1)
    ic0 = jnp.clip((col - win // 2 + s // 2) // s, 0, n_c - 1)
    # remaining-fg mass of every candidate window: (B, n_r, n_c)
    pool = jax.lax.reduce_window(
        fg_mask[..., 0], 0.0, jax.lax.add, (1, win, win), (1, s, s),
        "valid",
    )
    pool = jnp.repeat(pool, group, axis=0)  # (B*G, n_r, n_c)
    m = win // 8
    o_r = jnp.arange(n_r) * s
    o_c = jnp.arange(n_c) * s
    ok_r = (row[:, None] - o_r[None] >= m) & (
        o_r[None] + win - row[:, None] > m
    )
    ok_c = (col[:, None] - o_c[None] >= m) & (
        o_c[None] + win - col[:, None] > m
    )
    ok = ok_r[:, :, None] & ok_c[:, None, :]
    # the nearest-centered origin is always allowed (canvas borders can
    # empty the margin-constrained set)
    near = (
        (jnp.arange(n_r)[None] == ir0[:, None])[:, :, None]
        & (jnp.arange(n_c)[None] == ic0[:, None])[:, None, :]
    )
    score = jnp.where(ok | near, pool, -1.0)
    k = jnp.argmax(score.reshape(-1, n_r * n_c), axis=1)
    ir = k // n_c
    ic = k % n_c
    onehot = jax.nn.one_hot(k, n_r * n_c, dtype=jnp.float32)
    return ir, ic, onehot, n_r, n_c


def select_window(
    x: jnp.ndarray, onehot: jnp.ndarray, n_r: int, n_c: int, wl: int, sl: int
) -> jnp.ndarray:
    """Per-sample window crop as a one-hot select over the static grid
    slices.  x: (N, h, w, C), onehot: (N, K=n_r*n_c) -> (N, wl, wl, C)."""
    crops = jnp.stack(
        [
            x[:, r * sl : r * sl + wl, c * sl : c * sl + wl, :]
            for r in range(n_r)
            for c in range(n_c)
        ]
    )  # (K, N, wl, wl, C)
    return jnp.einsum("knhwc,nk->nhwc", crops, onehot.astype(x.dtype))


def select_window_grouped(
    x: jnp.ndarray, onehot: jnp.ndarray, group: int, n_r: int, n_c: int,
    wl: int, sl: int,
) -> jnp.ndarray:
    """Window crop of a batch-B tensor with per-(B,group) origins.
    x: (B, h, w, C), onehot: (B*group, K) -> (B, group, wl, wl, C)."""
    b = x.shape[0]
    crops = jnp.stack(
        [
            x[:, r * sl : r * sl + wl, c * sl : c * sl + wl, :]
            for r in range(n_r)
            for c in range(n_c)
        ]
    )  # (K, B, wl, wl, C)
    oh = onehot.reshape(b, group, -1).astype(x.dtype)
    return jnp.einsum("kbhwc,bgk->bghwc", crops, oh)


def paste_window(
    win_vals: jnp.ndarray, onehot: jnp.ndarray, n_r: int, n_c: int,
    full_hw: Tuple[int, int], sl: int, fill,
) -> jnp.ndarray:
    """Paste per-sample windows back onto the full canvas (one-hot over
    the static pad positions; pixels outside the window get ``fill``).
    win_vals: (N, wl, wl, C) -> (N, H, W, C)."""
    H, W = full_hw
    wl = win_vals.shape[1]
    out = None
    cover = None
    ones = jnp.ones_like(win_vals[..., :1])
    for r in range(n_r):
        for c in range(n_c):
            k = r * n_c + c
            pads = (
                (0, 0), (r * sl, H - wl - r * sl), (c * sl, W - wl - c * sl),
                (0, 0),
            )
            wk = onehot[:, k][:, None, None, None].astype(win_vals.dtype)
            p = jnp.pad(win_vals, pads) * wk
            cv = jnp.pad(ones, pads) * wk
            out = p if out is None else out + p
            cover = cv if cover is None else cover + cv
    fill = jnp.asarray(fill, win_vals.dtype)
    return jnp.where(cover > 0, out, fill)


def point_position_planes_win(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int],
    level_hw: Tuple[int, int], origin_rl: jnp.ndarray,
    origin_cl: jnp.ndarray, win_l: int,
) -> jnp.ndarray:
    """Windowed ``point_position_planes``: the same per-sample channel
    code, with the one-hot pixel written at window-local coordinates
    (level coords minus the window origin at this level)."""
    row_l, col_l, code = point_level_code(point_flat, full_hw, level_hw)
    rw = row_l - origin_rl
    cw = col_l - origin_cl
    yy = jax.lax.broadcasted_iota(jnp.int32, (win_l, win_l), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (win_l, win_l), 1)
    onehot = (
        (yy[None] == rw[:, None, None]) & (xx[None] == cw[:, None, None])
    ).astype(jnp.float32)
    return onehot[..., None] * code[:, None, None, :]


def _maxpool(x: jnp.ndarray, f: int) -> jnp.ndarray:
    if f == 1:
        return x
    return nn.max_pool(x, (f, f), strides=(f, f))


def _avgpool(x: jnp.ndarray, f: int) -> jnp.ndarray:
    if f == 1:
        return x
    return nn.avg_pool(x, (f, f), strides=(f, f))


def _prev_mask_gate(pred_logits_prev: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Reference ``UpAttenLayer.Mask`` (utils.py:1047-1056): bilinear-resize
    the previous level's 2-class logits to this level and take the softmax
    foreground probability."""
    b = pred_logits_prev.shape[0]
    m = jax.image.resize(
        pred_logits_prev, (b, hw[0], hw[1], 2), method="bilinear"
    )
    return jax.nn.softmax(m, axis=-1)[..., 1:2]


class _UpAttenLevel(nn.Module):
    """One pyramid level (reference ``UpAttenLayer``, utils.py:946-1112)."""

    out_ch: int
    factor: int
    is_first: bool = False
    use_mask: bool = True
    drop_rate: float = 0.5
    position_type: int = 1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        n_extra = n_position_extra(
            self.factor, self.use_mask, self.position_type
        )
        if not self.is_first:
            self.up = nn.ConvTranspose(
                self.out_ch, (2, 2), strides=(2, 2), dtype=self.dtype
            )
        self.cross1 = InvertedResidual(self.out_ch, dtype=self.dtype)
        self.cross2 = InvertedResidual(self.out_ch - n_extra, dtype=self.dtype)
        self.drop = nn.Dropout(rate=self.drop_rate, broadcast_dims=(1, 2))
        self.conv1 = Conv1x1BN(self.out_ch, dtype=self.dtype)
        self.dil1a = InvertedResidual(self.out_ch, dtype=self.dtype)
        self.dil1b = InvertedResidual(self.out_ch, dtype=self.dtype)
        self.dil2a = InvertedResidual(self.out_ch, dtype=self.dtype)
        self.dil2b = InvertedResidual(self.out_ch, dtype=self.dtype)

    def transform_skip(self, x_skip, train: bool = False):
        """Glimpse-independent skip transform (reference ``cross``,
        utils.py:977-991)."""
        y = self.cross1(x_skip, train)
        y = self.drop(y, deterministic=not train)
        return self.cross2(y, train)

    # ----- split conv1: glimpse-independent partial + per-round rest -----
    #
    # ``conv1`` consumes concat([skip_t, x1u*gate, mask_all, pos]) — the
    # skip and semantic-mask channels are glimpse/round-invariant while
    # x1u and the position planes change per extraction round.  Since a
    # 1x1 conv (+ eval-mode BN affine) is linear in its input channels,
    # the invariant half is computed ONCE per image batch (B) and the
    # per-round program only convolves the variable channels at the B*G
    # decode batch, adding the partial back with a free broadcast over G.
    # This removes the repeated skip pyramid from the round loop entirely
    # (measured: ~37 ms/batch of repeat broadcasts + per-round layout
    # copies at 256² B=32 G=4, see PERF.md).  Eval-only: BN running stats.

    def _conv1_folded(self):
        """conv1's (kernel (Cin, Cout), scale, shift) with eval-BN folded
        to a per-output-channel affine."""
        v = self.conv1.variables
        k = v["params"]["Conv_0"]["kernel"][0, 0]
        bnp = v["params"]["_BN_0"]["BatchNorm_0"]
        bns = v["batch_stats"]["_BN_0"]["BatchNorm_0"]
        scale = bnp["scale"] / jnp.sqrt(bns["var"] + 1e-5)
        shift = bnp["bias"] - bns["mean"] * scale
        return k, scale, shift

    def _conv1_sections(self):
        """(S, U): skip and x1u channel counts in the conv1 concat."""
        n_extra = n_position_extra(
            self.factor, self.use_mask, self.position_type
        )
        S = self.out_ch - n_extra
        U = 0 if self.is_first else self.out_ch
        return S, U

    def conv1_const(self, skip_t, mask_all):
        """Glimpse-independent conv1 partial: (B, h, w, out_ch), scale
        and shift folded in (the variable half adds its scaled conv and
        applies the relu)."""
        k, scale, shift = self._conv1_folded()
        S, U = self._conv1_sections()
        kc = jnp.concatenate([k[:S], k[S + U : S + U + 1]], axis=0)
        xc = jnp.concatenate(
            [skip_t, mask_all.astype(skip_t.dtype)], axis=-1
        )
        part = jax.lax.dot_general(
            xc, kc.astype(xc.dtype), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        part = part * scale + shift
        return part.astype(self.dtype or part.dtype)

    def call_split(self, x_prev, part, point_flat, mask_pre, group: int):
        """Per-round half of the level given the ``conv1_const`` partial.

        x_prev/mask_pre are at the folded B*G decode batch; ``part`` is at
        B (broadcast over G here, fused by XLA into the add)."""
        b = part.shape[0]
        h, w = part.shape[1:3]
        full = (h * self.factor, w * self.factor)
        k, scale, shift = self._conv1_folded()
        S, U = self._conv1_sections()

        dt = self.dtype or part.dtype
        bg = point_flat.shape[0]
        # One dot over only the variable channels (x1u*gate + position
        # planes), BN scale folded into the kernel columns, f32 MXU
        # accumulation with a bf16 epilogue; the partial broadcast-add
        # over G and the relu stay one elementwise fusion.  (Measured
        # dead ends: f32 round-sized intermediates 82.8 -> 72.4 img/s;
        # scatter-based rank-1 position update forces layout copies,
        # 82.8 -> 74.0 — see PERF.md.)
        pos = point_position_planes(point_flat, full, (h, w))
        ks = scale[None, :]
        x1u = None
        if self.is_first:
            x_in = pos.astype(dt)
            kv = k[S + U + 1 :]
        else:
            x1u = self.up(x_prev)
            gate = (
                1.0 if mask_pre is None
                else _prev_mask_gate(mask_pre, (h, w))
            )
            x_in = jnp.concatenate(
                [(x1u * gate).astype(dt), pos.astype(dt)], axis=-1
            )
            kv = jnp.concatenate([k[S : S + U], k[S + U + 1 :]], axis=0)
        # dt-out dot (XLA still accumulates f32 in the MXU for bf16
        # operands); requesting an f32 output materialises a round-sized
        # f32 copy instead (measured +20 ms/batch), and an f32 partial
        # broadcast adds another +11 — keep the whole epilogue in dt
        yv = jax.lax.dot_general(
            x_in, (kv * ks).astype(dt), (((3,), (0,)), ((), ())),
        )
        x = nn.relu(
            yv.reshape(b, group, h, w, self.out_ch) + part[:, None]
        ).reshape(bg, h, w, self.out_ch)

        x = self.dil1a(x, False)
        x = self.dil1b(x, False)
        if not self.is_first:
            x = x + x1u
        x = self.dil2a(x, False)
        return self.dil2b(x, False)

    def call_split_win(self, x_prev, part_win, point_flat, mask_pre,
                       group: int, origin_idx, full_hw, level_stride=0):
        """Windowed ``call_split``: the level computes only a per-glimpse
        window (PERF.md round-5 lever — the finest IR chains are the
        dominant device cost and an instance is local to its glimpse).

        part_win: (B, group, wl, wl, out_ch) — the conv1 partial already
        cropped per glimpse (``select_window_grouped``); x_prev/mask_pre
        are window-aligned at the previous level (the stride-2 up-conv
        commutes exactly with the aligned crop); origin_idx: (ir, ic)
        grid indices from ``window_origin`` (origins at this level are
        ``idx * wl/2`` — the finest-grid stride divides through every
        factor because window % (2*factor) == 0 is asserted upstream).
        """
        b, g = part_win.shape[:2]
        wl = part_win.shape[2]
        k, scale, shift = self._conv1_folded()
        S, U = self._conv1_sections()
        dt = self.dtype or part_win.dtype
        bg = point_flat.shape[0]
        ir, ic = origin_idx
        sl = level_stride or (wl // 2)
        pos = point_position_planes_win(
            point_flat, full_hw,
            (full_hw[0] // self.factor, full_hw[1] // self.factor),
            ir * sl, ic * sl, wl,
        )
        ks = scale[None, :]
        x1u = self.up(x_prev)
        gate = (
            1.0 if mask_pre is None else _prev_mask_gate(mask_pre, (wl, wl))
        )
        x_in = jnp.concatenate(
            [(x1u * gate).astype(dt), pos.astype(dt)], axis=-1
        )
        kv = jnp.concatenate([k[S : S + U], k[S + U + 1 :]], axis=0)
        yv = jax.lax.dot_general(
            x_in, (kv * ks).astype(dt), (((3,), (0,)), ((), ())),
        )
        x = nn.relu(
            yv.reshape(b, g, wl, wl, self.out_ch) + part_win
        ).reshape(bg, wl, wl, self.out_ch)

        x = self.dil1a(x, False)
        x = self.dil1b(x, False)
        x = x + x1u
        x = self.dil2a(x, False)
        return self.dil2b(x, False)

    def __call__(self, x_prev, skip_t, point_flat, mask_pre, mask_all,
                 train: bool = False):
        """skip_t: precomputed ``transform_skip`` output for this level."""
        b, h, w, _ = skip_t.shape
        full = (h * self.factor, w * self.factor)

        if self.is_first:
            x = skip_t
            x1u = None
        else:
            x1u = self.up(x_prev)
            gate = 1.0 if mask_pre is None else _prev_mask_gate(mask_pre, (h, w))
            x = jnp.concatenate([skip_t, x1u * gate], axis=-1)

        if mask_all is not None:
            x = jnp.concatenate([x, mask_all.astype(x.dtype)], axis=-1)
        pos = point_position_planes(point_flat, full, (h, w))
        x = jnp.concatenate([x, pos.astype(x.dtype)], axis=-1)
        x = self.conv1(x, train)
        x = self.drop(x, deterministic=not train)
        x = self.dil1a(x, train)
        x = self.dil1b(x, train)
        if not self.is_first:
            x = x + x1u
        x = self.drop(x, deterministic=not train)
        x = self.dil2a(x, train)
        x = self.dil2b(x, train)
        return x


class AttenDecoder(nn.Module):
    """Full 5-level decoder (reference ``AttenDecoder``, attenet2.py:410-473).

    ``__call__(point_flat, feats, sem_mask, gold, anchorpro, train)``
    matches the reference semantics (transform + decode per glimpse);
    ``transform_skips``/``decode`` expose the two halves so inference
    loops can hoist the glimpse-independent transforms.

    Returns (targets, preds): 5 per-level gold masks (or Nones) and 5
    per-level 2-class logits, coarse->fine.
    """

    cfg: DecoderConfig
    n_filters: int = 32
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        _, outs = level_channels(self.n_filters)
        self.levels = [
            _UpAttenLevel(
                out_ch=oc,
                factor=f,
                is_first=(i == 0),
                use_mask=self.cfg.use_mask,
                drop_rate=self.cfg.drop_rate,
                position_type=self.cfg.position_type,
                dtype=self.dtype,
                name=f"up_atten{i}",
            )
            for i, (f, oc) in enumerate(zip(_FACTORS, outs))
        ]
        self.heads = [
            L0Head(dtype=self.dtype, name=f"pred{i}") for i in range(5)
        ]

    def transform_skips(self, feats, train: bool = False) -> List[jnp.ndarray]:
        """feats: UNet skips (x1..x5, fine->coarse). Returns transformed
        skips coarse->fine, one per level."""
        skips = list(reversed(feats))  # x5..x1
        return [
            lvl.transform_skip(s, train) for lvl, s in zip(self.levels, skips)
        ]

    def conv1_partials(self, skips_t, sem_mask) -> List[jnp.ndarray]:
        """Per-level glimpse-independent conv1 partials (eval-only).

        skips_t: ``transform_skips`` outputs (coarse->fine) at batch B;
        sem_mask: (B, H, W, 1).  The returned partials replace the skip
        pyramid + semantic mask as the loop-invariant decode inputs — the
        extraction rounds never touch the raw skips again."""
        H = sem_mask.shape[1]
        parts = []
        for lvl, skip_t in zip(self.levels, skips_t):
            f = H // skip_t.shape[1]
            parts.append(lvl.conv1_const(skip_t, _maxpool(sem_mask, f)))
        return parts

    def decode_split(
        self, point_flat, partials, group: int, window: int = 0,
        window_stride: int = 0, fg_mask=None,
    ) -> List[jnp.ndarray]:
        """Per-round pyramid decode from precomputed ``conv1_partials``
        (eval-only).  point_flat is at the folded B*group decode batch;
        partials stay at B.  Returns the 5 per-level 2-class logits.

        ``window > 0`` decodes the levels with factor <= 2 (the finest
        two — the dominant device cost, PERF.md) only inside a
        per-glimpse ``window``² crop of the canvas, pasting the finest
        logits back with background fill outside (so ``preds[-1]`` keeps
        its full-resolution contract; the windowed INTERMEDIATE preds
        stay window-sized — extraction consumes only the last).  Windows
        sit on a quantised origin grid: every crop/paste is a static
        slice select, no scatter/gather.  Pixels beyond the window are
        background by construction — a truncation the window size must
        be chosen to make irrelevant (origin grid keeps the glimpse
        >= window/4 from every edge)."""
        H, W = (
            partials[-1].shape[1] * _FACTORS[-1],
            partials[-1].shape[2] * _FACTORS[-1],
        )
        # the configured window is calibrated at the reference 256 canvas;
        # scale it with the actual resolution (instances occupy a similar
        # FRACTION of native-resolution images).  Square canvases only;
        # any divisibility failure falls back to the full decode rather
        # than asserting (bucketed shapes vary).
        use_win = bool(window) and H == W
        if use_win:
            stride = window_stride or (window // 2)
            if H != 256:
                window = window * H // 256
                stride = max(stride * H // 256, 4)
            use_win = (
                window % 4 == 0 and stride % 4 == 0 and 0 < window < H
                and (H - window) % stride == 0
                and (W - window) % stride == 0
            )
        if use_win:
            if fg_mask is not None:
                ir, ic, onehot, n_r, n_c = window_origin_fg(
                    point_flat, (H, W), window, stride, fg_mask, group
                )
            else:
                ir, ic, onehot, n_r, n_c = window_origin(
                    point_flat, (H, W), window, stride
                )
        preds: List[jnp.ndarray] = []
        x = None
        prev_pred = None
        for i, (lvl, head, part) in enumerate(
            zip(self.levels, self.heads, partials)
        ):
            f = lvl.factor
            if not (use_win and f <= 2):
                x = lvl.call_split(x, part, point_flat, prev_pred, group)
            else:
                wl, sl = window // f, stride // f
                if self.levels[i - 1].factor > 2:
                    # first windowed level: crop the previous level's
                    # full-canvas output / logits to the aligned window
                    pf = self.levels[i - 1].factor
                    wp, sp = window // pf, stride // pf
                    x = select_window(x, onehot, n_r, n_c, wp, sp)
                    prev_pred = select_window(
                        prev_pred, onehot, n_r, n_c, wp, sp
                    )
                part_win = select_window_grouped(
                    part, onehot, group, n_r, n_c, wl, sl
                )
                x = lvl.call_split_win(
                    x, part_win, point_flat, prev_pred, group, (ir, ic),
                    (H, W), sl,
                )
            pred_l = head(x)
            preds.append(pred_l)
            prev_pred = pred_l
        if use_win:
            # full-resolution contract for the consumed finest logits:
            # outside the window the background class wins
            preds[-1] = paste_window(
                preds[-1], onehot, n_r, n_c, (H, W), stride,
                fill=jnp.asarray([1.0, -1.0], preds[-1].dtype),
            )
        return preds

    def decode(
        self, point_flat, skips_t, sem_mask, gold=None, anchorpro=None,
        train: bool = False,
    ) -> Tuple[List[Optional[jnp.ndarray]], List[jnp.ndarray]]:
        del anchorpro  # consumed by dormant PN losses only (attenet2.py:260)
        H = sem_mask.shape[1]
        preds: List[jnp.ndarray] = []
        targets: List[Optional[jnp.ndarray]] = []
        x = None
        prev_pred = None
        for i, (lvl, head, skip_t) in enumerate(
            zip(self.levels, self.heads, skips_t)
        ):
            f = H // skip_t.shape[1]
            gold_l = _maxpool(gold, f) if gold is not None else None
            mask_all_l = _maxpool(sem_mask, f)
            x = lvl(x, skip_t, point_flat, prev_pred, mask_all_l, train)
            pred_l = head(x)
            preds.append(pred_l)
            targets.append(gold_l)
            prev_pred = pred_l
        return targets, preds

    def __call__(
        self, point_flat, feats, sem_mask, gold=None, anchorpro=None,
        train: bool = False, skips_t=None,
    ) -> Tuple[List[Optional[jnp.ndarray]], List[jnp.ndarray]]:
        if skips_t is None:
            skips_t = self.transform_skips(feats, train)
        return self.decode(
            point_flat, list(skips_t), sem_mask, gold, anchorpro, train
        )
