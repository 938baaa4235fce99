"""Windowed finest-level decode (cfg.decoder.extract_window, PERF.md
round-5 lever): origin-grid invariants, crop/paste exactness, and the
decode_split contract (full-resolution finest logits, background fill
outside the window, interior agreement with the full decode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.decoder.pyramid import (
    paste_window,
    point_position_planes,
    point_position_planes_win,
    select_window,
    select_window_grouped,
    window_origin,
)


def test_window_origin_point_stays_interior():
    """Every point sits >= win/4 from each window edge (interior grid)
    and inside the window everywhere, including canvas borders."""
    H = W = 64
    win = 32
    pts = jnp.arange(0, H * W, 7, dtype=jnp.int32)
    ir, ic, oh, n_r, n_c = window_origin(pts, (H, W), win)
    assert n_r == n_c == (H - win) // (win // 2) + 1
    row = np.asarray(pts) // W
    col = np.asarray(pts) % W
    r0 = np.asarray(ir) * (win // 2)
    c0 = np.asarray(ic) * (win // 2)
    assert (row - r0 >= 0).all() and (row - r0 < win).all()
    assert (col - c0 >= 0).all() and (col - c0 < win).all()
    interior = (row >= win // 4) & (row < H - win // 4)
    assert (row[interior] - r0[interior] >= win // 4).all()
    assert (row[interior] - r0[interior] <= 3 * win // 4).all()
    # one-hot selects the chosen cell
    np.testing.assert_array_equal(
        np.asarray(oh).argmax(1), np.asarray(ir) * n_c + np.asarray(ic)
    )


def test_select_and_paste_roundtrip():
    """crop(select) then paste reproduces the window region exactly and
    fills outside with the fill value."""
    rng = np.random.RandomState(0)
    H = W = 32
    win = 16
    n = 5
    x = jnp.asarray(rng.randn(n, H, W, 3).astype(np.float32))
    pts = jnp.asarray(rng.randint(0, H * W, (n,)), jnp.int32)
    ir, ic, oh, n_r, n_c = window_origin(pts, (H, W), win)
    crop = select_window(x, oh, n_r, n_c, win, win // 2)
    r0 = np.asarray(ir) * (win // 2)
    c0 = np.asarray(ic) * (win // 2)
    for j in range(n):
        np.testing.assert_array_equal(
            np.asarray(crop)[j],
            np.asarray(x)[j, r0[j]:r0[j] + win, c0[j]:c0[j] + win],
        )
    pasted = paste_window(crop, oh, n_r, n_c, (H, W), win // 2, fill=-7.0)
    pa = np.asarray(pasted)
    for j in range(n):
        np.testing.assert_array_equal(
            pa[j, r0[j]:r0[j] + win, c0[j]:c0[j] + win],
            np.asarray(x)[j, r0[j]:r0[j] + win, c0[j]:c0[j] + win],
        )
        mask = np.ones((H, W), bool)
        mask[r0[j]:r0[j] + win, c0[j]:c0[j] + win] = False
        assert (pa[j][mask] == -7.0).all()


def test_select_window_grouped_matches_per_sample():
    rng = np.random.RandomState(1)
    H = W = 32
    win, G, b = 16, 2, 3
    part = jnp.asarray(rng.randn(b, H, W, 4).astype(np.float32))
    pts = jnp.asarray(rng.randint(0, H * W, (b * G,)), jnp.int32)
    ir, ic, oh, n_r, n_c = window_origin(pts, (H, W), win)
    got = select_window_grouped(part, oh, G, n_r, n_c, win, win // 2)
    r0 = np.asarray(ir) * (win // 2)
    c0 = np.asarray(ic) * (win // 2)
    for j in range(b):
        for g in range(n := G):
            s = j * G + g
            np.testing.assert_array_equal(
                np.asarray(got)[j, g],
                np.asarray(part)[j, r0[s]:r0[s] + win, c0[s]:c0[s] + win],
            )


def test_position_planes_windowed_match_cropped_full():
    """The windowed planes are exactly the window crop of the full-canvas
    planes (same code channels, shifted one-hot pixel)."""
    rng = np.random.RandomState(2)
    H = W = 64
    win = 32
    level = (32, 32)  # factor 2
    pts = jnp.asarray(rng.randint(0, H * W, (6,)), jnp.int32)
    ir, ic, oh, n_r, n_c = window_origin(pts, (H, W), win)
    full = point_position_planes(pts, (H, W), level)
    wl = win // 2
    winp = point_position_planes_win(
        pts, (H, W), level, ir * (wl // 2), ic * (wl // 2), wl
    )
    crop = select_window(full, oh, n_r, n_c, wl, wl // 2)
    np.testing.assert_array_equal(np.asarray(winp), np.asarray(crop))


def test_decode_split_windowed_contract():
    """decode_split(window=64) at 128²: finest logits keep the full-res
    shape, are exactly background outside each glimpse's window, and
    match the full decode wherever the receptive field stays inside the
    window (margin 16 px covers the two levels' IR chains ±~14)."""
    from tpuseg.configs import cvppp_config
    from tpuseg.decoder.pyramid import AttenDecoder

    H = W = 128
    nf = 8
    B, G = 1, 2
    # decode_split's window parameter is in 256-reference-canvas units,
    # auto-scaled by H/256: pass 128 to get a PHYSICAL 64 window at 128²
    win = 64
    dcfg = cvppp_config().decoder
    dec = AttenDecoder(cfg=dcfg, n_filters=nf)
    rng = np.random.RandomState(3)
    feats = [
        jnp.asarray(rng.randn(B, H // f, W // f, nf * c).astype(np.float32))
        for f, c in [(1, 1), (2, 2), (4, 4), (8, 8), (16, 16)]
    ]
    sem = jnp.asarray((rng.rand(B, H, W, 1) > 0.5).astype(np.float32))
    # central-ish points: both well interior
    pts = jnp.asarray([64 * W + 64, 60 * W + 70], jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), pts[:1], feats, sem)

    skips_t = dec.apply(variables, feats, method="transform_skips")
    parts = dec.apply(variables, skips_t, sem, method="conv1_partials")
    full = dec.apply(variables, pts, list(parts), G, method="decode_split")
    winp = dec.apply(
        variables, pts, list(parts), G, 2 * win, method="decode_split"
    )
    pf, pw = np.asarray(full[-1]), np.asarray(winp[-1])
    assert pw.shape == pf.shape == (B * G, H, W, 2)

    ir, ic, _, _, _ = window_origin(pts, (H, W), win)
    r0 = np.asarray(ir) * (win // 2)
    c0 = np.asarray(ic) * (win // 2)
    for s in range(B * G):
        out = np.ones((H, W), bool)
        out[r0[s]:r0[s] + win, c0[s]:c0[s] + win] = False
        # outside: the background fill wins
        assert (pw[s][out][:, 0] > pw[s][out][:, 1]).all()
        # interior (16 px inside the window): matches the full decode
        m = 16
        a = pf[s, r0[s] + m:r0[s] + win - m, c0[s] + m:c0[s] + win - m]
        b_ = pw[s, r0[s] + m:r0[s] + win - m, c0[s] + m:c0[s] + win - m]
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_window_origin_fg_seeks_mass_with_margin():
    """The fg-seeking origin picks the candidate window with the most
    remaining foreground among those keeping the point >= win/8 inside;
    at canvas borders it falls back to the nearest-centered origin."""
    from tpuseg.decoder.pyramid import window_origin_fg

    H = W = 64
    win, s = 32, 16
    fg = np.zeros((1, H, W, 1), np.float32)
    fg[0, 0:32, 0:32] = 1.0  # all mass in the top-left window
    # point at (24, 24): origins {0,16}x{0,16} all keep the win/8
    # margin; origin (0,0) holds the most mass
    pts = jnp.asarray([24 * W + 24], jnp.int32)
    ir, ic, oh, n_r, n_c = window_origin_fg(
        pts, (H, W), win, s, jnp.asarray(fg), group=1
    )
    assert int(ir[0]) == 0 and int(ic[0]) == 0
    # same point, mass bottom-right: origin moves toward the mass but
    # must keep the point >= 4 px inside -> origin (1,1) (=16,16)
    fg2 = np.zeros((1, H, W, 1), np.float32)
    fg2[0, 32:, 32:] = 1.0
    ir, ic, oh, n_r, n_c = window_origin_fg(
        pts, (H, W), win, s, jnp.asarray(fg2), group=1
    )
    r0, c0 = int(ir[0]) * s, int(ic[0]) * s
    assert 24 - r0 >= win // 8 and r0 + win - 24 > win // 8
    assert r0 == 16 and c0 == 16
    # border point: nearest origin fallback keeps it in range
    ptsb = jnp.asarray([1 * W + 1], jnp.int32)
    ir, ic, oh, _, _ = window_origin_fg(
        ptsb, (H, W), win, s, jnp.asarray(fg2), group=1
    )
    assert int(ir[0]) == 0 and int(ic[0]) == 0
