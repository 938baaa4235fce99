"""Pallas TPU kernels for the SRU elementwise recurrence.

The TPU equivalent of the reference's native kernels:
  * forward — ``sru_cpu_impl.cpp:55-133`` (C++), ``cuda_functional.py:52-112``
    (CUDA ``sru_fwd``);
  * backward — ``cuda_functional.py:114-228`` (CUDA ``sru_bwd`` with its
    atomicAdd weight-grad reduction);
  * bidirectional — ``cuda_functional.py:230-305`` (``sru_bi_fwd``) and
    ``:305-437`` (``sru_bi_bwd``).

After the fused GEMM ``U = x @ W`` (left to the MXU via XLA), the
per-timestep recurrence is a bandwidth-bound scan.  The kernels tile the
fused (batch*hidden) axis across the grid — the direct analogue of the
CUDA one-thread-per-column layout (``cuda_functional.py:72-74``) — with
the direction as a second grid dimension (the CUDA kernels fold direction
into the column index instead), and each program scans the full time axis
in VMEM: one kernel launch per pass instead of L fused loop iterations.

The backward kernel replaces CUDA's atomicAdd weight-gradient reduction
with per-column partial sums accumulated in the scan carry; the wrapper
reduces the (batch*d) partials to (d,) — a deterministic tree reduction
instead of nondeterministic atomics.

``sru_scan_fused`` wires forward+backward into ``jax.custom_vjp`` so the
Pallas path is differentiable end-to-end; ``sru_scan_pallas`` remains the
inference-only entry.  Parity vs the autodiff'd ``lax.scan`` is asserted
in ``tests/test_sru.py`` (fwd/bwd x uni/bi).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _act_pair(activation: int):
    """(g(c), g'(c)) for activation code 0 id / 1 tanh / 2 relu
    (sru_cpu_impl.cpp:218-244)."""
    if activation == 0:
        return (lambda c: c), (lambda c: jnp.ones_like(c))
    if activation == 1:
        return jnp.tanh, (lambda c: 1.0 - jnp.tanh(c) ** 2)
    if activation == 2:
        return (
            (lambda c: jnp.maximum(c, 0.0)),
            (lambda c: (c > 0).astype(c.dtype)),
        )
    raise ValueError(activation)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(u0, u1, u2, xp, fw, rw, fb, rb, c0, mc,
                h_ref, call_ref, cf_ref,
                *, length: int, activation: int, has_skip: bool):
    """One program scans the time axis for one (direction, 128-lane column
    block).  Direction 1 scans time reversed (grid dim 0)."""
    act, _ = _act_pair(activation)
    di = pl.program_id(0)
    fwv = fw[0, 0:1, :]
    rwv = rw[0, 0:1, :]
    fbv = fb[0, 0:1, :]
    rbv = rb[0, 0:1, :]
    mcv = mc[0, 0:1, :]

    def body(s, c):
        t = jnp.where(di == 1, length - 1 - s, s)
        u0_t = u0[0, pl.ds(t, 1), :]
        u1_t = u1[0, pl.ds(t, 1), :]
        u2_t = u2[0, pl.ds(t, 1), :]
        f_t = jax.nn.sigmoid(u1_t + fbv + c * fwv)
        r_t = jax.nn.sigmoid(u2_t + rbv + c * rwv)
        c_t = u0_t + (c - u0_t) * f_t
        g = act(c_t) * mcv
        if has_skip:
            xp_t = xp[0, pl.ds(t, 1), :]
            h_t = xp_t + (g - xp_t) * r_t
        else:
            h_t = g * r_t
        h_ref[0, pl.ds(t, 1), :] = h_t
        call_ref[0, pl.ds(t, 1), :] = c_t
        return c_t

    c_final = jax.lax.fori_loop(0, length, body, c0[0, 0:1, :])
    cf_ref[0, 0:1, :] = c_final


def _bwd_kernel(u0, u1, u2, xp, cprev, call, gh, gcf, fw, rw, fb, rb, mc,
                gu0_ref, gu1_ref, gu2_ref, gxp_ref,
                gfw_ref, grw_ref, gfb_ref, grb_ref, gc0_ref,
                *, length: int, activation: int, has_skip: bool):
    """Backward scan (reference ``sru_bwd``/``sru_bi_bwd``,
    cuda_functional.py:114-437): walks time opposite to the forward scan,
    carrying the cell-state cotangent and per-column partial weight grads.
    ``cprev`` holds c_{scan-previous} in time-index space (built by the
    wrapper), so the kernel recomputes the gates instead of storing them.
    """
    act, dact = _act_pair(activation)
    di = pl.program_id(0)
    fwv = fw[0, 0:1, :]
    rwv = rw[0, 0:1, :]
    fbv = fb[0, 0:1, :]
    rbv = rb[0, 0:1, :]
    mcv = mc[0, 0:1, :]

    def body(s, carry):
        gc, afw, arw, afb, arb = carry
        # forward scanned s=0..L-1 at t_eff; backward visits them reversed
        t = jnp.where(di == 0, length - 1 - s, s)
        u0_t = u0[0, pl.ds(t, 1), :]
        u1_t = u1[0, pl.ds(t, 1), :]
        u2_t = u2[0, pl.ds(t, 1), :]
        c_t = call[0, pl.ds(t, 1), :]
        cp_t = cprev[0, pl.ds(t, 1), :]
        gh_t = gh[0, pl.ds(t, 1), :]
        f_t = jax.nn.sigmoid(u1_t + fbv + cp_t * fwv)
        r_t = jax.nn.sigmoid(u2_t + rbv + cp_t * rwv)
        g_used = act(c_t) * mcv
        if has_skip:
            xp_t = xp[0, pl.ds(t, 1), :]
            dr = gh_t * (g_used - xp_t)
            gxp_ref[0, pl.ds(t, 1), :] = gh_t * (1.0 - r_t)
        else:
            dr = gh_t * g_used
            gxp_ref[0, pl.ds(t, 1), :] = jnp.zeros_like(gh_t)
        gc_total = gh_t * r_t * mcv * dact(c_t) + gc
        du2 = dr * r_t * (1.0 - r_t)
        du1 = gc_total * (cp_t - u0_t) * f_t * (1.0 - f_t)
        du0 = gc_total * (1.0 - f_t)
        gu0_ref[0, pl.ds(t, 1), :] = du0
        gu1_ref[0, pl.ds(t, 1), :] = du1
        gu2_ref[0, pl.ds(t, 1), :] = du2
        gc_prev = gc_total * f_t + du1 * fwv + du2 * rwv
        return (
            gc_prev,
            afw + du1 * cp_t,
            arw + du2 * cp_t,
            afb + du1,
            arb + du2,
        )

    zero = jnp.zeros_like(gcf[0, 0:1, :])
    gc_final, afw, arw, afb, arb = jax.lax.fori_loop(
        0, length, body, (gcf[0, 0:1, :], zero, zero, zero, zero)
    )
    gfw_ref[0, 0:1, :] = afw
    grw_ref[0, 0:1, :] = arw
    gfb_ref[0, 0:1, :] = afb
    grb_ref[0, 0:1, :] = arb
    gc0_ref[0, 0:1, :] = gc_final


# ---------------------------------------------------------------------------
# packing helpers (direction-major layout)
# ---------------------------------------------------------------------------


def _pack(cfg, u, x, weight_c, bias, c0, mask_c, has_skip_term, scale_x):
    """Split U and the parameter vectors into direction-major padded
    arrays: tensors (ndir, l_pad, n_pad), vectors (ndir, 1, n_pad)."""
    length, batch, d, k, ndir, l_pad, n, n_pad = cfg
    u6 = u.reshape(length, batch, ndir, d, k)
    wc = weight_c.reshape(2, ndir, d)
    bb = bias.reshape(2, ndir, d)
    c0r = c0.reshape(batch, ndir, d)

    def t_pack(a):  # (L, B, ndir, d) -> (ndir, l_pad, n_pad)
        a = a.transpose(2, 0, 1, 3).reshape(ndir, length, n)
        return jnp.pad(a, ((0, 0), (0, l_pad - length), (0, n_pad - n)))

    def v_pack(v):  # (ndir, d) tiled over batch -> (ndir, 1, n_pad)
        vv = jnp.tile(v[:, None, :], (1, batch, 1)).reshape(ndir, n)
        return jnp.pad(vv, ((0, 0), (0, n_pad - n)))[:, None, :]

    u0 = t_pack(u6[..., 0])
    u1 = t_pack(u6[..., 1])
    u2 = t_pack(u6[..., 2])
    if not has_skip_term:
        xp = jnp.zeros_like(u0)
    elif k == 3:
        xpt = x.reshape(length, batch, ndir, d)
        xp = t_pack(xpt * scale_x if scale_x != 1 else xpt)
    else:
        xp = t_pack(u6[..., 3])
    fw = v_pack(wc[0])
    rw = v_pack(wc[1])
    fb = v_pack(bb[0])
    rb = v_pack(bb[1])
    c0p = jnp.pad(
        c0r.transpose(1, 0, 2).reshape(ndir, n), ((0, 0), (0, n_pad - n))
    )[:, None, :]
    mc = (
        jnp.ones((ndir, 1, n_pad), u.dtype)
        if mask_c is None
        else jnp.pad(
            mask_c.reshape(batch, ndir, d).transpose(1, 0, 2).reshape(ndir, n),
            ((0, 0), (0, n_pad - n)),
        )[:, None, :]
    )
    return u0, u1, u2, xp, fw, rw, fb, rb, c0p, mc


def _unpack_t(a, cfg):  # (ndir, l_pad, n_pad) -> (L, B, ndir*d)
    length, batch, d, k, ndir, l_pad, n, n_pad = cfg
    a = a[:, :length, :n].reshape(ndir, length, batch, d)
    return a.transpose(1, 2, 0, 3).reshape(length, batch, ndir * d)


def _unpack_v(a, cfg):  # (ndir, 1, n_pad) -> (B, ndir*d)
    length, batch, d, k, ndir, l_pad, n, n_pad = cfg
    a = a[:, 0, :n].reshape(ndir, batch, d)
    return a.transpose(1, 0, 2).reshape(batch, ndir * d)


def _specs(cfg, n_tensors_in, n_vecs_in, n_tensors_out, n_vecs_out):
    length, batch, d, k, ndir, l_pad, n, n_pad = cfg
    grid = (ndir, n_pad // _LANES)
    mat = pl.BlockSpec(
        (1, l_pad, _LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec(
        (1, 1, _LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [mat] * n_tensors_in + [vec] * n_vecs_in
    out_specs = [mat] * n_tensors_out + [vec] * n_vecs_out
    t_shape = jax.ShapeDtypeStruct((ndir, l_pad, n_pad), jnp.float32)
    v_shape = jax.ShapeDtypeStruct((ndir, 1, n_pad), jnp.float32)
    out_shape = [t_shape] * n_tensors_out + [v_shape] * n_vecs_out
    return grid, in_specs, out_specs, out_shape


def _cfg(u, d, bidirectional):
    length, batch = u.shape[0], u.shape[1]
    ndir = 2 if bidirectional else 1
    k = u.shape[-1] // d // ndir
    n = batch * d
    return (
        length, batch, d, k, ndir, _round_up(max(length, 1), 8), n,
        _round_up(n, _LANES),
    )


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def _fwd(u, x, weight_c, bias, c0, mask_c, d, activation, bidirectional,
         has_skip_term, scale_x, interpret):
    cfg = _cfg(u, d, bidirectional)
    length = cfg[0]
    packed = _pack(cfg, u, x, weight_c, bias, c0, mask_c, has_skip_term,
                   scale_x)
    grid, in_specs, out_specs, out_shape = _specs(cfg, 4, 6, 2, 1)
    h, c_all, cf = pl.pallas_call(
        functools.partial(
            _fwd_kernel, length=length, activation=activation,
            has_skip=has_skip_term,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_resolve_interpret(interpret),
    )(*packed)
    return _unpack_t(h, cfg), _unpack_v(cf, cfg), c_all, packed, cfg


def sru_scan_pallas(
    u: jnp.ndarray,         # (L, B, bidir*d*k)
    x: jnp.ndarray,         # (L, B, n_in)
    weight_c: jnp.ndarray,  # (2*bidir*d,)
    bias: jnp.ndarray,      # (2*bidir*d,)
    c0: jnp.ndarray,        # (B, bidir*d)
    d: int,
    activation: int = 0,
    bidirectional: bool = False,
    has_skip_term: bool = True,
    scale_x: float = 1.0,
    mask_c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused SRU recurrence (uni or bi), inference entry.
    Returns (h (L,B,bidir*d), c_final (B,bidir*d))."""
    h, cf, _, _, _ = _fwd(
        u, x, weight_c, bias, c0, mask_c, d, activation, bidirectional,
        has_skip_term, scale_x, interpret,
    )
    return h, cf


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def sru_scan_fused(
    u, x, weight_c, bias, c0, mask_c,
    d: int, activation: int = 0, bidirectional: bool = False,
    has_skip_term: bool = True, scale_x: float = 1.0,
    interpret: Optional[bool] = None,
):
    """Differentiable fused SRU scan: Pallas forward + Pallas backward
    (the reference's ``SRU_Compute_GPU`` Function pair,
    cuda_functional.py:488-609).  ``mask_c`` is a dropout mask and gets a
    zero cotangent.  Returns (h, c_final)."""
    h, cf, _, _, _ = _fwd(
        u, x, weight_c, bias, c0, mask_c, d, activation, bidirectional,
        has_skip_term, scale_x, interpret,
    )
    return h, cf


def _fused_fwd(u, x, weight_c, bias, c0, mask_c, d, activation,
               bidirectional, has_skip_term, scale_x, interpret):
    h, cf, c_all, packed, cfg = _fwd(
        u, x, weight_c, bias, c0, mask_c, d, activation, bidirectional,
        has_skip_term, scale_x, interpret,
    )
    del cfg  # rebuilt statically in _fused_bwd (residuals must be arrays)
    return (h, cf), (packed, c_all, u, x)


def _fused_bwd(d, activation, bidirectional, has_skip_term, scale_x,
               interpret, res, cts):
    packed, c_all, u, x = res
    u0, u1, u2, xp, fw, rw, fb, rb, c0p, mc = packed
    cfg = _cfg(u, d, bidirectional)
    length, batch, dd, k, ndir, l_pad, n, n_pad = cfg
    x_shape, dtype = x.shape, u.dtype
    gh_t, gcf_t = cts

    # c_{scan-previous} in time-index space: forward direction reads
    # c[t-1] (c0 at t=0); the reverse direction scanned t=L-1..0, so its
    # scan-previous at t is c[t+1] (c0 at t=L-1).
    cprev_rows = []
    for di in range(ndir):
        ca = c_all[di, :length]
        if di == 0:
            cp = jnp.concatenate([c0p[0, 0:1, :], ca[:-1]], axis=0)
        else:
            cp = jnp.concatenate([ca[1:], c0p[di, 0:1, :]], axis=0)
        cprev_rows.append(jnp.pad(cp, ((0, l_pad - length), (0, 0))))
    cprev = jnp.stack(cprev_rows, axis=0)

    def t_pack(a):  # (L, B, ndir*d) cotangent -> (ndir, l_pad, n_pad)
        a = a.reshape(length, batch, ndir, dd).transpose(2, 0, 1, 3)
        a = a.reshape(ndir, length, n)
        return jnp.pad(a, ((0, 0), (0, l_pad - length), (0, n_pad - n)))

    gh = t_pack(gh_t.astype(jnp.float32))
    gcf = jnp.pad(
        gcf_t.astype(jnp.float32).reshape(batch, ndir, dd)
        .transpose(1, 0, 2).reshape(ndir, n),
        ((0, 0), (0, n_pad - n)),
    )[:, None, :]

    grid, in_specs, out_specs, out_shape = _specs(cfg, 8, 5, 4, 5)
    gu0, gu1, gu2, gxp, gfw, grw, gfb, grb, gc0 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, length=length, activation=activation,
            has_skip=has_skip_term,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_resolve_interpret(interpret),
    )(u0, u1, u2, xp, cprev, c_all, gh, gcf, fw, rw, fb, rb, mc)

    # reassemble dU (L, B, ndir*d*k)
    gu_parts = [_unpack_t(g, cfg) for g in (gu0, gu1, gu2)]
    gxp_t = _unpack_t(gxp, cfg)
    if has_skip_term and k == 4:
        gu_parts.append(gxp_t)
    gu = jnp.stack(
        [p.reshape(length, batch, ndir, dd) for p in gu_parts], axis=-1
    )
    if k == 4 and not has_skip_term:
        gu = jnp.concatenate(
            [gu, jnp.zeros((length, batch, ndir, dd, 1), gu.dtype)], axis=-1
        )
    gu = gu.reshape(length, batch, ndir * dd * k).astype(dtype)

    # dx: only the k=3 skip path reads x directly (x' = x * scale_x)
    if has_skip_term and k == 3:
        gx = (gxp_t * scale_x).reshape(x_shape).astype(dtype)
    else:
        gx = jnp.zeros(x_shape, dtype)

    # weight/bias grads: reduce the per-column partials over batch
    # (the deterministic replacement for CUDA's atomicAdd reduction)
    def v_reduce(a):  # (ndir, 1, n_pad) -> (ndir, d)
        return a[:, 0, :n].reshape(ndir, batch, dd).sum(axis=1)

    gwc = jnp.stack([v_reduce(gfw), v_reduce(grw)], axis=0).reshape(-1)
    gbias = jnp.stack([v_reduce(gfb), v_reduce(grb)], axis=0).reshape(-1)
    gc0_t = _unpack_v(gc0, cfg).astype(dtype)

    gmask = jnp.zeros((batch, ndir * dd), dtype)
    return (gu, gx, gwc.astype(dtype), gbias.astype(dtype), gc0_t, gmask)


sru_scan_fused.defvjp(_fused_fwd, _fused_bwd)
