"""Real-hardware Pallas kernel validation.

CI parity tests run the kernels in interpret mode on CPU; this script
compiles and runs them on the actual TPU chip and asserts parity against
the jnp references — run manually / per round on the TPU host.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import time

import jax
import jax.numpy as jnp
import numpy as np


def check_sru():
    from tpuseg.kernels.sru_scan import sru_scan_pallas
    from tpuseg.nn.sru import sru_recurrence

    rng = np.random.RandomState(0)
    L, B, d, k = 64, 8, 128, 4
    u = jnp.asarray(rng.randn(L, B, d * k).astype(np.float32))
    x = jnp.asarray(rng.randn(L, B, d).astype(np.float32))
    wc = jnp.asarray(rng.randn(2 * d).astype(np.float32))
    bias = jnp.asarray(rng.randn(2 * d).astype(np.float32))
    c0 = jnp.asarray(rng.randn(B, d).astype(np.float32))

    h_ref, c_ref = jax.jit(
        lambda *a: sru_recurrence(*a, d=d, activation=1, scale_x=1.0)
    )(u, x, wc, bias, c0)
    h_pl, c_pl = jax.jit(
        lambda *a: sru_scan_pallas(*a, d=d, activation=1, scale_x=1.0,
                                   interpret=False)
    )(u, x, wc, bias, c0)
    np.testing.assert_allclose(
        np.asarray(h_ref), np.asarray(h_pl), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_ref), np.asarray(c_pl), rtol=2e-4, atol=2e-4
    )
    print("SRU pallas kernel: parity OK on", jax.devices()[0], flush=True)

    # timing: kernel vs scan (amortized)
    def timeit(f, n=5):
        _ = np.asarray(f()[0][0, 0])
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            out = f()
            _ = np.asarray(out[0][0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    L2, B2, d2 = 512, 32, 256
    u2 = jnp.asarray(rng.randn(L2, B2, d2 * 4).astype(np.float32))
    x2 = jnp.asarray(rng.randn(L2, B2, d2).astype(np.float32))
    wc2 = jnp.asarray(rng.randn(2 * d2).astype(np.float32))
    b2 = jnp.asarray(rng.randn(2 * d2).astype(np.float32))
    c02 = jnp.zeros((B2, d2), jnp.float32)
    f_scan = jax.jit(
        lambda: sru_recurrence(u2, x2, wc2, b2, c02, d=d2, activation=1)
    )
    f_pl = jax.jit(
        lambda: sru_scan_pallas(u2, x2, wc2, b2, c02, d=d2, activation=1,
                                interpret=False)
    )
    t_scan, t_pl = timeit(f_scan), timeit(f_pl)
    print(
        f"SRU L={L2} B={B2} d={d2}: lax.scan {t_scan*1e3:.2f} ms vs "
        f"pallas {t_pl*1e3:.2f} ms ({t_scan/t_pl:.2f}x)", flush=True,
    )


def check_masked_softmax():
    from tpuseg.kernels.masked_softmax import masked_softmax_pallas

    rng = np.random.RandomState(1)
    b, hw, n = 4, 256 * 256, 32
    e = jnp.asarray(rng.randn(b, hw).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, hw, n) < 0.05).astype(np.float32))

    def ref(e, mask):
        logits = jnp.where(mask > 0, e[:, :, None], -1e30)
        p = jax.nn.softmax(logits, axis=1)
        nonempty = jnp.sum(mask, axis=1, keepdims=True) > 0
        return jnp.where(nonempty, p, 0.0)

    want = np.asarray(jax.jit(ref)(e, mask))
    got = np.asarray(
        jax.jit(lambda e, m: masked_softmax_pallas(e, m, interpret=False))(
            e, mask
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)
    print("masked_softmax pallas kernel: parity OK", flush=True)

    def timeit(f, n=5):
        _ = np.asarray(f()[0, 0, 0])
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            out = f()
            _ = np.asarray(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_ref = timeit(jax.jit(lambda: ref(e, mask)))
    t_pl = timeit(
        jax.jit(lambda: masked_softmax_pallas(e, mask, interpret=False))
    )
    print(
        f"masked_softmax B={b} HW={hw} N={n}: xla {t_ref*1e3:.2f} ms vs "
        f"pallas {t_pl*1e3:.2f} ms ({t_ref/t_pl:.2f}x)", flush=True,
    )


if __name__ == "__main__":
    check_sru()
    check_masked_softmax()
    print("ALL TPU KERNEL CHECKS PASSED", flush=True)
