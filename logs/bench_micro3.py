"""Device-time micro-bench: loop each op N times INSIDE one jit program
(sequential data dependency) so the ~6 ms per-dispatch tunnel floor
amortizes away. Reported: (t_loopN - t_loop1) / (N - 1) per iteration.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

apply_env_platform()
enable_compile_cache()

from janus_tpu.ops.resample import _decimate_fir, _decimate_fir_conv, resample_poly  # noqa: E402
from janus_tpu.ops import yin as Y  # noqa: E402
from janus_tpu.ops.yin_pallas import block_sums as pallas_bs  # noqa: E402


def looped(fn, x, n):
    """Run fn n times with a sequential scalar dependency injected."""
    def body(i, carry):
        eps, acc = carry
        out = fn(x + eps)
        s = jnp.sum(out[..., :1])
        return (s * 0.0, acc + s)

    return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]


def time_one(fn, x, n, reps=6):
    f = jax.jit(functools.partial(looped, fn, n=n), static_argnames=())
    g = jax.jit(lambda xx: looped(fn, xx, 1))
    for h, a in ((f, x), (g, x)):
        float(h(a))
    tf = []
    tg = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f(x)); tf.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(g(x)); tg.append(time.perf_counter() - t0)
    per = (min(tf) - min(tg)) / (n - 1)
    return per * 1e3


def main():
    rng = np.random.default_rng(0)
    x48 = jnp.asarray(rng.standard_normal((8, 480000)).astype(np.float32))
    x24 = jnp.asarray(rng.standard_normal((8, 131072)).astype(np.float32))
    x16 = jnp.asarray(rng.standard_normal((8, 160000)).astype(np.float32))
    padded, n_hops = Y._pad_stream(x16, 1360, 170)
    nblk = n_hops + 1360 // 2 // 170 - 1

    N = 16
    rows = [
        ("decimate conv", lambda x: _decimate_fir_conv(x, 3, 96), x48),
        ("decimate matmul", lambda x: _decimate_fir(x, 3, 96), x48),
        ("upsample conv 24k->48k", lambda x: resample_poly(x, 2, 1), x24),
        ("yin bs pallas", lambda p: pallas_bs(p, nblk, 170, 402), padded),
        ("yin bs dft", lambda p: Y._block_sums_dft(p, nblk, 170, 402), padded),
        ("yin d(tau) dft", lambda x: Y._track_difference(x, 1360, 170, 402, route="dft"), x16),
        ("yin d(tau) pallas", lambda x: Y._track_difference(x, 1360, 170, 402, route="pallas"), x16),
        ("yin_track full dft", lambda x: Y.yin_track(x, 16_000, 1360, 170, fmin=40.0, fmax=1000.0), x16),
    ]
    for name, fn, arg in rows:
        try:
            print(f"{name:28s} {time_one(fn, arg, N):8.3f} ms/iter (device)")
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
