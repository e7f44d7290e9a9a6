"""Micro-bench: conv vs matmul decimator + upsampler on the accelerator.

Run: python logs/bench_resample_micro.py   (uses the default axon platform)
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


def timeit(fn, *args, iters=20, warmup=3, chain=4):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    # chain K dispatches per sync to amortize the tunnel's per-call cost
    best = []
    for _ in range(iters // chain):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f(*args)
        np.asarray(jax.device_get(out[..., :8]))
        best.append((time.perf_counter() - t0) / chain)
    return min(best) * 1e3, float(np.median(best) * 1e3)


def main():
    from janus_tpu.ops.yin import _track_difference, yin_track

    rng = np.random.default_rng(0)
    x48 = jnp.asarray(rng.standard_normal((8, 480000)).astype(np.float32))
    x24 = jnp.asarray(rng.standard_normal((8, 131072)).astype(np.float32))
    x16 = jnp.asarray(rng.standard_normal((8, 160000)).astype(np.float32))

    cases = [
        ("decimate conv  8x10s48k", lambda x: _decimate_fir_conv(x, 3, 96), (x48,)),
        ("decimate matmul 8x10s48k", lambda x: _decimate_fir(x, 3, 96), (x48,)),
        ("upsample poly 24k->48k 8x5.5s", lambda x: resample_poly(x, 2, 1), (x24,)),
    ]
    for route in ("pallas", "dft", "xla"):
        cases.append((
            f"yin d(tau) 16k 8x10s [{route}]",
            functools.partial(
                lambda x, r: _track_difference(x, 1360, 170, 402, route=r),
                r=route),
            (x16,),
        ))
    cases.append((
        "yin_track full 16k 8x10s [dft]",
        lambda x: yin_track(x, 16_000, 1360, 170, fmin=40.0, fmax=1000.0),
        (x16,),
    ))
    for name, fn, args in cases:
        mn, md = timeit(fn, *args)
        print(f"{name:34s} min {mn:8.2f} ms  median {md:8.2f} ms")


if __name__ == "__main__":
    main()
