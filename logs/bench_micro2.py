"""Sub-piece timing for the decimate/YIN optimizations."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

apply_env_platform()
enable_compile_cache()

from janus_tpu.ops.resample import _decimate_fir, _decimate_matmul_weights  # noqa: E402
from janus_tpu.ops import yin as Y  # noqa: E402


def timeit(fn, *args, iters=20, warmup=3, chain=4):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(iters // chain):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:8]))
        best.append((time.perf_counter() - t0) / chain)
    return min(best) * 1e3


def bs_dft_tuned(padded, nblk, hop, n_lags_out, precision, n_extra=0):
    """Copy of _block_sums_dft with tunable precision and minimal N."""
    batch = padded.shape[:-1]
    b = int(np.prod(batch))
    x = padded.reshape(b, padded.shape[-1]).astype(jnp.float32)
    tau_pad = n_lags_out  # exact width, no lane rounding
    span = hop - 1 + tau_pad
    n = span + (span % 2) + n_extra
    f_need = -(-span // hop)
    total_needed = (nblk - 1 + f_need) * hop
    t = x.shape[-1]
    if t < total_needed:
        x = jnp.pad(x, ((0, 0), (0, total_needed - t)))
    frames = x[:, : (nblk - 1 + f_need) * hop].reshape(b, -1, hop)
    xb = jnp.concatenate(
        [frames[:, m : m + nblk, :] for m in range(f_need)], axis=-1
    )[..., :span]
    cos_a, sin_a, cos_b, sin_b, cos_t, sin_t = map(
        jnp.asarray, Y._dft_corr_mats(hop, span, tau_pad, n))
    a = xb[..., :hop]
    a_re = jnp.matmul(a, cos_a, precision=precision)
    a_im = -jnp.matmul(a, sin_a, precision=precision)
    b_re = jnp.matmul(xb, cos_b, precision=precision)
    b_im = -jnp.matmul(xb, sin_b, precision=precision)
    p_re = a_re * b_re + a_im * b_im
    p_im = a_re * b_im - a_im * b_re
    corr = (jnp.matmul(p_re, cos_t, precision=precision)
            - jnp.matmul(p_im, sin_t, precision=precision))
    return corr.reshape(*batch, nblk, tau_pad)


def frames_only(padded, nblk, hop, n_lags_out):
    batch = padded.shape[:-1]
    b = int(np.prod(batch))
    x = padded.reshape(b, padded.shape[-1]).astype(jnp.float32)
    tau_pad = -(-n_lags_out // 128) * 128
    span = hop - 1 + tau_pad
    f_need = -(-span // hop)
    total_needed = (nblk - 1 + f_need) * hop
    t = x.shape[-1]
    if t < total_needed:
        x = jnp.pad(x, ((0, 0), (0, total_needed - t)))
    frames = x[:, : (nblk - 1 + f_need) * hop].reshape(b, -1, hop)
    xb = jnp.concatenate(
        [frames[:, m : m + nblk, :] for m in range(f_need)], axis=-1
    )[..., :span]
    return xb + 1.0


def main():
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((8, 160000)).astype(np.float32))
    padded, n_hops = Y._pad_stream(x16, 1360, 170)
    nblk = n_hops + 1360 // 2 // 170 - 1

    HI = jax.lax.Precision.HIGHEST
    H = jax.lax.Precision.HIGH
    rows = [
        ("frames build only", lambda p: frames_only(p, nblk, 170, 402), (padded,)),
        ("bs pallas", lambda p: Y.yin_pallas_block(p, nblk), (padded,)),
        ("bs dft HIGHEST lane512", lambda p: Y._block_sums_dft(p, nblk, 170, 402), (padded,)),
        ("bs dft HIGHEST N-min", functools.partial(bs_dft_tuned, nblk=nblk, hop=170, n_lags_out=402, precision=HI), (padded,)),
        ("bs dft HIGH N-min", functools.partial(bs_dft_tuned, nblk=nblk, hop=170, n_lags_out=402, precision=H), (padded,)),
        ("bs dft DEFAULT N-min", functools.partial(bs_dft_tuned, nblk=nblk, hop=170, n_lags_out=402, precision=jax.lax.Precision.DEFAULT), (padded,)),
    ]
    x48 = jnp.asarray(rng.standard_normal((8, 480000)).astype(np.float32))
    for bo in (128, 256, 512, 1024):
        rows.append((f"decimate matmul block={bo}",
                     functools.partial(_decimate_fir, factor=3, num_taps=96, block_out=bo),
                     (x48,)))
    for name, fn, args in rows:
        try:
            print(f"{name:30s} {timeit(fn, *args):8.2f} ms")
        except Exception as e:
            print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    import janus_tpu.ops.yin_pallas as yp
    Y.yin_pallas_block = lambda p, nblk: yp.block_sums(p, nblk, 170, 402)
    main()
