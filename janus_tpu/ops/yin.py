"""YIN fundamental-frequency tracking (de Cheveigné & Kawahara 2002).

A faithful, fully-batched re-implementation of the YIN variant the
reference reaches through aubio (reference: backend/services/prosody.py:32-34
— ``aubio.pitch('yin', 4096, 512, sr)``, tolerance 0.8, Hz output):

- per call, the analyzed window is the last ``buf`` samples ending at the
  hop boundary (aubio's slide-block buffering), zero-padded at stream start;
- the difference function d(τ) over τ ∈ [0, buf/2) is cumulative-mean
  normalized (CMNDF);
- the period is the FIRST τ where CMNDF dips below tolerance at a local
  minimum (aubio scans τ>4 testing τ-3), else the global minimum;
- quadratic interpolation refines the period; unvoiced frames report 0 Hz.

Instead of aubio's O(W²) C loop per hop, d(τ) is computed for every hop at
once with an rFFT-based autocorrelation — the whole utterance becomes a
single batched FFT + elementwise pipeline that XLA fuses, and hops live on
the sublane axis so the VPU is fully occupied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "yin_frame",
    "yin_track",
    "mean_voiced_pitch",
    "classify_pitch",
    "PITCH_TAGS",
    "pitch_tag",
]

PITCH_TAGS = ("Deep", "Normal", "High")


def _fast_fft_len(n: int) -> int:
    """Smallest 5-smooth (2^a·3^b·5^c) length ≥ n — sizes XLA's mixed-radix
    FFT handles efficiently."""
    best = 1 << (n - 1).bit_length()
    p5 = 1
    while p5 < best:
        p3 = p5
        while p3 < best:
            p = p3
            while p < n:
                p *= 2
            best = min(best, p)
            p3 *= 3
        p5 *= 5
    return best


def _difference_function(x: jax.Array, n_lags: int,
                         n_lags_out: int | None = None) -> jax.Array:
    """d(τ) = Σ_{j<N} (x[j] - x[j+τ])², τ ∈ [0, n_lags_out), summing over
    N = n_lags terms, for x of length 2·n_lags.

    Uses d(τ) = Σ x[j]² + Σ x[j+τ]² − 2·Σ x[j]x[j+τ]; the cross term is an
    FFT correlation, the sliding energy a cumulative sum. ``n_lags_out`` <
    n_lags (bounded pitch search) shrinks the FFT: linear correlation for
    lags < L is exact whenever fft_len ≥ buf + L, so truncation loses
    nothing.
    """
    buf = x.shape[-1]
    if n_lags_out is None:
        n_lags_out = n_lags
    a = x[..., :n_lags]

    sq = x * x
    csum = jnp.cumsum(sq, axis=-1)
    # energy[tau] = sum_{j=tau}^{tau+n_lags-1} x[j]^2
    zero = jnp.zeros_like(csum[..., :1])
    csum0 = jnp.concatenate([zero, csum], axis=-1)
    tau = np.arange(n_lags_out)
    energy = csum0[..., tau + n_lags] - csum0[..., tau]
    e0 = energy[..., :1]

    fft_len = _fast_fft_len(buf + n_lags_out) if n_lags_out < n_lags else 2 * buf
    fa = jnp.fft.rfft(a, n=fft_len, axis=-1)
    fx = jnp.fft.rfft(x, n=fft_len, axis=-1)
    cross = jnp.fft.irfft(jnp.conj(fa) * fx, n=fft_len, axis=-1)[..., :n_lags_out]

    d = e0 + energy - 2.0 * cross
    return jnp.maximum(d, 0.0)


def _cmndf(d: jax.Array) -> jax.Array:
    """Cumulative-mean-normalized difference: y[0]=1,
    y[τ] = d[τ]·τ / Σ_{k=1..τ} d[k] (1 where the running sum is 0)."""
    tau = jnp.arange(d.shape[-1], dtype=d.dtype)
    running = jnp.cumsum(d, axis=-1) - d[..., :1]  # excludes τ=0
    y = jnp.where(running > 0.0, d * tau / jnp.maximum(running, 1e-30), 1.0)
    return y.at[..., 0].set(1.0)


def _quadratic_interp(y: jax.Array, pos: jax.Array) -> jax.Array:
    """aubio's fvec_quadratic_peak_pos: parabola through (pos-1, pos, pos+1);
    returns pos unchanged at the array edges."""
    n = y.shape[-1]
    p = jnp.clip(pos, 1, n - 2)
    s0 = jnp.take_along_axis(y, (p - 1)[..., None], axis=-1)[..., 0]
    s1 = jnp.take_along_axis(y, p[..., None], axis=-1)[..., 0]
    s2 = jnp.take_along_axis(y, (p + 1)[..., None], axis=-1)[..., 0]
    denom = s0 - 2.0 * s1 + s2
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (s0 - s2) / denom, 0.0)
    interp = p.astype(y.dtype) + delta
    at_edge = (pos <= 0) | (pos >= n - 1)
    return jnp.where(at_edge, pos.astype(y.dtype), interp)


def _search_bounds(buf: int, sample_rate: int,
                   fmin: float | None, fmax: float | None):
    """(p_lo, p_hi, n_lags_out, bounded) for a window length and F0 range."""
    n_lags = buf // 2
    p_lo = 2 if fmax is None else max(2, int(sample_rate / fmax))
    p_hi = n_lags - 4 if fmin is None else min(n_lags - 4, int(sample_rate / fmin))
    # bounded search: only y[0 .. p_hi+1] is ever inspected (the local-min
    # test reads y[p+1]); computing fewer lags shrinks the work (exactly)
    n_lags_out = n_lags if fmin is None else min(n_lags, p_hi + 2)
    return p_lo, p_hi, n_lags_out, fmin is not None or fmax is not None


def _select_pitch(y: jax.Array, sample_rate: int, tolerance: float,
                  p_lo: int, p_hi: int, bounded: bool) -> jax.Array:
    """CMNDF ``y[..., n_lags_out]`` → F0 in Hz (0 = unvoiced): first local
    minimum below tolerance, aubio-style (scanning τ>4 testing p=τ-3 →
    candidate p ∈ [p_lo, p_hi] with y[p] < y[p+1]), quadratic refinement."""
    n_lags_out = y.shape[-1]
    p_idx = jnp.arange(n_lags_out)
    in_range = (p_idx >= p_lo) & (p_idx <= p_hi)
    cand = in_range & (y < tolerance) & (y < jnp.roll(y, -1, axis=-1))
    if bounded:
        # aubio's one-sided test relies on scanning down a dip from the
        # left; a clipped range can start mid-rising-slope, so bounded
        # searches require a genuine (two-sided) local minimum
        cand = cand & (y <= jnp.roll(y, 1, axis=-1))
    has_cand = jnp.any(cand, axis=-1)
    first = jnp.argmax(cand, axis=-1)
    if not bounded:
        fallback = jnp.argmin(y, axis=-1)  # aubio parity: full-array min
    else:
        fallback = jnp.argmin(jnp.where(in_range, y, jnp.inf), axis=-1)
    pos = jnp.where(has_cand, first, fallback)

    period = _quadratic_interp(y, pos)
    pitch = jnp.where(period > 0.0, sample_rate / jnp.maximum(period, 1e-6), 0.0)
    if bounded:
        # bounded mode: a clipped fallback min is not a pitch estimate
        # (near-silent frames would otherwise report f=sr/p_lo as voiced)
        pitch = jnp.where(has_cand, pitch, 0.0)
    return pitch


def yin_frame(
    window: jax.Array, sample_rate: int, tolerance: float = 0.8,
    fmin: float | None = None, fmax: float | None = None,
) -> jax.Array:
    """F0 in Hz for window(s) ``[..., buf]``; 0.0 where unvoiced.

    ``fmin``/``fmax`` optionally bound the period search (None = the full
    aubio-parity lag range).
    """
    buf = window.shape[-1]
    n_lags = buf // 2
    p_lo, p_hi, n_lags_out, bounded = _search_bounds(
        buf, sample_rate, fmin, fmax)
    d = _difference_function(window.astype(jnp.float32), n_lags,
                             n_lags_out=n_lags_out)
    y = _cmndf(d)
    return _select_pitch(y, sample_rate, tolerance, p_lo, p_hi, bounded)


def _pad_stream(audio: jax.Array, buf: int, hop: int) -> tuple[jax.Array, int]:
    """aubio slide-block stream layout: ``buf - hop`` leading zeros, audio,
    trailing zeros to the last hop boundary. Window k is
    ``padded[k·hop : k·hop + buf]``. Returns (padded, n_hops)."""
    t = audio.shape[-1]
    n_hops = -(-t // hop)  # ceil — the reference zero-pads the last chunk
    total = buf - hop + n_hops * hop
    padded = jnp.zeros(audio.shape[:-1] + (total,), dtype=audio.dtype)
    padded = padded.at[..., buf - hop : buf - hop + t].set(audio)
    return padded, n_hops


def _block_sums_xla(padded: jax.Array, nblk: int, hop: int,
                    n_lags_out: int, tau_chunk: int = 128) -> jax.Array:
    """``bs[..., nblk, ≥n_lags_out]`` = Σ_{i<hop} x[b·hop+i]·x[b·hop+τ+i]
    via per-τ shifted slices of the signal (the general-platform path)."""
    batch = padded.shape[:-1]
    first = padded[..., : nblk * hop].reshape(*batch, nblk, hop)
    n_chunks = -(-n_lags_out // tau_chunk)

    def one_tau(tau):
        seg = jax.lax.dynamic_slice_in_dim(padded, tau, nblk * hop, axis=-1)
        seg = seg.reshape(*batch, nblk, hop)
        return jnp.sum(first * seg, axis=-1)  # [..., nblk]

    def one_chunk(c):
        taus = c * tau_chunk + jnp.arange(tau_chunk)
        return jax.vmap(one_tau, out_axes=-1)(taus)  # [..., nblk, tc]

    if n_chunks > 1:
        bs = jax.lax.map(one_chunk, jnp.arange(n_chunks))
        bs = jnp.moveaxis(bs, 0, -2)  # [..., nblk, n_chunks, tc]
        return bs.reshape(*batch, nblk, n_chunks * tau_chunk)
    return one_chunk(0)


@functools.lru_cache(maxsize=None)
def _dft_corr_mats(hop: int, tau_out: int, f_need: int, n: int):
    """Real DFT / inverse matrices for the matmul-DFT correlation route
    (float64-designed, f32-cast): the forward cosine/sine bank for one
    hop block, the block-shift twiddles ``e^{-2πi·m·hop·k/N}``, and the
    weighted inverse bank that lands directly on the lag axis."""
    k = n // 2 + 1
    w = 2.0 * np.pi / n
    kk = np.arange(k)[None, :]
    ia = np.arange(hop)[:, None]
    cos_f = np.cos(w * ia * kk).astype(np.float32)
    sin_f = np.sin(w * ia * kk).astype(np.float32)
    mm = np.arange(f_need)[:, None]
    tw_re = np.cos(w * mm * hop * kk).astype(np.float32)
    tw_im = -np.sin(w * mm * hop * kk).astype(np.float32)
    wk = np.full(k, 2.0)
    wk[0] = 1.0
    if n % 2 == 0:
        wk[-1] = 1.0
    kc = np.arange(k)[:, None]
    tau = np.arange(tau_out)[None, :]
    cos_t = (np.cos(w * kc * tau) * wk[:, None] / n).astype(np.float32)
    sin_t = (np.sin(w * kc * tau) * wk[:, None] / n).astype(np.float32)
    return cos_f, sin_f, tw_re, tw_im, cos_t, sin_t


def _block_sums_dft(padded: jax.Array, nblk: int, hop: int,
                    n_lags_out: int) -> jax.Array:
    """``bs[..., nblk, n_lags_out]`` via matmul-DFT linear correlation —
    the MXU route.

    Per block the lag sum ``bs[blk, τ] = Σ_{i<hop} x[blk·hop+i]·
    x[blk·hop+τ+i]`` is a linear cross-correlation of the block's leading
    ``hop`` samples against its ``f_need``-block span. With DFT length
    ``N = f_need·hop ≥ hop−1+tau_out`` the circular theorem is exact (no
    wrap), so: (1) every non-overlapping hop block gets ONE forward DFT —
    a dense ``[hop, K]`` matmul against a cosine/sine bank (the
    `ops/mel_pallas` matmul-DFT insight: XLA's TPU FFT op runs far below
    the MXU on these shapes, a dense DFT matmul does not); (2) each row's
    span spectrum is assembled from its ``f_need`` consecutive block
    spectra via shift-theorem twiddles — pure aligned elementwise FMAs, no
    overlapping-frame materialization (the framed build alone measured
    ~6 ms at flagship batch — more than the whole computation is worth);
    (3) the weighted inverse bank lands conj(A)·B directly on the lag
    axis. ~6 GFLOP at flagship batch; measured 13.8 ms (Pallas
    direct-sum) → ~1 ms on a v5e."""
    batch = padded.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    x = padded.reshape(b, padded.shape[-1]).astype(jnp.float32)

    tau_out = n_lags_out
    span = hop - 1 + tau_out
    f_need = -(-span // hop)
    n = f_need * hop
    n_blocks = nblk + f_need - 1
    total = n_blocks * hop
    t = x.shape[-1]
    if t < total:
        x = jnp.pad(x, ((0, 0), (0, total - t)))
    blocks = x[:, :total].reshape(b, n_blocks, hop)

    cos_f, sin_f, tw_re, tw_im, cos_t, sin_t = map(
        jnp.asarray, _dft_corr_mats(hop, tau_out, f_need, n))
    hi = jax.lax.Precision.HIGHEST
    g_re = jnp.matmul(blocks, cos_f, precision=hi)    # [b, n_blocks, K]
    g_im = -jnp.matmul(blocks, sin_f, precision=hi)

    # row blk's span = blocks blk..blk+f_need−1 ⇒ spectrum by shift
    # theorem: XB[k] = Σ_m e^{-2πi·m·hop·k/N} · G[blk+m, k]. The span's
    # tail samples beyond ``span`` are included whole — harmless, they
    # only touch lags ≥ tau_out (N ≥ f_need·hop keeps them unaliased).
    xb_re = jnp.zeros_like(g_re[:, :nblk])
    xb_im = jnp.zeros_like(xb_re)
    for m in range(f_need):
        gr, gi = g_re[:, m : m + nblk], g_im[:, m : m + nblk]
        twr, twi = tw_re[m][None, None], tw_im[m][None, None]
        xb_re = xb_re + (twr * gr - twi * gi)
        xb_im = xb_im + (twr * gi + twi * gr)
    a_re, a_im = g_re[:, :nblk], g_im[:, :nblk]   # A = block blk, zero-pad
    # P = conj(A)·B, then corr[τ] = (1/N)·Σ_k w_k·Re(P[k]·e^{+2πikτ/N})
    p_re = a_re * xb_re + a_im * xb_im
    p_im = a_re * xb_im - a_im * xb_re
    corr = (jnp.matmul(p_re, cos_t, precision=hi)
            - jnp.matmul(p_im, sin_t, precision=hi))
    return corr.reshape(*batch, nblk, tau_out)


def _track_difference_dft(padded: jax.Array, n_hops: int, r: int, hop: int,
                          n_lags_out: int) -> jax.Array:
    """d(τ) for every hop window via the fused matmul-DFT route.

    Both terms of ``d = e0 + energy − 2·cross`` are correlations over the
    same ``f_need``-block spans: ``cross`` correlates each block's samples
    against its span, ``energy`` correlates a ones-window against the
    squared span (``energy[k,τ] = Σ_{j<n_lags} x[k·hop+τ+j]²``). Both ride
    the same machinery — one forward DFT matmul per non-overlapping hop
    block (signal and its square), shift-theorem span assembly, and ONE
    stacked inverse matmul. This removes the signal-length prefix sum and
    the ``[n_hops, n_lags]`` energy gather of the generic path (~3.9 ms of
    the 4.3 ms d(τ) cost at flagship batch on a v5e — the gather, not the
    correlation, was the bottleneck)."""
    batch = padded.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    x = padded.reshape(b, padded.shape[-1]).astype(jnp.float32)

    nblk = n_hops + r - 1
    tau_out = n_lags_out
    span = hop - 1 + tau_out
    f_need = -(-span // hop)
    n = f_need * hop
    n_blocks = nblk + f_need - 1
    total = n_blocks * hop
    t = x.shape[-1]
    if t < total:
        x = jnp.pad(x, ((0, 0), (0, total - t)))
    blocks = x[:, :total].reshape(b, n_blocks, hop)

    cos_f, sin_f, tw_re, tw_im, cos_t, sin_t = map(
        jnp.asarray, _dft_corr_mats(hop, tau_out, f_need, n))
    hi = jax.lax.Precision.HIGHEST
    zblocks = blocks * blocks
    g_re = jnp.matmul(blocks, cos_f, precision=hi)    # [b, n_blocks, K]
    g_im = -jnp.matmul(blocks, sin_f, precision=hi)
    z_re = jnp.matmul(zblocks, cos_f, precision=hi)
    z_im = -jnp.matmul(zblocks, sin_f, precision=hi)

    def assemble(re, im):
        o_re = jnp.zeros_like(re[:, :nblk])
        o_im = jnp.zeros_like(o_re)
        for m in range(f_need):
            gr, gi = re[:, m : m + nblk], im[:, m : m + nblk]
            twr, twi = tw_re[m][None, None], tw_im[m][None, None]
            o_re = o_re + (twr * gr - twi * gi)
            o_im = o_im + (twr * gi + twi * gr)
        return o_re, o_im

    xb_re, xb_im = assemble(g_re, g_im)
    zb_re, zb_im = assemble(z_re, z_im)
    a_re, a_im = g_re[:, :nblk], g_im[:, :nblk]
    # ones-window spectrum: o[k] = Σ_{j<hop} e^{-2πijk/N}
    o_re = jnp.sum(cos_f, axis=0)[None, None]
    o_im = -jnp.sum(sin_f, axis=0)[None, None]

    # stacked products → ONE inverse matmul for cross and energy sums
    p_re = jnp.concatenate(
        [a_re * xb_re + a_im * xb_im, o_re * zb_re + o_im * zb_im], axis=1)
    p_im = jnp.concatenate(
        [a_re * xb_im - a_im * xb_re, o_re * zb_im - o_im * zb_re], axis=1)
    corr = (jnp.matmul(p_re, cos_t, precision=hi)
            - jnp.matmul(p_im, sin_t, precision=hi))
    bs, zbs = corr[:, :nblk], corr[:, nblk:]

    def window_sums(v):
        csum = jnp.cumsum(v, axis=-2)
        zero = jnp.zeros_like(csum[..., :1, :])
        c0 = jnp.concatenate([zero, csum], axis=-2)
        k_idx = np.arange(n_hops)
        return c0[..., k_idx + r, :] - c0[..., k_idx, :]

    cross = window_sums(bs)
    energy = window_sums(zbs)
    # Windows whose analysis half (the first n_lags samples) is exactly
    # silent have cross ≡ 0 in exact arithmetic; the DFT route's ~1e-6
    # relative noise would otherwise fabricate CMNDF dips there (spurious
    # voiced frames at stream-start padding). Exact a-part energies are a
    # cheap block reduction — snap those rows' cross to true zero.
    arow = jnp.sum(zblocks, axis=-1)                  # [b, n_blocks]
    acs = jnp.concatenate(
        [jnp.zeros_like(arow[:, :1]), jnp.cumsum(arow, axis=-1)], axis=-1)
    k_idx = np.arange(n_hops)
    ae = acs[:, k_idx + r] - acs[:, k_idx]            # [b, n_hops]
    cross = jnp.where(ae[..., None] > 0.0, cross, 0.0)
    e0 = energy[..., :1]
    d = jnp.maximum(e0 + energy - 2.0 * cross, 0.0)
    # Sub-noise-floor snap: the route's ~1e-6-relative roundoff (of the
    # span energy) must not masquerade as CMNDF structure where exact
    # arithmetic gives d ≈ 0 — near-silent analysis windows would report
    # random voiced pitches. Genuine periodicity dips in real signals sit
    # ≥1e-4 of the window energy (and a snapped true-zero dip stays a
    # selected candidate: y = 0 < tolerance), so a 1e-5 relative floor
    # only touches noise.
    emax = jnp.max(energy, axis=-1, keepdims=True)
    d = jnp.where(d > 1e-5 * (e0 + emax), d, 0.0)
    return d.reshape(*batch, n_hops, tau_out)


def _track_difference(audio: jax.Array, buf: int, hop: int,
                      n_lags_out: int, use_pallas: bool | None = None,
                      route: str | None = None) -> jax.Array:
    """d(τ), τ ∈ [0, n_lags_out), for EVERY hop window of a signal at once:
    ``[..., T] → [..., n_hops, n_lags_out]``. Requires ``hop | buf//2``.

    ``route`` selects the block-sum backend: ``"dft"`` (matmul-DFT on the
    MXU — the TPU default), ``"pallas"`` (VMEM-resident direct-sum kernel),
    ``"xla"`` (per-τ shifted slices — the general-platform default).
    ``use_pallas`` is the legacy boolean form of the same choice.

    The per-window correlation is computed signal-level: windows overlap by
    ``buf - hop`` samples, and each window's lag sum decomposes into
    ``buf//2 / hop`` hop-aligned block sums of the shifted product
    ``x[m]·x[m+τ]``, shared between neighboring windows. Everything is a
    direct f32 sum — exact linear correlation, no FFT (XLA's TPU FFT runs
    ~10× below the VPU's throughput on these shapes; this formulation
    replaced it after profiling showed YIN at 87% of semantic-encode time),
    and the windows themselves are never materialized. Window energies come
    from prefix-sum differences (local rounding only — prefix-sum drift
    cancels in differences).

    On TPU the block sums come from the fused Pallas kernel
    (:func:`janus_tpu.ops.yin_pallas.block_sums`) — the XLA per-τ path
    re-reads a shifted copy of the whole signal for every lag (~2 GB of
    effective traffic at flagship batch, ROOFLINE §2); the kernel keeps
    the signal tile VMEM-resident and accumulates all lags in one pass."""
    n_lags = buf // 2
    assert n_lags % hop == 0, "fast track path requires hop | buf//2"
    r = n_lags // hop
    padded, n_hops = _pad_stream(audio.astype(jnp.float32), buf, hop)
    batch = padded.shape[:-1]

    nblk = n_hops + r - 1
    if route is None:
        if use_pallas is not None:
            route = "pallas" if use_pallas else "xla"
        else:
            route = ("dft" if jax.devices()[0].platform == "tpu"
                     else "xla")
    if route == "dft":
        return _track_difference_dft(padded, n_hops, r, hop, n_lags_out)
    if route == "pallas":
        from janus_tpu.ops.yin_pallas import block_sums

        bs = block_sums(padded, nblk, hop, n_lags_out,
                        interpret=jax.devices()[0].platform != "tpu")
    else:
        bs = _block_sums_xla(padded, nblk, hop, n_lags_out)
    # cross_k[τ] = Σ_{b=k}^{k+r-1} bs[b, τ], via block-prefix differences
    csum_b = jnp.cumsum(bs, axis=-2)
    zero = jnp.zeros_like(csum_b[..., :1, :])
    c0 = jnp.concatenate([zero, csum_b], axis=-2)
    k_idx = np.arange(n_hops)
    cross = (c0[..., k_idx + r, :] - c0[..., k_idx, :])[..., :n_lags_out]

    # energy_k[τ] = Σ_{j=τ}^{τ+n_lags-1} w_k[j]² from squared prefix sums
    sq = padded * padded
    s0 = jnp.concatenate(
        [jnp.zeros((*batch, 1), sq.dtype), jnp.cumsum(sq, axis=-1)], axis=-1)
    tau = np.arange(n_lags_out)[None, :]
    base = (hop * k_idx)[:, None] + tau
    energy = s0[..., base + n_lags] - s0[..., base]
    e0 = energy[..., :1]

    return jnp.maximum(e0 + energy - 2.0 * cross, 0.0)


def _hop_windows(audio: jax.Array, buf: int, hop: int) -> jax.Array:
    """Reproduce aubio's streaming slide-block windows for a whole signal:
    window k is the ``buf`` samples ending at hop boundary (k+1)·hop, with
    zeros before stream start."""
    padded, n_hops = _pad_stream(audio, buf, hop)
    idx = hop * np.arange(n_hops)[:, None] + np.arange(buf)[None, :]
    return padded[..., idx]


def yin_track(
    audio: jax.Array,
    sample_rate: int,
    buf: int = 4096,
    hop: int = 512,
    tolerance: float = 0.8,
    fmin: float | None = None,
    fmax: float | None = None,
) -> jax.Array:
    """Per-hop F0 track ``[..., n_hops]`` in Hz (0 = unvoiced) for ``[..., T]``
    audio, matching the reference's streaming loop
    (reference: backend/services/prosody.py:76-88). ``fmin``/``fmax``
    optionally bound the search (None = aubio-parity full range).

    When ``hop`` divides ``buf//2`` (the aubio-default 4096/512 geometry
    does), d(τ) comes from the signal-level block-sum path
    (:func:`_track_difference`) — exact direct-sum correlation, ~20× faster
    on TPU than the per-window FFT, which remains the general-geometry
    fallback."""
    buf = int(buf)
    hop = int(hop)
    if (buf // 2) % hop == 0:
        p_lo, p_hi, n_lags_out, bounded = _search_bounds(
            buf, sample_rate, fmin, fmax)
        d = _track_difference(audio, buf, hop, n_lags_out)
        y = _cmndf(d)
        return _select_pitch(y, sample_rate, tolerance, p_lo, p_hi, bounded)
    windows = _hop_windows(audio.astype(jnp.float32), buf, hop)
    return yin_frame(windows, sample_rate, tolerance, fmin=fmin, fmax=fmax)


def mean_voiced_pitch(track: jax.Array, n_valid: jax.Array | None = None) -> jax.Array:
    """Mean of strictly-positive F0 values; 0.0 when fully unvoiced
    (reference: backend/services/prosody.py:89-99 filters zeros before
    averaging). ``n_valid`` masks padded hops in a batch."""
    voiced = track > 0.0
    if n_valid is not None:
        idx = jnp.arange(track.shape[-1])
        voiced = voiced & (idx < n_valid[..., None])
    count = jnp.sum(voiced, axis=-1)
    total = jnp.sum(jnp.where(voiced, track, 0.0), axis=-1)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def classify_pitch(
    mean_f0: jax.Array, deep: float = 120.0, high: float = 200.0
) -> jax.Array:
    """0=Deep (<deep), 1=Normal, 2=High (>=high); unvoiced (0 Hz) → Normal
    (reference: backend/services/prosody.py:91-99)."""
    code = jnp.where(mean_f0 < deep, 0, jnp.where(mean_f0 < high, 1, 2))
    return jnp.where(mean_f0 <= 0.0, 1, code).astype(jnp.int32)


def pitch_tag(code: int) -> str:
    return PITCH_TAGS[int(code)]
