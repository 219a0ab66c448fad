"""int8 cross-attention KV cache: quantization + exact-fold attention.

Profiling shows whisper's decode loop is bound by CROSS-attention K/V
traffic: every step re-reads (layers × 2 × heads × 1500 × hd) from HBM —
~4 GB/step at batch 8 bf16, dwarfing the weights. Because cross K/V are
computed ONCE per window and then read 224×, quantizing them to int8 halves
the dominant traffic AND the cache footprint (→ 2× window batch capacity).

The dequantization folds exactly into the attention algebra with
per-(head, position) scales — no dequantized K/V are ever materialized:

    scores_t = (q · k8_t) * sk_t          (scale folds into the score)
    w        = softmax(scores + mask)
    out      = Σ_t (w_t · sv_t) · v8_t    (scale folds into the weight)

So attention over int8 KV is EXACT attention over the dequantized values —
the only error is the int8 rounding of K/V themselves (absmax/127 per
position). Enabled via ``WhisperConfig.kv_bits=8`` for the cross cache.
This IS the default serving/bench configuration (bench.py, __graft_entry__
entry()); golden-token/parity tests run with ``kv_bits=0`` fp caches. The
offline token-divergence study bounding the int8 effect is in
docs/kv_quant_study.md (scripts/study_kv_divergence.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# fused Pallas beam-flat attention (ops/beamflat_attention.py) — opt-in
# (WTPU_BEAM_ATTN_KERNEL=1): measured NEUTRAL on hardware (98.1 vs 98.9
# RTF for the XLA chain, r5 ladder) — XLA already overlaps the score
# chain the kernel was built to fuse (docs/performance.md r5 table)
_BEAM_ATTN_KERNEL = os.environ.get("WTPU_BEAM_ATTN_KERNEL", "0") == "1"


def quantize_kv(x: jnp.ndarray, bits: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(b, h, t, d) float → int values + per-(b,h,t) BF16 scales.

    bits=8 → int8 (absmax/127); bits=4 → NATIVE ``jnp.int4`` (absmax/7,
    XLA packs two nibbles per byte in HBM — halves the dominant decode
    stream again; divergence bounds in docs/kv_quant_study.md).

    Scales are stored bf16, not f32: per-position scales are 1/hd = 1/64
    of the element count, so f32 scales add 6.25% to the int8 stream and
    12.5% to the packed-int4 stream — pure HBM overhead on the decode
    loop's dominant traffic. Quantization uses the bf16-ROUNDED scale
    (nudged one ulp up so ``round(x/scale)`` never exceeds qmax), so the
    scale-folded attention remains EXACT attention over the dequantized
    grid; only the grid itself shifts by ≤2⁻⁸ relative (vs a rounding
    step of 2/254 int8 / 2/14 int4 — negligible, and bounded by the same
    offline study)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # (b, h, t, 1)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(absmax / qmax, 1e-8) * (1.0 + 2.0 ** -8)
    scale = scale.astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(x32 / scale.astype(jnp.float32)), -qmax, qmax)
    return q.astype(jnp.int8 if bits == 8 else jnp.int4), scale


def _quantize_rows(x32: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last axis) symmetric int8: (codes, f32 scale w/ keepdims).

    The MXU-attention quantizer (absmax/127, dynamic — same recipe as
    ops/quant_a8.py activations). f32 scales: these are per decode ROW
    (tq rows, not per cached position), so the bf16-scale HBM argument of
    quantize_kv doesn't apply."""
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)
    return codes, scale


def _as_s8(codes: jnp.ndarray) -> jnp.ndarray:
    """int4 codes → int8 for the integer dot (one fused convert; int8
    codes pass through untouched)."""
    return codes if codes.dtype == jnp.int8 else codes.astype(jnp.int8)


def attention_int8_mxu(
    q: jnp.ndarray,        # (b, h, tq, d) — pre-scaled queries
    k8t: jnp.ndarray,      # (b, h, d, tk) int8/int4 — keys cached TRANSPOSED
    k_scale: jnp.ndarray,  # (b, h, tk, 1)
    v8t: jnp.ndarray,      # (b, h, d, tk) int8/int4
    v_scale: jnp.ndarray,  # (b, h, tk, 1)
    pos: jnp.ndarray | int = 0,
    causal: bool = False,
    valid_len: int | None = None,
) -> jnp.ndarray:
    """Attention over quantized KV with INTEGER MXU dots (W8A8-style).

    The XLA einsum path (attention_int8_auto) converts every K/V code to
    f32 on the VPU before the dot — measured convert-bound, not DMA-bound
    (docs/performance.md: int4 cross streams 350 GB/s packed vs 735 dense;
    same phenomenon ops/quant_a8.py eliminated for the LLM matmuls, 52.2 →
    84.9 tok/s). Here both dots run s8×s8 → s32 on the MXU with ZERO
    per-code VPU work: q is re-quantized per row (absmax/127 over d), and
    the value-side weights (softmax × per-position v_scale) are quantized
    per row over tk — the only VPU work is O(tq·tk) on the small score
    matrix, not O(d·tk) on the codes.

    Numerics: exact scale-folded attention over the dequantized K/V grid
    PLUS two dynamic int8 roundings (q, w·vs) — bounded offline by
    scripts/study_kv_divergence.py --attn-mxu (docs/kv_quant_study.md).
    Opt-in: WhisperConfig.attn_mxu / WTPU_ATTN_MXU=1.
    """
    tq, tk = q.shape[2], k8t.shape[3]
    k_idx = jnp.arange(tk)[None, :]
    if causal:
        q_idx = jnp.arange(tq)[:, None] + pos
        mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)
    else:
        valid = k_idx < (tk if valid_len is None else valid_len)
        mask = jnp.where(jnp.broadcast_to(valid, (tq, tk)), 0.0, -jnp.inf)
    q8, qs = _quantize_rows(q.astype(jnp.float32))
    s32 = jnp.einsum("bhqd,bhdk->bhqk", q8, _as_s8(k8t),
                     preferred_element_type=jnp.int32)
    scores = (s32.astype(jnp.float32) * qs
              * k_scale[..., 0].astype(jnp.float32)[:, :, None, :] + mask)
    w = jax.nn.softmax(scores, axis=-1)
    wv = w * v_scale[..., 0].astype(jnp.float32)[:, :, None, :]
    w8, ws = _quantize_rows(wv)
    o32 = jnp.einsum("bhqk,bhdk->bhqd", w8, _as_s8(v8t),
                     preferred_element_type=jnp.int32)
    return (o32.astype(jnp.float32) * ws).astype(q.dtype)


def attention_int8_grouped_mxu(
    q: jnp.ndarray,        # (n, g, h, tq, d) — g beams share one window
    k8t: jnp.ndarray,      # (n, h, d, tk) int8/int4 — shared cache
    k_scale: jnp.ndarray,  # (n, h, tk, 1)
    v8t: jnp.ndarray,      # (n, h, d, tk)
    v_scale: jnp.ndarray,  # (n, h, tk, 1)
    valid_len: int | None = None,
) -> jnp.ndarray:
    """Grouped (beam/best_of cross) twin of :func:`attention_int8_mxu` —
    integer dots broadcast the shared cache over the g hypothesis rows."""
    tk = k8t.shape[3]
    if valid_len is not None and valid_len < tk:
        mask = jnp.where(jnp.arange(tk)[None, :] < valid_len, 0.0, -jnp.inf)
    else:
        mask = 0.0
    q8, qs = _quantize_rows(q.astype(jnp.float32))
    s32 = jnp.einsum("nghqd,nhdk->nghqk", q8, _as_s8(k8t),
                     preferred_element_type=jnp.int32)
    scores = (s32.astype(jnp.float32) * qs
              * k_scale[..., 0].astype(jnp.float32)[:, None, :, None, :]
              + mask)
    w = jax.nn.softmax(scores, axis=-1)
    wv = w * v_scale[..., 0].astype(jnp.float32)[:, None, :, None, :]
    w8, ws = _quantize_rows(wv)
    o32 = jnp.einsum("nghqk,nhdk->nghqd", w8, _as_s8(v8t),
                     preferred_element_type=jnp.int32)
    return (o32.astype(jnp.float32) * ws).astype(q.dtype)


def attention_int8_auto(
    q: jnp.ndarray,        # (b, h, tq, d)
    k8t: jnp.ndarray,      # (b, h, d, tk) int8 — keys cached TRANSPOSED
    k_scale: jnp.ndarray,  # (b, h, tk, 1)
    v8t: jnp.ndarray,      # (b, h, d, tk) int8 — values cached TRANSPOSED
    v_scale: jnp.ndarray,  # (b, h, tk, 1)
    pos: jnp.ndarray | int = 0,
    causal: bool = False,
    valid_len: int | None = None,
    kernel: bool = False,
) -> jnp.ndarray:
    """Decode attention over int8 KV: fused Pallas kernel on TPU, XLA
    einsum fallback elsewhere (tests run the CPU mesh; kernel parity is
    covered by interpret-mode tests in tests/test_pallas_kernels.py).

    K AND V arrive transposed (time-minor) — the layout the Pallas kernel
    streams at full lane width (ops/decode_attention.py). causal=True masks
    keys after ``pos + q_index`` (self-attention over a preallocated
    cache); causal=False attends keys [0, valid_len) (cross-attention over
    a 128-padded cache).

    The Pallas kernel is opt-in (``kernel=True``, threaded from
    ``WhisperConfig.decode_attn_kernel`` — one static decision shared with
    the cache T-padding in models/whisper.py): in isolation it matches the
    XLA einsum (~300 GB/s effective on v5e), but end-to-end it measured 9%
    SLOWER — inside the jitted step XLA overlaps the attention einsum with
    prefetching the next layer's weights, which an opaque pallas_call
    blocks (bench_history.jsonl r2; scripts/bench_decode_attention.py).
    """
    if kernel and jax.default_backend() == "tpu":
        from whisper_mlx_tpu.ops.decode_attention import decode_attention_int8

        return decode_attention_int8(q, k8t, k_scale, v8t, v_scale,
                                     pos=pos, causal=causal,
                                     valid_len=valid_len)
    tq, tk = q.shape[2], k8t.shape[3]
    k_idx = jnp.arange(tk)[None, :]
    if causal:
        q_idx = jnp.arange(tq)[:, None] + pos
        mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)
    else:
        valid = k_idx < (tk if valid_len is None else valid_len)
        mask = jnp.where(jnp.broadcast_to(valid, (tq, tk)), 0.0, -jnp.inf)
    # formulation matters: this 2-batch-dim einsum over the time-minor
    # cache is the measured-best lowering (212 RTF e2e). Flattening (b, h)
    # into one batch dim measured 2.7× SLOWER (77.6 RTF — the reshape of
    # the dynamically-updated cache materializes a copy per step), and
    # bf16 operands were neutral (212.0) — bench_history.jsonl r2.
    scores = jnp.einsum(
        "bhqd,bhdk->bhqk", q.astype(jnp.float32), k8t.astype(jnp.float32)
    )
    scores = scores * k_scale[..., 0][:, :, None, :] + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = w * v_scale[..., 0][:, :, None, :]
    out = jnp.einsum("bhqk,bhdk->bhqd", w, v8t.astype(jnp.float32))
    return out.astype(q.dtype)


def attention_int8_tmajor(
    q: jnp.ndarray,     # (b, h, tq, d) — pre-scaled queries
    kT: jnp.ndarray,    # (T, b, h*d) int8 — TIME-MAJOR cache
    ksT: jnp.ndarray,   # (T, b, h) bf16 key scales
    vT: jnp.ndarray,    # (T, b, h*d) int8
    vsT: jnp.ndarray,   # (T, b, h) bf16 value scales
    pos: jnp.ndarray | int,
) -> jnp.ndarray:
    """Causal self-attention over a TIME-MAJOR quantized cache.

    The default time-minor cache (b, h, d, T) pays twice at decode shapes:
    the per-step column write is a read-modify-write of every (32, 128)
    int8 tile spanning the (b·h·d) sublanes (~9.2 MB/step/array at B=56),
    and the T=256 batched matvec leaves XLA with 16 KB-per-(b,h) tiles
    (~200 GB/s measured vs 531 for the same einsum at T=1500). Time-major
    storage makes the step write ONE contiguous (1, b, h·d) plane (~80 KB
    of whole tiles) and the read a single elementwise broadcast-multiply
    + reduce over the cache in its own layout order — no batched matvec.
    Math identical to :func:`attention_int8_auto` (scale-folded exact
    attention over the dequantized grid); fp32 products, fp32 accumulate.

    tq == 1 is the hot decode step; tq > 1 (prefill, once per window)
    takes an einsum of the same algebra.
    """
    b, h, tq, d = q.shape
    T = kT.shape[0]
    kv = kT.reshape(T, b, h, d)
    vv = vT.reshape(T, b, h, d)
    if tq == 1:
        p = q[None, :, :, 0, :].astype(jnp.float32) * kv.astype(jnp.float32)
        s = jnp.sum(p, axis=-1)  # (T, b, h)
        s = s * ksT.astype(jnp.float32)
        t_idx = jnp.arange(T)[:, None, None]
        s = jnp.where(t_idx <= pos, s, -jnp.inf)
        w = jax.nn.softmax(s, axis=0)
        wv = w * vsT.astype(jnp.float32)
        o = jnp.sum(wv[..., None] * vv.astype(jnp.float32), axis=0)  # (b, h, d)
        return o[:, :, None, :].astype(q.dtype)
    s = jnp.einsum("bhid,tbhd->tbhi", q.astype(jnp.float32),
                   kv.astype(jnp.float32))
    s = s * ksT.astype(jnp.float32)[..., None]
    t_idx = jnp.arange(T)[:, None, None, None]
    q_idx = pos + jnp.arange(tq)[None, None, None, :]
    s = jnp.where(t_idx <= q_idx, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=0)
    wv = w * vsT.astype(jnp.float32)[..., None]
    o = jnp.einsum("tbhi,tbhd->bhid", wv, vv.astype(jnp.float32))
    return o.astype(q.dtype)


def attention_int8_tmajor_cross(
    q: jnp.ndarray,     # (b, h, tq, d) — pre-scaled queries
    kT: jnp.ndarray,    # (T, b, h*d) int8/int4 — TIME-MAJOR cross cache
    ksT: jnp.ndarray,   # (T, b, h) bf16
    vT: jnp.ndarray,    # (T, b, h*d)
    vsT: jnp.ndarray,   # (T, b, h)
) -> jnp.ndarray:
    """Non-causal (cross) twin of :func:`attention_int8_tmajor`.

    All T positions are valid (the time-major cross cache is built
    unpadded at n_audio_ctx — models/whisper.py cross_kv)."""
    b, h, tq, d = q.shape
    T = kT.shape[0]
    kv = kT.reshape(T, b, h, d)
    vv = vT.reshape(T, b, h, d)
    if tq == 1:
        p = q[None, :, :, 0, :].astype(jnp.float32) * kv.astype(jnp.float32)
        s = jnp.sum(p, axis=-1) * ksT.astype(jnp.float32)  # (T, b, h)
        w = jax.nn.softmax(s, axis=0) * vsT.astype(jnp.float32)
        o = jnp.sum(w[..., None] * vv.astype(jnp.float32), axis=0)
        return o[:, :, None, :].astype(q.dtype)
    s = jnp.einsum("bhid,tbhd->tbhi", q.astype(jnp.float32),
                   kv.astype(jnp.float32))
    s = s * ksT.astype(jnp.float32)[..., None]
    w = jax.nn.softmax(s, axis=0) * vsT.astype(jnp.float32)[..., None]
    o = jnp.einsum("tbhi,tbhd->bhid", w, vv.astype(jnp.float32))
    return o.astype(q.dtype)


def attention_int8_tmajor_grouped(
    q5: jnp.ndarray,    # (n, g, h, tq, d) — pre-scaled; g rows share one window
    kT: jnp.ndarray,    # (T, n, h*d) int8/int4 — SHARED time-major cache
    ksT: jnp.ndarray,   # (T, n, h)
    vT: jnp.ndarray,    # (T, n, h*d)
    vsT: jnp.ndarray,   # (T, n, h)
) -> jnp.ndarray:
    """Grouped (beam/best_of) twin of :func:`attention_int8_tmajor_cross`:
    the shared cache is read once and broadcast over the g hypothesis rows
    inside the fused elementwise stream."""
    n, g, h, tq, d = q5.shape
    T = kT.shape[0]
    kv = kT.reshape(T, n, h, d)
    vv = vT.reshape(T, n, h, d)
    if tq == 1:
        p = (q5[None, :, :, :, 0, :].astype(jnp.float32)
             * kv[:, :, None].astype(jnp.float32))  # (T, n, g, h, d)
        s = jnp.sum(p, axis=-1) * ksT.astype(jnp.float32)[:, :, None]
        w = jax.nn.softmax(s, axis=0) * vsT.astype(jnp.float32)[:, :, None]
        o = jnp.sum(w[..., None] * vv[:, :, None].astype(jnp.float32), axis=0)
        return o[:, :, :, None, :].astype(q5.dtype)
    s = jnp.einsum("nghid,tnhd->tnghi", q5.astype(jnp.float32),
                   kv.astype(jnp.float32))
    s = s * ksT.astype(jnp.float32)[:, :, None, :, None]
    w = jax.nn.softmax(s, axis=0) * vsT.astype(jnp.float32)[:, :, None, :, None]
    o = jnp.einsum("tnghi,tnhd->nghid", w, vv.astype(jnp.float32))
    return o.astype(q5.dtype)


def attention_int8_grouped(
    q: jnp.ndarray,        # (n, g, h, tq, d) — g beams/candidates per window
    k8t: jnp.ndarray,      # (n, h, d, tk) int8 — SHARED across the g axis
    k_scale: jnp.ndarray,  # (n, h, tk, 1)
    v8t: jnp.ndarray,      # (n, h, d, tk) int8 — shared
    v_scale: jnp.ndarray,  # (n, h, tk, 1)
    valid_len: int | None = None,
) -> jnp.ndarray:
    """Cross-attention where g decode rows share one window's K/V.

    Beam search / best_of decode N windows × g hypotheses, but cross K/V
    depend only on the audio — replicating them per hypothesis multiplies
    the decode loop's DOMINANT HBM stream by g (beam.py used to
    ``jnp.repeat`` the encoder states). The grouped einsum broadcasts the
    shared cache over g without materializing it.
    """
    tk = k8t.shape[3]
    if valid_len is not None and valid_len < tk:
        k_idx = jnp.arange(tk)[None, :]
        mask = jnp.where(k_idx < valid_len, 0.0, -jnp.inf)
    else:
        mask = 0.0
    scores = jnp.einsum(
        "nghqd,nhdk->nghqk", q.astype(jnp.float32), k8t.astype(jnp.float32)
    )
    scores = scores * k_scale[..., 0][:, None, :, None, :] + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = w * v_scale[..., 0][:, None, :, None, :]
    out = jnp.einsum("nghqk,nhdk->nghqd", w, v8t.astype(jnp.float32))
    return out.astype(q.dtype)


def attention_int8_ancestry(
    q: jnp.ndarray,        # (N*B, h, 1, d) — current-step queries, pre-scaled
    k8t: jnp.ndarray,      # (N*B, h, d, T) int8/int4 — per-LANE cache, never gathered
    k_scale: jnp.ndarray,  # (N*B, h, T, 1)
    v8t: jnp.ndarray,      # (N*B, h, d, T)
    v_scale: jnp.ndarray,  # (N*B, h, T, 1)
    ancestry: jnp.ndarray,  # (N*B, T) int32 in [0, B): lane owning each position
    pos: jnp.ndarray,      # scalar: current write position (causal horizon)
    groups: int,           # B — beam lanes per window
) -> jnp.ndarray:
    """Beam self-attention with INDIRECTION instead of cache reordering.

    Classic vectorized beam search gathers the whole self-KV cache by the
    parent indices every step (read+rewrite of every byte — and XLA lowers
    that gather well below copy bandwidth). Here lanes always write their
    own row and an ``ancestry`` matrix maps (lane, position) → the lane
    whose row holds that hypothesis's K/V. Scores are computed against ALL
    ``B`` lanes per window — same HBM bytes (each row is read once, used
    by every query as an M=B matmul) — and the ancestry one-hot selects the
    correct lane per position. Math is EXACTLY the gathered attention.
    """
    NB, h, tq, d = q.shape
    T = k8t.shape[3]
    g = groups
    n = NB // g
    q4 = q.reshape(n, g, h, d)  # tq == 1, squeezed
    k5 = k8t.reshape(n, g, h, d, T)
    v5 = v8t.reshape(n, g, h, d, T)
    ks5 = k_scale[..., 0].reshape(n, g, h, T)
    vs5 = v_scale[..., 0].reshape(n, g, h, T)
    anc = ancestry.reshape(n, g, T)

    # Layout rule (measured, scripts/profile_beam.py): every intermediate
    # keeps T minor and h second-minor — the earlier "nbhqtk" form put the
    # beam axis (size g≈5) minor, which Mosaic lane-pads to 128 (≈25×
    # memory) and cost 3.5 s/batch. Scores vs every lane k: (n, k, b, h, t).
    s_all = jnp.einsum("nbhd,nkhdt->nkbht", q4.astype(jnp.float32),
                       k5.astype(jnp.float32))
    s_all = s_all * ks5[:, :, None, :, :]  # (n, k, 1, h, t)
    sel = (anc[:, None, :, None, :]
           == jnp.arange(g, dtype=anc.dtype)[None, :, None, None, None])
    s = jnp.sum(jnp.where(sel, s_all, 0.0), axis=1)  # exactly one lane matches
    valid = jnp.arange(T)[None, None, None, :] <= pos
    s = jnp.where(valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)  # (n, b, h, t)
    wv = w[:, None] * vs5[:, :, None, :, :]  # (n, k, b, h, t)
    wv = jnp.where(sel, wv, 0.0)
    out = jnp.einsum("nkbht,nkhdt->nbhd", wv, v5.astype(jnp.float32))
    return out.reshape(NB, h, tq, d).astype(q.dtype)


def _beamflat_mask(anc: jnp.ndarray, n: int, g: int, J: int,
                   pos: jnp.ndarray) -> jnp.ndarray:
    """(n, g, J) bool: column j = t*g + k is attendable by lane b iff
    lane k owns position t in b's ancestry and t is within the horizon."""
    T = J // g
    anc3 = anc.reshape(n, g, T)
    j = jnp.arange(J)
    t_idx = j // g
    k_idx = (j % g).astype(anc.dtype)
    own = jnp.take(anc3, t_idx, axis=2) == k_idx[None, None, :]
    valid = (t_idx <= pos)[None, None, :]
    return own & valid


def attention_int8_beamflat(
    q: jnp.ndarray,       # (N*B, h, 1, d) — pre-scaled queries
    k8f: jnp.ndarray,     # (n, h, d, T*g) int8/int4 — lane-INTERLEAVED flat
    ks_f: jnp.ndarray,    # (n, h, T*g, 1)
    v8f: jnp.ndarray,     # (n, h, d, T*g)
    vs_f: jnp.ndarray,    # (n, h, T*g, 1)
    ancestry: jnp.ndarray,  # (N*B, T) int32 in [0, g)
    pos: jnp.ndarray,     # scalar: current write position (causal horizon)
    groups: int,          # g — beam lanes per window
    mxu: bool = False,    # integer-MXU dots (see attention_int8_mxu)
) -> jnp.ndarray:
    """Beam self-attention over a lane-interleaved FLAT cache.

    The window's g lanes live inside the time axis: column ``t*g + k``
    holds lane k's K/V for position t, so the per-step write is ONE
    contiguous g-column dynamic_update_slice and this attention is ONE
    plain-shaped einsum over T*g keys per window — the exact lowering the
    greedy path uses (682 GB/s measured). The 5-D grouped form this
    replaces de-aliased the scan-carried cache (whole-cache VMEM staging +
    copy-back per step, conv-emitter score dot: 3.56 s/batch extra at
    beam5/B=12 — scripts/profile_beam.py, scripts/profile_anc_micro.py).

    Ancestry selection is a flat additive mask: softmax over masked
    columns is EXACTLY the gathered attention (non-selected columns
    contribute zero; each (lane, t<=pos) selects exactly one column).

    On TPU with int8 codes the fused Pallas kernel
    (ops/beamflat_attention.py) computes the whole score/softmax chain in
    VMEM per (window, head) cell — the XLA lowering materializes the
    (n, g→8, h, J) f32 chain in HBM every step (~17 ms/step of the beam
    loop's 33 at beam5/N=24, r4 profile) — but measured NEUTRAL e2e (98.1
    vs 98.9 RTF, r5 ladder): XLA already overlaps the chain. Opt-in:
    WTPU_BEAM_ATTN_KERNEL=1.
    """
    NB, h, tq, d = q.shape
    g = groups
    n = NB // g
    J = k8f.shape[3]
    if mxu and tq == 1:
        # integer-MXU dots (see attention_int8_mxu): zero per-code VPU work
        q8, qs = _quantize_rows(q.astype(jnp.float32))  # (NB, h, 1, d)
        q8 = q8[:, :, 0].reshape(n, g, h, d)
        qs = qs[:, :, 0].reshape(n, g, h, 1)
        s32 = jnp.einsum("nbhd,nhdj->nbhj", q8, _as_s8(k8f),
                         preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * qs
             * ks_f[..., 0].astype(jnp.float32)[:, None, :, :])
        m = _beamflat_mask(ancestry, n, g, J, pos)
        s = jnp.where(m[:, :, None, :], s, -jnp.inf)
        w = jax.nn.softmax(s, axis=-1)
        wv = w * vs_f[..., 0].astype(jnp.float32)[:, None, :, :]
        w8, ws = _quantize_rows(wv)
        o32 = jnp.einsum("nbhj,nhdj->nbhd", w8, _as_s8(v8f),
                         preferred_element_type=jnp.int32)
        out = o32.astype(jnp.float32) * ws
        return out.reshape(NB, h, tq, d).astype(q.dtype)
    if (_BEAM_ATTN_KERNEL and tq == 1 and k8f.dtype == jnp.int8
            and jax.default_backend() == "tpu"):
        from whisper_mlx_tpu.ops.beamflat_attention import (
            beamflat_attention_kernel,
        )

        m = _beamflat_mask(ancestry, n, g, J, pos)
        return beamflat_attention_kernel(q, k8f, ks_f, v8f, vs_f, m,
                                         groups=g)
    q4 = q.reshape(n, g, h, d)
    s = jnp.einsum("nbhd,nhdj->nbhj", q4.astype(jnp.float32),
                   k8f.astype(jnp.float32))
    s = s * ks_f[..., 0][:, None, :, :]
    m = _beamflat_mask(ancestry, n, g, J, pos)
    s = jnp.where(m[:, :, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    w = w * vs_f[..., 0][:, None, :, :]
    out = jnp.einsum("nbhj,nhdj->nbhd", w, v8f.astype(jnp.float32))
    return out.reshape(NB, h, tq, d).astype(q.dtype)


def attention_fp_beamflat(
    q: jnp.ndarray,    # (N*B, h, 1, d) — RAW (scaled inside)
    kf: jnp.ndarray,   # (n, h, T*g, d) — lane-interleaved flat raw keys
    vf: jnp.ndarray,   # (n, h, T*g, d)
    ancestry: jnp.ndarray,  # (N*B, T) int32
    pos: jnp.ndarray,
    groups: int,
) -> jnp.ndarray:
    """fp-cache twin of :func:`attention_int8_beamflat` (parity/test mode).

    q/k each scaled by ``d**-0.25``, matching models.whisper.attention."""
    NB, h, tq, d = q.shape
    g = groups
    n = NB // g
    J = kf.shape[2]
    scale = d ** -0.25
    q4 = (q * scale).reshape(n, g, h, d)
    s = jnp.einsum("nbhd,nhjd->nbhj", q4.astype(jnp.float32),
                   (kf * scale).astype(jnp.float32))
    m = _beamflat_mask(ancestry, n, g, J, pos)
    s = jnp.where(m[:, :, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("nbhj,nhjd->nbhd", w, vf.astype(jnp.float32))
    return out.reshape(NB, h, tq, d).astype(q.dtype)


def attention_fp_ancestry(
    q: jnp.ndarray,    # (N*B, h, 1, d) — RAW (scaled inside, like attention())
    k: jnp.ndarray,    # (N*B, h, T, d) — raw cached keys
    v: jnp.ndarray,    # (N*B, h, T, d)
    ancestry: jnp.ndarray,  # (N*B, T) int32
    pos: jnp.ndarray,
    groups: int,
) -> jnp.ndarray:
    """fp-cache twin of :func:`attention_int8_ancestry` (parity/test mode).

    q/k each scaled by ``d**-0.25`` here, matching models.whisper.attention."""
    NB, h, tq, d = q.shape
    T = k.shape[2]
    g = groups
    n = NB // g
    scale = d ** -0.25
    q4 = q.reshape(n, g, h, d)  # tq == 1, squeezed
    k5 = k.reshape(n, g, h, T, d)
    v5 = v.reshape(n, g, h, T, d)
    anc = ancestry.reshape(n, g, T)

    # same T-minor intermediate layout as attention_int8_ancestry (the
    # g-minor form lane-padded g to 128 — see that docstring)
    s_all = jnp.einsum("nbhd,nkhtd->nkbht", (q4 * scale).astype(jnp.float32),
                       (k5 * scale).astype(jnp.float32))
    sel = (anc[:, None, :, None, :]
           == jnp.arange(g, dtype=anc.dtype)[None, :, None, None, None])
    s = jnp.sum(jnp.where(sel, s_all, 0.0), axis=1)
    valid = jnp.arange(T)[None, None, None, :] <= pos
    s = jnp.where(valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)  # (n, b, h, t)
    wv = jnp.where(sel, w[:, None], 0.0)  # (n, k, b, h, t)
    out = jnp.einsum("nkbht,nkhtd->nbhd", wv, v5.astype(jnp.float32))
    return out.reshape(NB, h, tq, d).astype(q.dtype)


def attention_int8_kv(
    q: jnp.ndarray,  # (b, h, tq, d) fp — pre-scaled by head_dim**-0.25
    k8: jnp.ndarray,  # (b, h, tk, d) int8 — quantized pre-scaled keys
    k_scale: jnp.ndarray,  # (b, h, tk, 1) bf16/fp32
    v8: jnp.ndarray,  # (b, h, tk, d) int8
    v_scale: jnp.ndarray,  # (b, h, tk, 1) bf16/fp32
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact attention over dequantized K/V without materializing them."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k8.astype(jnp.float32)
    )
    scores = scores * k_scale[..., 0][:, :, None, :]  # fold key scales
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    w = w * v_scale[..., 0][:, :, None, :]  # fold value scales
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v8.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Cross-hypothesis self-KV PREFIX SHARING (beam kv_scheme="shared")
# ---------------------------------------------------------------------------


def _merge_two_block(oA, mA, lA, oB, mB, lB, dtype):
    """Flash-style merge of two partial softmax-attention blocks.

    Each part supplies (o_raw = Σ e^(s-m)·w·v, m = rowmax, l = Σ e^(s-m)).
    Exact up to fp reassociation vs a single-pass softmax over the union.
    All-masked parts arrive with m = -inf, l = 0 and merge away cleanly
    (the union is never empty: the current position is always attendable).
    """
    mA_s = jnp.where(jnp.isfinite(mA), mA, jnp.float32(-1e30))
    mB_s = jnp.where(jnp.isfinite(mB), mB, jnp.float32(-1e30))
    m = jnp.maximum(mA_s, mB_s)
    cA = jnp.exp(mA_s - m)
    cB = jnp.exp(mB_s - m)
    denom = lA * cA + lB * cB
    out = (oA * cA[..., None] + oB * cB[..., None]) / denom[..., None]
    return out.astype(dtype)


def _shared_masks(ancestry, s_fill, pos, n, g, Ts, T, W):
    """(mask_S, mask_W, t0): S mask (n, 1, Ts) over shared columns, window
    mask (n, g, W·g) over the F slice starting at position t0 (n,)."""
    t0 = jnp.minimum(s_fill, jnp.int32(max(T - W, 0)))
    t_idx = jnp.arange(Ts)[None, :]
    mask_S = t_idx < jnp.minimum(s_fill, jnp.int32(Ts))[:, None]  # (n, Ts)
    anc3 = ancestry.reshape(n, g, T)
    anc_w = jax.vmap(
        lambda a, o: jax.lax.dynamic_slice(a, (0, o), (g, W))
    )(anc3, t0)  # (n, g, W)
    c = jnp.arange(W * g)
    cw = c // g  # window-relative position
    k_idx = (c % g).astype(ancestry.dtype)
    tw = t0[:, None] + cw[None, :]  # (n, W·g) absolute position
    own = (jnp.take_along_axis(
        anc_w.reshape(n, g, W)[:, :, :],
        jnp.broadcast_to(cw[None, None, :], (n, g, W * g)), axis=2)
        == k_idx[None, None, :])  # (n, g, W·g)
    valid = (tw >= s_fill[:, None]) & (tw <= pos)  # disjoint from mask_S
    return mask_S[:, None, :], own & valid[:, None, :], t0


def attention_int8_shared(
    q: jnp.ndarray,       # (N·g, h, 1, d) — pre-scaled queries
    sk8: jnp.ndarray,     # (n, h, d, Ts) int8 — SHARED prefix keys (1 copy)
    sks: jnp.ndarray,     # (n, h, Ts, 1)
    sv8: jnp.ndarray,     # (n, h, d, Ts)
    svs: jnp.ndarray,     # (n, h, Ts, 1)
    k8f: jnp.ndarray,     # (n, h, d, T·g) int8 — full lane-interleaved flat
    ksf: jnp.ndarray,     # (n, h, T·g, 1)
    v8f: jnp.ndarray,     # (n, h, d, T·g)
    vsf: jnp.ndarray,     # (n, h, T·g, 1)
    ancestry: jnp.ndarray,  # (N·g, T) int32
    s_fill: jnp.ndarray,  # (n,) int32 — positions < s_fill live in S
    pos: jnp.ndarray,     # scalar: current write position
    groups: int,
    window: int,          # W — static F read width (positions)
    mxu: bool = False,
) -> jnp.ndarray:
    """Beam self-attention with cross-hypothesis PREFIX SHARING.

    All live beams of a window agree on their ancestry below a
    per-window depth ``s_fill`` that is ancestrally MONOTONE (children
    inherit agreement), so those positions are attended over a
    single-copy shared buffer S — read once per window instead of once
    per lane — while only the last ≤``window`` divergent positions are
    read from the flat per-lane cache F through a per-window
    dynamic-slice. HBM per step drops from T·g columns to Ts + W·g.
    Exact: the S columns are byte-copies of the agreed lane's F columns
    and the two masked blocks partition the attendable set; the
    flash-style merge is the same softmax sum (fp reassociation only).
    """
    NB, h, tq, d = q.shape
    g = groups
    n = NB // g
    Ts = sk8.shape[3]
    J = k8f.shape[3]
    T = J // g
    W = min(window, T)
    mask_S, mask_W, t0 = _shared_masks(ancestry, s_fill, pos, n, g, Ts, T, W)

    # per-window F slices (dynamic start, static W·g width)
    def slc(a, o, width, axis):
        start = [0] * a.ndim
        start[axis] = o
        sizes = list(a.shape)
        sizes[axis] = width
        return jax.lax.dynamic_slice(a, tuple(start), tuple(sizes))

    kw = jax.vmap(lambda a, o: slc(a, o, W * g, 2))(k8f, t0 * g)
    vw = jax.vmap(lambda a, o: slc(a, o, W * g, 2))(v8f, t0 * g)
    ksw = jax.vmap(lambda a, o: slc(a, o, W * g, 1))(ksf[..., 0], t0 * g)
    vsw = jax.vmap(lambda a, o: slc(a, o, W * g, 1))(vsf[..., 0], t0 * g)

    if mxu and tq == 1:
        q8, qs = _quantize_rows(q.astype(jnp.float32))
        q4, qs4 = q8[:, :, 0].reshape(n, g, h, d), qs[:, :, 0].reshape(n, g, h, 1)
        sS = (jnp.einsum("nbhd,nhdt->nbht", q4, _as_s8(sk8),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
              * qs4 * sks[..., 0].astype(jnp.float32)[:, None])
        sW = (jnp.einsum("nbhd,nhdj->nbhj", q4, _as_s8(kw),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
              * qs4 * ksw.astype(jnp.float32)[:, None])
    else:
        q4 = q.astype(jnp.float32)[:, :, 0].reshape(n, g, h, d)
        sS = jnp.einsum("nbhd,nhdt->nbht", q4, sk8.astype(jnp.float32))
        sS = sS * sks[..., 0].astype(jnp.float32)[:, None]
        sW = jnp.einsum("nbhd,nhdj->nbhj", q4, kw.astype(jnp.float32))
        sW = sW * ksw.astype(jnp.float32)[:, None]
    NEG = jnp.float32(-jnp.inf)
    sS = jnp.where(mask_S[:, :, None, :], sS, NEG)  # (n, b, h, Ts)
    sW = jnp.where(mask_W[:, :, None, :], sW, NEG)

    mS = jnp.max(sS, axis=-1)
    mW = jnp.max(sW, axis=-1)
    eS = jnp.exp(sS - jnp.where(jnp.isfinite(mS), mS, 0.0)[..., None])
    eS = jnp.where(mask_S[:, :, None, :], eS, 0.0)
    eW = jnp.exp(sW - jnp.where(jnp.isfinite(mW), mW, 0.0)[..., None])
    eW = jnp.where(mask_W[:, :, None, :], eW, 0.0)
    lS = jnp.sum(eS, axis=-1)
    lW = jnp.sum(eW, axis=-1)
    wS = eS * svs[..., 0].astype(jnp.float32)[:, None, :, :]
    wW = eW * vsw.astype(jnp.float32)[:, None, :, :]
    if mxu and tq == 1:
        w8S, wsS = _quantize_rows(wS)
        oS = (jnp.einsum("nbht,nhdt->nbhd", w8S, _as_s8(sv8),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
              * wsS)
        w8W, wsW = _quantize_rows(wW)
        oW = (jnp.einsum("nbhj,nhdj->nbhd", w8W, _as_s8(vw),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
              * wsW)
    else:
        oS = jnp.einsum("nbht,nhdt->nbhd", wS, sv8.astype(jnp.float32))
        oW = jnp.einsum("nbhj,nhdj->nbhd", wW, vw.astype(jnp.float32))
    out = _merge_two_block(oS, mS, lS, oW, mW, lW, q.dtype)
    return out.reshape(NB, h, tq, d)


def attention_fp_shared(
    q: jnp.ndarray,     # (N·g, h, 1, d) — RAW queries (scaled inside)
    skf: jnp.ndarray,   # (n, h, Ts, d) — shared prefix keys, raw
    svf: jnp.ndarray,   # (n, h, Ts, d)
    kf: jnp.ndarray,    # (n, h, T·g, d) — lane-interleaved flat raw keys
    vf: jnp.ndarray,    # (n, h, T·g, d)
    ancestry: jnp.ndarray,
    s_fill: jnp.ndarray,
    pos: jnp.ndarray,
    groups: int,
    window: int,
) -> jnp.ndarray:
    """fp twin of :func:`attention_int8_shared` (parity/test mode)."""
    NB, h, tq, d = q.shape
    g = groups
    n = NB // g
    Ts = skf.shape[2]
    J = kf.shape[2]
    T = J // g
    W = min(window, T)
    scale = d ** -0.25
    mask_S, mask_W, t0 = _shared_masks(ancestry, s_fill, pos, n, g, Ts, T, W)

    kw = jax.vmap(lambda a, o: jax.lax.dynamic_slice(
        a, (0, o, 0), (h, W * g, d)))(kf, t0 * g)
    vw = jax.vmap(lambda a, o: jax.lax.dynamic_slice(
        a, (0, o, 0), (h, W * g, d)))(vf, t0 * g)

    q4 = (q * scale).astype(jnp.float32)[:, :, 0].reshape(n, g, h, d)
    sS = jnp.einsum("nbhd,nhtd->nbht", q4,
                    (skf * scale).astype(jnp.float32))
    sW = jnp.einsum("nbhd,nhjd->nbhj", q4,
                    (kw * scale).astype(jnp.float32))
    NEG = jnp.float32(-jnp.inf)
    sS = jnp.where(mask_S[:, :, None, :], sS, NEG)
    sW = jnp.where(mask_W[:, :, None, :], sW, NEG)
    mS = jnp.max(sS, axis=-1)
    mW = jnp.max(sW, axis=-1)
    eS = jnp.where(mask_S[:, :, None, :],
                   jnp.exp(sS - jnp.where(jnp.isfinite(mS), mS, 0.0)[..., None]), 0.0)
    eW = jnp.where(mask_W[:, :, None, :],
                   jnp.exp(sW - jnp.where(jnp.isfinite(mW), mW, 0.0)[..., None]), 0.0)
    lS, lW = jnp.sum(eS, axis=-1), jnp.sum(eW, axis=-1)
    oS = jnp.einsum("nbht,nhtd->nbhd", eS, svf.astype(jnp.float32))
    oW = jnp.einsum("nbhj,nhjd->nbhd", eW, vw.astype(jnp.float32))
    out = _merge_two_block(oS, mS, lS, oW, mW, lW, q.dtype)
    return out.reshape(NB, h, tq, d)
