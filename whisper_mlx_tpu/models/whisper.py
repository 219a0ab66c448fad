"""Whisper encoder/decoder as pure JAX functions over pytree params.

The reference runs this model inside the external ``mlx_whisper`` package
(C++/Metal MLX graphs — SURVEY.md §2.1); here it is a TPU-first design:

- **pure functions + pytree params** — everything jit/pjit-able, no module
  framework in the hot path;
- **NWC conv layout** for the encoder stem (XLA's native TPU conv layout);
- **static shapes everywhere**: 30 s window → (3000, n_mels) mel → 1500
  encoder frames → ≤448 decoder positions, preallocated KV caches updated
  with ``dynamic_update_slice`` inside ``lax.while_loop`` decode;
- **bf16 compute / fp32 accumulate** by default on TPU (MXU-native), with an
  fp32 parity mode for golden-token tests;
- cross-attention probabilities for word-timestamp DTW are exported only for
  the alignment heads, gathered inside the jitted step (SURVEY.md §7).

Architecture facts (conv stem kernel 3 / stride 2, pre-LN blocks, no bias on
key projections, q/k scaled by ``head_dim**-0.25`` each, tied embedding
output head, sinusoidal encoder + learned decoder positions) follow the
public Whisper model family; dims per size in :data:`WHISPER_CONFIGS`.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# The Pallas decode-attention kernel opt-in is read from the environment
# ONCE at import so cache layout (cross_kv / init_kv_cache T-padding) and
# kernel selection (ops/kv_quant.py) make one consistent static decision —
# flipping the env mid-process can otherwise desync jit retraces (ADVICE r2).
_DECODE_ATTN_KERNEL_DEFAULT = os.environ.get("WTPU_DECODE_ATTN_KERNEL") == "1"
# self-KV cache layout: "tminor" (b,h,d,T) or "tmajor" (T,b,h*d) — one
# static decision read once at import (same rationale as the kernel flag)
_SELF_KV_LAYOUT_DEFAULT = os.environ.get("WTPU_SELF_KV_LAYOUT", "tminor")
_KV_LAYOUT_DEFAULT = os.environ.get("WTPU_KV_LAYOUT", "tminor")
# integer-MXU decode attention (ops/kv_quant.py attention_int8_mxu): both
# attention dots run s8×s8→s32 with dynamically re-quantized q / w·vs —
# removes the per-code VPU converts the einsum path pays. Same
# read-once-at-import rationale as the flags above.
_ATTN_MXU_DEFAULT = os.environ.get("WTPU_ATTN_MXU") == "1"


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    # compute dtype: bf16 rides the MXU; fp32 is the parity/testing mode
    dtype: Any = jnp.float32
    # encoder attention via the Pallas flash kernel (ops/flash_attention.py);
    # avoids materializing (B, H, 1500, 1500) score tensors
    flash_attention: bool = False
    # quantized cross-attention KV cache (ops/kv_quant.py): 8 = int8
    # (halves the dominant decode HBM traffic), 4 = native int4 (quarters
    # it; divergence bounds in docs/kv_quant_study.md); 0 = bf16/fp
    kv_bits: int = 0
    # int8 self-attention KV cache (smaller win; separate flag so each can
    # be benched/validated independently)
    self_kv_bits: int = 0
    # self-KV storage layout (quantized caches only): "tminor" = (b,h,d,T)
    # batched-matvec reads + per-column RMW writes; "tmajor" = (T,b,h·d)
    # elementwise-stream reads + contiguous plane writes
    # (ops/kv_quant.py attention_int8_tmajor)
    self_kv_layout: str = _SELF_KV_LAYOUT_DEFAULT
    # cross-KV cache layout (quantized caches only): same options — the
    # cross stream is the decode loop's dominant HBM traffic
    # (ops/kv_quant.py attention_int8_tmajor_cross / _grouped)
    kv_layout: str = _KV_LAYOUT_DEFAULT
    # fused Pallas decode-attention kernel (ops/decode_attention.py) — one
    # static decision threaded to cache layout AND kernel selection; default
    # comes from WTPU_DECODE_ATTN_KERNEL read once at import
    decode_attn_kernel: bool = _DECODE_ATTN_KERNEL_DEFAULT
    # integer-MXU decode attention (WTPU_ATTN_MXU=1 / attn_mxu=True):
    # s8×s8 MXU dots with dynamic q / w·vs int8 rounding — quality bounds
    # docs/kv_quant_study.md (scripts/study_kv_divergence.py --attn-mxu)
    attn_mxu: bool = _ATTN_MXU_DEFAULT
    # word-timestamp DTW cross-attention heads ((layer, head) pairs) — real
    # checkpoints ship the model-specific mask in config.json
    # ("alignment_heads", the openai per-model dump carried through the mlx
    # conversion); None → upper-half-layers fallback
    # (inference/word_timestamps.py default_alignment_heads). Host-side
    # only; tuple-of-tuples so the frozen config stays hashable for jit.
    alignment_heads: tuple[tuple[int, int], ...] | None = None

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


# Official model family dims. large-v3 widens the mel frontend to 128 bands
# (the checkpoint the reference serves — reference ``run:4``); turbo shrinks
# the decoder to 4 layers.
WHISPER_CONFIGS: dict[str, WhisperConfig] = {
    "tiny": WhisperConfig(),
    "base": WhisperConfig(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                          n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": WhisperConfig(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                           n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": WhisperConfig(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                            n_text_state=1024, n_text_head=16, n_text_layer=24),
    "large-v1": WhisperConfig(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                              n_text_state=1280, n_text_head=20, n_text_layer=32),
    "large-v2": WhisperConfig(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                              n_text_state=1280, n_text_head=20, n_text_layer=32),
    "large-v3": WhisperConfig(n_mels=128, n_vocab=51866,
                              n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                              n_text_state=1280, n_text_head=20, n_text_layer=32),
    "large-v3-turbo": WhisperConfig(n_mels=128, n_vocab=51866,
                                    n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                                    n_text_state=1280, n_text_head=20, n_text_layer=4),
}


def sinusoids(length: int, channels: int, max_timescale: float = 10_000.0) -> np.ndarray:
    """Sinusoidal position embedding for the encoder (sin ‖ cos halves)."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# primitive layers (pure functions)
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    # LN in ≥fp32 regardless of compute dtype: cheap, and keeps parity.
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    w = p["w"]
    if type(w).__name__ in ("QuantTensor", "NativeQuantTensor",
                            "DenseWeight", "QuantTensorT", "A8Tensor"):  # ops/quant.py
        from whisper_mlx_tpu.ops.quant import quant_matmul

        y = quant_matmul(x, w)
    else:
        y = x @ w.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embed_tokens(emb, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    """Token embedding lookup; quantized tables gather+dequant rows only."""
    if type(emb).__name__ in ("QuantTensor", "NativeQuantTensor", "DenseWeight"):
        from whisper_mlx_tpu.ops.quant import quant_rows

        return quant_rows(emb, tokens, dtype=dtype)
    return emb.astype(dtype)[tokens]


def embed_logits(emb, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Tied-embedding output head: x (b,t,d) → logits (b,t,vocab)."""
    if type(emb).__name__ in ("QuantTensor", "NativeQuantTensor", "DenseWeight"):
        from whisper_mlx_tpu.ops.quant import quant_matmul

        return quant_matmul(x, emb)
    return jnp.einsum("btd,vd->btv", x, emb.astype(dtype))


def conv1d_nwc(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    """1-D conv in (batch, time, channels) layout, SAME-style padding=1, k=3."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),  # (k, in, out)
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"].astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    return_weights: bool = False,
):
    """Multi-head SDPA over (batch, heads, time, head_dim) tensors.

    q/k each scaled by ``head_dim**-0.25``; softmax in fp32. This is the XLA
    path — XLA fuses the QK^T → softmax → PV chain well for these sizes; the
    Pallas flash kernel (ops/flash_attention.py) takes over for long-context
    LLM serving where the T×T score tensor would spill VMEM.
    """
    scale = q.shape[-1] ** -0.25
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    scores = scores.astype(jnp.promote_types(scores.dtype, jnp.float32))
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
    return (out, w) if return_weights else (out, None)


def _qkv_proj(h: jnp.ndarray, attn: Params, n_head: int):
    """Self-attention q/k/v projections → (b, h, t, hd) each.

    Quantized checkpoints may carry a fused stacked projection
    (ops/quant.py fuse_whisper_qkv): one dequant-matmul replaces three —
    the decode loop is kernel-launch- and HBM-bound, so this matters."""
    if "qkv" in attn:
        d = h.shape[-1]
        fused = linear(h, attn["qkv"])  # (..., 3d)
        q, k, v = fused[..., :d], fused[..., d : 2 * d], fused[..., 2 * d :]
    else:
        q = linear(h, attn["q"])
        k = linear(h, attn["k"])
        v = linear(h, attn["v"])
    return (_split_heads(q, n_head), _split_heads(k, n_head),
            _split_heads(v, n_head))


def mha(
    x: jnp.ndarray,
    kv_source: jnp.ndarray,
    p: Params,
    n_head: int,
    mask: jnp.ndarray | None = None,
    return_weights: bool = False,
    use_flash: bool = False,
):
    if kv_source is x:
        q, k, v = _qkv_proj(x, p, n_head)
    else:
        q = _split_heads(linear(x, p["q"]), n_head)
        k = _split_heads(linear(kv_source, p["k"]), n_head)
        v = _split_heads(linear(kv_source, p["v"]), n_head)
    if use_flash and not return_weights and mask is None:
        scale = q.shape[-1] ** -0.25
        if k.shape[2] <= 2048:
            # encoder shapes: whole-Tk rows fit VMEM — the bh-tiled dense
            # kernel amortizes program overhead ~50× better than the
            # block-streamed flash kernel (ops/dense_attention.py).
            from whisper_mlx_tpu.ops.dense_attention import dense_attention

            out = dense_attention(q * scale, k * scale, v)
        else:
            from whisper_mlx_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q * scale, k * scale, v)
        return linear(_merge_heads(out), p["o"]), None
    out, w = attention(q, k, v, mask, return_weights)
    return linear(_merge_heads(out), p["o"]), w


def mlp(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    return linear(jax.nn.gelu(linear(x, p["fc1"]), approximate=False), p["fc2"])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config",))
def encode(params: Params, mel: jnp.ndarray, config: WhisperConfig) -> jnp.ndarray:
    """mel (batch, 3000, n_mels) → encoder states (batch, 1500, d)."""
    p = params["encoder"]
    x = mel.astype(config.dtype)
    x = jax.nn.gelu(conv1d_nwc(x, p["conv1"], stride=1), approximate=False)
    x = jax.nn.gelu(conv1d_nwc(x, p["conv2"], stride=2), approximate=False)
    # Positions come from params (checkpoints ship the sinusoid table; exact
    # float32 argument rounding differs ~1e-4 from recomputation, which would
    # break golden-token parity).
    x = x + p["pos_emb"].astype(x.dtype)
    for blk in p["blocks"]:
        h = layer_norm(x, blk["attn_ln"])
        attn_out, _ = mha(h, h, blk["attn"], config.n_audio_head,
                          use_flash=config.flash_attention)
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])
    return layer_norm(x, p["ln_post"])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def cross_kv(params: Params, audio_states: jnp.ndarray, config: WhisperConfig) -> list[Params]:
    """Precompute per-layer cross-attention K/V once per window.

    The reference's MLX decoder recomputes K/V lazily per layer; on TPU we
    hoist it out of the token loop entirely — it is a pure function of the
    encoder output. With ``config.kv_bits`` 8 (int8) or 4 (native int4)
    the keys (pre-scaled by head_dim**-0.25, matching the attention
    convention) and values are stored quantized with per-position scales
    (ops/kv_quant.py).
    """
    out = []
    scale = (config.n_text_state // config.n_text_head) ** -0.25
    # K AND V are cached transposed (time-minor); when the opt-in Pallas
    # decode kernel is active, T is additionally padded to the lane tile
    # ONCE here so it streams contiguous lane-aligned blocks with zero
    # per-step padding copies (ops/decode_attention.py) — the tail is
    # masked via valid_len. The default XLA einsum path needs no padding,
    # and padding would cost it extra traffic.
    use_kernel = config.decode_attn_kernel
    for blk in params["decoder"]["blocks"]:
        k = _split_heads(linear(audio_states, blk["cross_attn"]["k"]), config.n_text_head)
        v = _split_heads(linear(audio_states, blk["cross_attn"]["v"]), config.n_text_head)
        if config.kv_bits in (4, 8):
            from whisper_mlx_tpu.ops.kv_quant import quantize_kv

            k8, ks = quantize_kv(k * scale, bits=config.kv_bits)
            v8, vs = quantize_kv(v, bits=config.kv_bits)
            if config.kv_layout == "tmajor":
                # (T, b, h·d) planes + (T, b, h) scales: decode reads the
                # cache as one elementwise stream in layout order
                # (ops/kv_quant.py attention_int8_tmajor_cross)
                assert not use_kernel, "tmajor cross incompatible with kernel"
                b_, h_, t_, d_ = k8.shape
                out.append({
                    "kT": k8.transpose(2, 0, 1, 3).reshape(t_, b_, h_ * d_),
                    "ksT": ks[..., 0].transpose(2, 0, 1),
                    "vT": v8.transpose(2, 0, 1, 3).reshape(t_, b_, h_ * d_),
                    "vsT": vs[..., 0].transpose(2, 0, 1),
                })
                continue
            t = k8.shape[2]
            t_pad = (-t % 128) if use_kernel else 0
            k8t = jnp.swapaxes(k8, 2, 3)
            v8t = jnp.swapaxes(v8, 2, 3)
            if t_pad:
                tpad4 = ((0, 0), (0, 0), (0, 0), (0, t_pad))
                k8t = jnp.pad(k8t, tpad4)
                v8t = jnp.pad(v8t, tpad4)
                ks = jnp.pad(ks, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
                vs = jnp.pad(vs, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
            out.append({"k8t": k8t, "ks": ks, "v8t": v8t, "vs": vs})
        else:
            out.append({"k": k, "v": v})
    return out


def init_kv_cache(config: WhisperConfig, batch: int, dtype=None,
                  max_len: int | None = None) -> list[Params]:
    """Preallocated self-attention KV cache (static shapes for while_loop).

    With ``config.kv_bits == 8`` entries are int8 + per-position scales
    (ops/kv_quant.py) — half the storage and per-step read traffic.

    ``max_len`` right-sizes the cache to the decode's real horizon
    (prompt + sample_len, rounded up to the 128-lane tile): every decode
    step re-reads the WHOLE cache, so allocating the full n_text_ctx=448
    when sample_len caps at 224 streams ~43% dead positions per step —
    and beam search's parent gather rewrites them every step too.
    """
    dtype = dtype or config.dtype
    hd = config.n_text_state // config.n_text_head
    t_alloc = config.n_text_ctx if max_len is None else min(
        -(-max_len // 128) * 128, config.n_text_ctx
    )
    shape = (batch, config.n_text_head, t_alloc, hd)
    if config.self_kv_bits in (4, 8):
        # K/V transposed (time-minor); T additionally padded to the lane
        # tile when the opt-in Pallas decode kernel is active
        # (ops/decode_attention.py) — causality masks the padded tail
        # (positions ≥ the decode horizon are never written or attended).
        if config.decode_attn_kernel:
            t_alloc = -(-t_alloc // 128) * 128
        kt_shape = (batch, config.n_text_head, hd, t_alloc)
        sshape = (batch, config.n_text_head, t_alloc, 1)
        qdt = jnp.int8 if config.self_kv_bits == 8 else jnp.int4
        if config.self_kv_layout == "tmajor":
            # (T, b, h·d): step writes are contiguous planes, reads one
            # elementwise stream (ops/kv_quant.py attention_int8_tmajor).
            # T is the MAJOR dim — no lane-tile rounding needed, so the
            # allocation tracks the exact horizon (dead positions cost
            # full-stream reads every step).
            if max_len is not None:
                t_alloc = min(max_len, config.n_text_ctx)
            kT_shape = (t_alloc, batch, config.n_text_head * hd)
            sT_shape = (t_alloc, batch, config.n_text_head)
            return [
                {"kT": jnp.zeros(kT_shape, qdt),
                 "ksT": jnp.zeros(sT_shape, jnp.bfloat16),
                 "vT": jnp.zeros(kT_shape, qdt),
                 "vsT": jnp.zeros(sT_shape, jnp.bfloat16)}
                for _ in range(config.n_text_layer)
            ]
        return [
            {"k8t": jnp.zeros(kt_shape, qdt), "ks": jnp.zeros(sshape, jnp.bfloat16),
             "v8t": jnp.zeros(kt_shape, qdt), "vs": jnp.zeros(sshape, jnp.bfloat16)}
            for _ in range(config.n_text_layer)
        ]
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(config.n_text_layer)
    ]


def decode_step(
    params: Params,
    tokens: jnp.ndarray,  # (batch, t) token ids for these positions
    pos: jnp.ndarray,  # scalar: first position index of `tokens`
    kv_cache: list[Params],
    xkv: list[Params],
    config: WhisperConfig,
    collect_cross_attn: bool = False,
    share_xkv_groups: int = 1,
    beam_ancestry: jnp.ndarray | None = None,
    beam_s_fill: jnp.ndarray | None = None,
    beam_window: int = 0,
):
    """Run the decoder on ``tokens`` starting at position ``pos``.

    Works both for the prompt prefill (t = prompt length) and the incremental
    step (t = 1). Returns logits for the last position of each sequence plus
    the updated cache; optionally the full cross-attention weights stacked as
    (layers, batch, heads, t, 1500) for DTW alignment.

    ``beam_ancestry`` (batch, T_alloc) int32 switches self-attention to
    indirection addressing (ops/kv_quant.py attention_*_ancestry): beam
    search never reorders the cache — each lane writes its own row, and
    ancestry maps (lane, position) → owning lane within the
    ``share_xkv_groups``-sized window group. Requires t == 1.
    """
    p = params["decoder"]
    b, t = tokens.shape
    x = embed_tokens(p["token_emb"], tokens, config.dtype)
    x = x + jax.lax.dynamic_slice_in_dim(
        p["pos_emb"].astype(config.dtype), pos, t, axis=0
    )

    # causal mask offset by cache position: queries at [pos, pos+t) may attend
    # keys at [0, pos + q_idx]. Length follows the (possibly right-sized)
    # cache allocation, not n_text_ctx (init_kv_cache max_len).
    if "k8t" in kv_cache[0]:
        t_cache = kv_cache[0]["k8t"].shape[3]
    elif "kT" in kv_cache[0]:  # time-major quantized self cache
        t_cache = kv_cache[0]["kT"].shape[0]
    elif "k8f" in kv_cache[0]:  # beam lane-interleaved flat (T*g columns)
        t_cache = kv_cache[0]["k8f"].shape[3] // share_xkv_groups
    elif "kf" in kv_cache[0]:
        t_cache = kv_cache[0]["kf"].shape[2] // share_xkv_groups
    else:
        t_cache = kv_cache[0]["k"].shape[2]
    q_idx = jnp.arange(t)[:, None] + pos
    k_idx = jnp.arange(t_cache)[None, :]
    mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)

    new_cache = []
    cross_weights = []
    for i, blk in enumerate(p["blocks"]):
        h = layer_norm(x, blk["attn_ln"])
        q, k_new, v_new = _qkv_proj(h, blk["attn"], config.n_text_head)
        if "k8f" in kv_cache[i] or "kf" in kv_cache[i]:
            # Beam-mode lane-interleaved FLAT self-KV cache (t == 1,
            # beam_ancestry required — see decoding/beam.py). Column
            # t*g + k of the time axis holds lane k's position t, so the
            # step write is one contiguous g-column update and attention
            # keeps the greedy path's plain batched-matmul lowering (the
            # 5-D grouped form forced whole-cache copies every step —
            # ops/kv_quant.py attention_int8_beamflat docstring).
            g = share_xkv_groups
            n_win = b // g
            jcol = pos * g
            if "k8f" in kv_cache[i]:
                from whisper_mlx_tpu.ops.kv_quant import (
                    attention_int8_beamflat,
                    quantize_kv,
                )

                scale = q.shape[-1] ** -0.25
                k8n, ksn = quantize_kv(k_new * scale, bits=config.self_kv_bits)
                v8n, vsn = quantize_kv(v_new, bits=config.self_kv_bits)
                # (NB, h, 1, d) -> (n, h, d, g) block at columns [pos*g, +g)
                blkk = k8n[:, :, 0].reshape(n_win, g, config.n_text_head, -1
                                            ).transpose(0, 2, 3, 1)
                blkv = v8n[:, :, 0].reshape(n_win, g, config.n_text_head, -1
                                            ).transpose(0, 2, 3, 1)
                sblkk = ksn[:, :, 0].reshape(n_win, g, -1).transpose(0, 2, 1)[..., None]
                sblkv = vsn[:, :, 0].reshape(n_win, g, -1).transpose(0, 2, 1)[..., None]
                entry = {
                    "k8f": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["k8f"], blkk, jcol, axis=3),
                    "ksf": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["ksf"], sblkk, jcol, axis=2),
                    "v8f": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["v8f"], blkv, jcol, axis=3),
                    "vsf": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["vsf"], sblkv, jcol, axis=2),
                }
                if "sk8" in kv_cache[i]:
                    # PREFIX-SHARING scheme (decoding/beam.py kv_scheme=
                    # "shared"): agreed positions < beam_s_fill are read
                    # from the single-copy S buffers; only the divergent
                    # ≤beam_window tail is read per-lane from F. S is
                    # committed by the beam loop, passed through here.
                    from whisper_mlx_tpu.ops.kv_quant import (
                        attention_int8_shared,
                    )

                    for sk in ("sk8", "sks", "sv8", "svs"):
                        entry[sk] = kv_cache[i][sk]
                    new_cache.append(entry)
                    attn_out = attention_int8_shared(
                        q * scale, entry["sk8"], entry["sks"],
                        entry["sv8"], entry["svs"],
                        entry["k8f"], entry["ksf"], entry["v8f"],
                        entry["vsf"], beam_ancestry, beam_s_fill, pos, g,
                        beam_window, mxu=config.attn_mxu,
                    )
                else:
                    new_cache.append(entry)
                    attn_out = attention_int8_beamflat(
                        q * scale, entry["k8f"], entry["ksf"], entry["v8f"],
                        entry["vsf"], beam_ancestry, pos, g,
                        mxu=config.attn_mxu,
                    )
            else:
                from whisper_mlx_tpu.ops.kv_quant import attention_fp_beamflat

                # (NB, h, 1, d) -> (n, h, g, d) block at rows [pos*g, +g)
                blkk = k_new[:, :, 0].reshape(n_win, g, config.n_text_head, -1
                                              ).transpose(0, 2, 1, 3)
                blkv = v_new[:, :, 0].reshape(n_win, g, config.n_text_head, -1
                                              ).transpose(0, 2, 1, 3)
                entry = {
                    "kf": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["kf"], blkk, jcol, axis=2),
                    "vf": jax.lax.dynamic_update_slice_in_dim(
                        kv_cache[i]["vf"], blkv, jcol, axis=2),
                }
                if "skf" in kv_cache[i]:
                    from whisper_mlx_tpu.ops.kv_quant import (
                        attention_fp_shared,
                    )

                    entry["skf"] = kv_cache[i]["skf"]
                    entry["svf"] = kv_cache[i]["svf"]
                    new_cache.append(entry)
                    attn_out = attention_fp_shared(
                        q, entry["skf"], entry["svf"], entry["kf"],
                        entry["vf"], beam_ancestry, beam_s_fill, pos, g,
                        beam_window,
                    )
                else:
                    new_cache.append(entry)
                    attn_out = attention_fp_beamflat(
                        q, entry["kf"], entry["vf"], beam_ancestry, pos, g,
                    )
        elif "kT" in kv_cache[i]:
            # TIME-MAJOR quantized self cache: contiguous plane writes +
            # elementwise-stream reads (ops/kv_quant.py attention_int8_tmajor
            # docstring has the traffic math). Greedy/best_of only — beam
            # uses the lane-interleaved flat cache above.
            from whisper_mlx_tpu.ops.kv_quant import (
                attention_int8_tmajor,
                quantize_kv,
            )

            assert beam_ancestry is None, "tmajor layout has no ancestry mode"
            scale = q.shape[-1] ** -0.25
            k8n, ksn = quantize_kv(k_new * scale, bits=config.self_kv_bits)
            v8n, vsn = quantize_kv(v_new, bits=config.self_kv_bits)
            # (b, h, t, d) -> (t, b, h·d) planes; (b, h, t, 1) -> (t, b, h)
            plane = lambda a: a.transpose(2, 0, 1, 3).reshape(t, b, -1)
            splane = lambda s: s[..., 0].transpose(2, 0, 1)
            updT = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                buf, new.astype(buf.dtype), pos, axis=0)
            entry = {
                "kT": updT(kv_cache[i]["kT"], plane(k8n)),
                "ksT": updT(kv_cache[i]["ksT"], splane(ksn)),
                "vT": updT(kv_cache[i]["vT"], plane(v8n)),
                "vsT": updT(kv_cache[i]["vsT"], splane(vsn)),
            }
            new_cache.append(entry)
            attn_out = attention_int8_tmajor(
                q * scale, entry["kT"], entry["ksT"], entry["vT"],
                entry["vsT"], pos=pos,
            )
        elif config.self_kv_bits in (4, 8):
            from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto, quantize_kv

            scale = q.shape[-1] ** -0.25
            k8n, ksn = quantize_kv(k_new * scale, bits=config.self_kv_bits)
            v8n, vsn = quantize_kv(v_new, bits=config.self_kv_bits)
            upd = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(buf, new, pos, axis=2)
            updt = lambda buf, new: jax.lax.dynamic_update_slice_in_dim(
                buf, jnp.swapaxes(new, 2, 3), pos, axis=3)
            entry = {
                "k8t": updt(kv_cache[i]["k8t"], k8n),
                "ks": upd(kv_cache[i]["ks"], ksn),
                "v8t": updt(kv_cache[i]["v8t"], v8n),
                "vs": upd(kv_cache[i]["vs"], vsn),
            }
            new_cache.append(entry)
            if beam_ancestry is not None:
                from whisper_mlx_tpu.ops.kv_quant import attention_int8_ancestry

                attn_out = attention_int8_ancestry(
                    q * scale, entry["k8t"], entry["ks"], entry["v8t"],
                    entry["vs"], beam_ancestry, pos, share_xkv_groups,
                )
            elif config.attn_mxu:
                from whisper_mlx_tpu.ops.kv_quant import attention_int8_mxu

                attn_out = attention_int8_mxu(
                    q * scale, entry["k8t"], entry["ks"], entry["v8t"],
                    entry["vs"], pos=pos, causal=True,
                )
            else:
                attn_out = attention_int8_auto(
                    q * scale, entry["k8t"], entry["ks"], entry["v8t"], entry["vs"],
                    pos=pos, causal=True, kernel=config.decode_attn_kernel,
                )
        else:
            k = jax.lax.dynamic_update_slice_in_dim(kv_cache[i]["k"], k_new, pos, axis=2)
            v = jax.lax.dynamic_update_slice_in_dim(kv_cache[i]["v"], v_new, pos, axis=2)
            new_cache.append({"k": k, "v": v})
            if beam_ancestry is not None:
                from whisper_mlx_tpu.ops.kv_quant import attention_fp_ancestry

                attn_out = attention_fp_ancestry(
                    q, k, v, beam_ancestry, pos, share_xkv_groups,
                )
            else:
                attn_out, _ = attention(q, k, v, mask)
        x = x + linear(_merge_heads(attn_out), blk["attn"]["o"])

        h = layer_norm(x, blk["cross_attn_ln"])
        qx = _split_heads(linear(h, blk["cross_attn"]["q"]), config.n_text_head)
        scale = qx.shape[-1] ** -0.25
        if share_xkv_groups > 1:
            # beam/best_of: g hypothesis rows share one window's cross K/V
            # — the grouped attention broadcasts the shared cache instead
            # of streaming a g×-replicated copy (the decode loop's dominant
            # HBM traffic). xkv arrives UNREPLICATED (batch n = b/g).
            g = share_xkv_groups
            n = qx.shape[0] // g
            qx5 = qx.reshape(n, g, *qx.shape[1:])
            if "kT" in xkv[i]:
                from whisper_mlx_tpu.ops.kv_quant import (
                    attention_int8_tmajor_grouped,
                )

                out5 = attention_int8_tmajor_grouped(
                    qx5 * scale, xkv[i]["kT"], xkv[i]["ksT"], xkv[i]["vT"],
                    xkv[i]["vsT"],
                )
            elif "k8t" in xkv[i]:
                if config.attn_mxu:
                    from whisper_mlx_tpu.ops.kv_quant import (
                        attention_int8_grouped_mxu as _grouped,
                    )
                else:
                    from whisper_mlx_tpu.ops.kv_quant import (
                        attention_int8_grouped as _grouped,
                    )

                out5 = _grouped(
                    qx5 * scale, xkv[i]["k8t"], xkv[i]["ks"], xkv[i]["v8t"],
                    xkv[i]["vs"], valid_len=config.n_audio_ctx,
                )
            else:
                s5 = jnp.einsum(
                    "nghqd,nhkd->nghqk", (qx5 * scale).astype(jnp.float32),
                    (xkv[i]["k"] * scale).astype(jnp.float32),
                )
                w5 = jax.nn.softmax(s5, axis=-1).astype(xkv[i]["v"].dtype)
                out5 = jnp.einsum("nghqk,nhkd->nghqd", w5, xkv[i]["v"])
            cross_out = out5.reshape(qx.shape).astype(qx.dtype)
            cw = None
        elif "kT" in xkv[i]:  # time-major quantized cross cache
            from whisper_mlx_tpu.ops.kv_quant import attention_int8_tmajor_cross

            cross_out = attention_int8_tmajor_cross(
                qx * scale, xkv[i]["kT"], xkv[i]["ksT"], xkv[i]["vT"],
                xkv[i]["vsT"],
            )
            cw = None
        elif "k8t" in xkv[i]:  # int8 KV path (never collects weights — DTW
            # alignment uses a full-precision pass)
            if config.attn_mxu:
                from whisper_mlx_tpu.ops.kv_quant import attention_int8_mxu

                cross_out = attention_int8_mxu(
                    qx * scale, xkv[i]["k8t"], xkv[i]["ks"], xkv[i]["v8t"],
                    xkv[i]["vs"], valid_len=config.n_audio_ctx,
                )
            else:
                from whisper_mlx_tpu.ops.kv_quant import attention_int8_auto

                cross_out = attention_int8_auto(
                    qx * scale, xkv[i]["k8t"], xkv[i]["ks"], xkv[i]["v8t"],
                    xkv[i]["vs"], valid_len=config.n_audio_ctx,
                    kernel=config.decode_attn_kernel,
                )
            cw = None
        else:
            cross_out, cw = attention(qx, xkv[i]["k"], xkv[i]["v"],
                                      return_weights=collect_cross_attn)
        x = x + linear(_merge_heads(cross_out), blk["cross_attn"]["o"])
        if collect_cross_attn:
            cross_weights.append(cw)

        x = x + mlp(layer_norm(x, blk["mlp_ln"]), blk["mlp"])

    x = layer_norm(x, p["ln"])
    logits = embed_logits(p["token_emb"], x, config.dtype)
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    cross = jnp.stack(cross_weights) if collect_cross_attn else None
    return logits, new_cache, cross


# ---------------------------------------------------------------------------
# initialization (for tests / benchmarks; real weights come from checkpoint/)
# ---------------------------------------------------------------------------


def init_params(config: WhisperConfig, seed: int = 0, dtype=jnp.float32) -> Params:
    """Random params with the exact pytree structure the loaders produce."""
    rng = np.random.default_rng(seed)

    def dense(n_in, n_out, bias=True):
        p = {"w": (rng.standard_normal((n_in, n_out)) / math.sqrt(n_in)).astype(np.float32)}
        if bias:
            p["b"] = np.zeros(n_out, np.float32)
        return p

    def ln(d):
        return {"g": np.ones(d, np.float32), "b": np.zeros(d, np.float32)}

    def attn_block(d, cross=False):
        return {
            "q": dense(d, d),
            "k": dense(d, d, bias=False),
            "v": dense(d, d),
            "o": dense(d, d),
        }

    def enc_block(d):
        return {
            "attn_ln": ln(d),
            "attn": attn_block(d),
            "mlp_ln": ln(d),
            "mlp": {"fc1": dense(d, 4 * d), "fc2": dense(4 * d, d)},
        }

    def dec_block(d):
        blk = enc_block(d)
        blk["cross_attn_ln"] = ln(d)
        blk["cross_attn"] = attn_block(d, cross=True)
        return blk

    d_a, d_t = config.n_audio_state, config.n_text_state
    params: Params = {
        "encoder": {
            "conv1": {
                "w": (rng.standard_normal((3, config.n_mels, d_a)) / math.sqrt(3 * config.n_mels)).astype(np.float32),
                "b": np.zeros(d_a, np.float32),
            },
            "conv2": {
                "w": (rng.standard_normal((3, d_a, d_a)) / math.sqrt(3 * d_a)).astype(np.float32),
                "b": np.zeros(d_a, np.float32),
            },
            "pos_emb": sinusoids(config.n_audio_ctx, d_a),
            "blocks": [enc_block(d_a) for _ in range(config.n_audio_layer)],
            "ln_post": ln(d_a),
        },
        "decoder": {
            "token_emb": (rng.standard_normal((config.n_vocab, d_t)) * 0.02).astype(np.float32),
            "pos_emb": (rng.standard_normal((config.n_text_ctx, d_t)) * 0.02).astype(np.float32),
            "blocks": [dec_block(d_t) for _ in range(config.n_text_layer)],
            "ln": ln(d_t),
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
