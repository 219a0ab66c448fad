"""Qwen2/Qwen3-family decoder LLM, pure-functional JAX (pytree params).

The reference's chat capability runs Qwen3-32B / Qwen2.5-7B/14B via the
external ``mlx_lm`` package (reference ``llm.py:31-35``, ``daemon/chat.py:
142-147``; SURVEY.md §2.2 "LLM engine"). This is the TPU-native model:

- RMSNorm (pre-norm), rotary position embeddings, grouped-query attention,
  SwiGLU MLP, optional per-head q/k RMSNorm (Qwen3), tied or untied head;
- static-shape KV cache decode identical in structure to the whisper
  decoder (one ``lax.while_loop`` in inference/generate.py);
- TP sharding specs in parallel/sharding_llm.py — Qwen3-32B needs the mesh
  (~18 GB at 4-bit, reference ``README.md:84``), one v5e chip has 16 GB;
- weights load from HF safetensors (checkpoint/qwen_loader.py) including
  mlx-community quantized exports (QuantTensor linears).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 151_936
    hidden_size: int = 2048
    intermediate_size: int = 11_008
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int | None = None  # explicit for Qwen3; hidden/heads otherwise
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    qk_norm: bool = False  # Qwen3: per-head RMSNorm on q and k
    max_position_embeddings: int = 32_768
    attention_bias: bool = True  # Qwen2: bias on q/k/v; Qwen3: False
    # Pallas flash kernel for prefill (t > 1). Constraint: prefill must
    # start at pos == 0 (all in-repo callers do); continuing prefill over an
    # existing cache needs the XLA path.
    flash_attention: bool = False
    # int8 KV cache (per-position absmax scales, exactly folded into the
    # attention algebra — same scheme as the whisper decoder,
    # ops/kv_quant.py): halves KV HBM traffic and doubles context per
    # chip. 0 = bf16 (bit-exact decode; the default).
    kv_bits: int = 0
    dtype: Any = jnp.float32

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


# The model sizes the reference exposes (reference llm.py:31-35: small=7B,
# medium=14B, large=32B) — dims from the public configs.
QWEN_CONFIGS: dict[str, QwenConfig] = {
    "qwen2.5-0.5b": QwenConfig(hidden_size=896, intermediate_size=4864,
                               num_hidden_layers=24, num_attention_heads=14,
                               num_key_value_heads=2, rope_theta=1e6),
    "qwen2.5-7b": QwenConfig(hidden_size=3584, intermediate_size=18944,
                             num_hidden_layers=28, num_attention_heads=28,
                             num_key_value_heads=4, tie_word_embeddings=False),
    "qwen2.5-14b": QwenConfig(hidden_size=5120, intermediate_size=13824,
                              num_hidden_layers=48, num_attention_heads=40,
                              num_key_value_heads=8, tie_word_embeddings=False),
    "qwen3-8b": QwenConfig(hidden_size=4096, intermediate_size=12288,
                           num_hidden_layers=36, num_attention_heads=32,
                           num_key_value_heads=8, head_dim=128, qk_norm=True,
                           attention_bias=False, tie_word_embeddings=False),
    "qwen3-32b": QwenConfig(hidden_size=5120, intermediate_size=25600,
                            num_hidden_layers=64, num_attention_heads=64,
                            num_key_value_heads=8, head_dim=128, qk_norm=True,
                            attention_bias=False, tie_word_embeddings=False),
}


def rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * g.astype(y.dtype)).astype(x.dtype)


def _linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    w = p["w"]
    if type(w).__name__ in ("QuantTensor", "NativeQuantTensor",
                            "DenseWeight", "QuantTensorT", "A8Tensor"):
        from whisper_mlx_tpu.ops.quant import quant_matmul

        y = quant_matmul(x, w)
    else:
        y = x @ w.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def rope_cos_sin(positions: jnp.ndarray, hd: int, theta: float, dtype) -> tuple:
    """cos/sin tables for given positions: (..., hd//2).

    inv_freq in float32 to match the reference family bit-for-bit (HF
    computes it in fp32; recomputing in fp64 drifts ~3e-4 at position 32k).
    """
    inv_freq = (1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float32) / np.float32(hd)))).astype(np.float32)
    angles = positions[..., None].astype(jnp.float32) * jnp.asarray(inv_freq)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (b, h, t, hd); cos/sin (t, hd//2) shared or (b, t, hd//2) per-row.
    HF 'rotate_half' convention."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    if cos.ndim == 3:  # per-row positions (continuous batching)
        c = cos[:, None, :, :]
        s = sin[:, None, :, :]
    else:
        c = cos[None, None, :, :]
        s = sin[None, None, :, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def init_kv_cache(config: QwenConfig, batch: int, max_len: int, dtype=None):
    """K/V cached TRANSPOSED (time-minor, (b, kv, hd, max_len)).

    The decode-step attention einsums then contract over the minor lane
    axis — measured +16–23% end-to-end RTF on the whisper decoder with the
    same change (bench_history.jsonl r2); the LLM decode loop has the same
    per-step cache-streaming shape. ``config.kv_bits`` 8/4 stores int8 /
    native-int4 entries + per-(b, kv, t) scales (int4 quarters KV HBM —
    4x the context per chip; quality bounds in docs/kv_quant_study.md).
    """
    dtype = dtype or config.dtype
    shape = (batch, config.num_key_value_heads, config.hd, max_len)
    if config.kv_bits in (4, 8):
        qdt = jnp.int8 if config.kv_bits == 8 else jnp.int4
        sshape = (batch, config.num_key_value_heads, max_len, 1)
        return [
            {"k8t": jnp.zeros(shape, qdt), "ks": jnp.zeros(sshape, jnp.bfloat16),
             "v8t": jnp.zeros(shape, qdt), "vs": jnp.zeros(sshape, jnp.bfloat16)}
            for _ in range(config.num_hidden_layers)
        ]
    return [
        {"kt": jnp.zeros(shape, dtype), "vt": jnp.zeros(shape, dtype)}
        for _ in range(config.num_hidden_layers)
    ]


def decode_step(
    params: Params,
    tokens: jnp.ndarray,  # (b, t)
    pos: jnp.ndarray,  # scalar first position, or (b,) per-row positions
    kv_cache: list[Params],
    config: QwenConfig,
):
    """Prefill (t>1) or incremental (t=1) step; returns (logits, new_cache).

    ``pos`` may be a (b,) vector — each batch row decodes at its own cache
    position (continuous batching: rows are independent in-flight requests,
    inference/batch_engine.py). Per-row mode uses per-row RoPE tables, a
    per-row causal mask, and a vmapped per-row cache scatter.
    """
    b, t = tokens.shape
    max_len = kv_cache[0]["kt" if "kt" in kv_cache[0] else "k8t"].shape[3]
    per_row = getattr(pos, "ndim", 0) == 1
    H, KV, hd = config.num_attention_heads, config.num_key_value_heads, config.hd
    x = (params["embed"].astype(config.dtype)[tokens]
         if type(params["embed"]).__name__ not in ("QuantTensor",
                                                   "NativeQuantTensor")
         else None)
    if x is None:
        from whisper_mlx_tpu.ops.quant import quant_rows

        x = quant_rows(params["embed"], tokens, dtype=config.dtype)

    if per_row:
        positions = pos[:, None] + jnp.arange(t)[None, :]  # (b, t)
        cos, sin = rope_cos_sin(positions, hd, config.rope_theta, jnp.float32)
        q_idx = jnp.arange(t)[None, :, None] + pos[:, None, None]  # (b, t, 1)
        k_idx = jnp.arange(max_len)[None, None, :]
        mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)  # (b, t, max_len)
        mask = mask[:, None]  # (b, 1, t, max_len) → broadcast over heads
    else:
        positions = pos + jnp.arange(t)
        cos, sin = rope_cos_sin(positions, hd, config.rope_theta, jnp.float32)
        q_idx = jnp.arange(t)[:, None] + pos
        k_idx = jnp.arange(max_len)[None, :]
        mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)

    new_cache = []
    for i, blk in enumerate(params["layers"]):
        h = rms_norm(x, blk["input_ln"], config.rms_norm_eps)
        if "qkv" in blk["attn"]:  # fused quantized projection
            # (ops/quant.py fuse_qwen_projections: exact row-stack)
            fused = _linear(h, blk["attn"]["qkv"])
            qw, kw = H * hd, KV * hd
            qf = fused[..., :qw]
            kf = fused[..., qw : qw + kw]
            vf = fused[..., qw + kw :]
        else:
            qf = _linear(h, blk["attn"]["q"])
            kf = _linear(h, blk["attn"]["k"])
            vf = _linear(h, blk["attn"]["v"])
        q = qf.reshape(b, t, H, hd).transpose(0, 2, 1, 3)
        k = kf.reshape(b, t, KV, hd).transpose(0, 2, 1, 3)
        v = vf.reshape(b, t, KV, hd).transpose(0, 2, 1, 3)
        if config.qk_norm:
            q = rms_norm(q, blk["attn"]["q_norm"], config.rms_norm_eps)
            k = rms_norm(k, blk["attn"]["k_norm"], config.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if config.kv_bits in (4, 8):
            from whisper_mlx_tpu.ops.kv_quant import quantize_kv

            k8, ks_new = quantize_kv(k, bits=config.kv_bits)
            v8, vs_new = quantize_kv(v, bits=config.kv_bits)
            kT = jnp.swapaxes(k8, 2, 3)  # (b,KV,hd,t)
            vT = jnp.swapaxes(v8, 2, 3)
            if per_row:
                sc3 = jax.vmap(
                    lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(c, u, p, axis=2)
                )
                sc1 = jax.vmap(
                    lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(c, u, p, axis=1)
                )
                entry = {
                    "k8t": sc3(kv_cache[i]["k8t"], kT, pos),
                    "ks": sc1(kv_cache[i]["ks"], ks_new, pos),
                    "v8t": sc3(kv_cache[i]["v8t"], vT, pos),
                    "vs": sc1(kv_cache[i]["vs"], vs_new, pos),
                }
            else:
                upd3 = lambda c, u: jax.lax.dynamic_update_slice_in_dim(c, u, pos, axis=3)
                upd2 = lambda c, u: jax.lax.dynamic_update_slice_in_dim(c, u, pos, axis=2)
                entry = {
                    "k8t": upd3(kv_cache[i]["k8t"], kT),
                    "ks": upd2(kv_cache[i]["ks"], ks_new),
                    "v8t": upd3(kv_cache[i]["v8t"], vT),
                    "vs": upd2(kv_cache[i]["vs"], vs_new),
                }
            new_cache.append(entry)
            kt_full, vt_full = entry["k8t"], entry["v8t"]
            kv_scales = (entry["ks"], entry["vs"])
        else:
            kT = jnp.swapaxes(k, 2, 3).astype(kv_cache[i]["kt"].dtype)  # (b,KV,hd,t)
            vT = jnp.swapaxes(v, 2, 3).astype(kv_cache[i]["vt"].dtype)
            if per_row:
                scatter = jax.vmap(
                    lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(c, u, p, axis=2)
                )
                kt_full = scatter(kv_cache[i]["kt"], kT, pos)
                vt_full = scatter(kv_cache[i]["vt"], vT, pos)
            else:
                kt_full = jax.lax.dynamic_update_slice_in_dim(kv_cache[i]["kt"], kT, pos, axis=3)
                vt_full = jax.lax.dynamic_update_slice_in_dim(kv_cache[i]["vt"], vT, pos, axis=3)
            new_cache.append({"kt": kt_full, "vt": vt_full})
            kv_scales = None

        rep = H // KV
        scale = 1.0 / math.sqrt(hd)
        if config.flash_attention and t > 1 and not per_row:
            # prefill via the Pallas flash kernel (causal); the convention
            # there is q/k each pre-scaled by hd**-0.25. Repeat GQA heads
            # for the kernel — prefill-only, so the materialization is a
            # one-time cost per request, not per decode step.
            from whisper_mlx_tpu.ops.flash_attention import flash_attention

            s4 = hd ** -0.25
            attn = flash_attention(
                (q * s4).astype(config.dtype),
                (jnp.repeat(k, rep, axis=1) * s4).astype(config.dtype),
                jnp.repeat(v, rep, axis=1).astype(config.dtype),
                causal=True,
            ).astype(jnp.float32)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t, H * hd)
        else:
            # grouped-GQA attention over the transposed cache: no
            # jnp.repeat — repeating KV to full heads would stream rep×
            # (8× on Qwen3-32B) the cache bytes per step if XLA failed to
            # fuse it. The einsum shares each KV head across its rep query
            # heads directly, contracting over the minor (lane) axis.
            q5 = q.reshape(b, KV, rep, t, hd)
            if kv_scales is not None:  # int8 cache: fold scales exactly
                ks_f, vs_f = kv_scales
                scores = jnp.einsum(
                    "bgrqd,bgdk->bgrqk", q5.astype(jnp.float32),
                    kt_full.astype(jnp.float32),
                ) * (ks_f[..., 0].astype(jnp.float32)[:, :, None, None, :] * scale)
                scores = scores + (mask[:, None] if per_row else mask)
                w = jax.nn.softmax(scores, axis=-1)
                w = w * vs_f[..., 0].astype(jnp.float32)[:, :, None, None, :]
                attn = jnp.einsum("bgrqk,bgdk->bgrqd", w,
                                  vt_full.astype(jnp.float32))
            else:
                scores = jnp.einsum("bgrqd,bgdk->bgrqk", q5, kt_full) * scale
                scores = scores.astype(jnp.promote_types(scores.dtype, jnp.float32))
                scores = scores + (mask[:, None] if per_row else mask)
                w = jax.nn.softmax(scores, axis=-1).astype(vt_full.dtype)
                attn = jnp.einsum("bgrqk,bgdk->bgrqd", w, vt_full)
            attn = attn.astype(config.dtype)
            attn = attn.reshape(b, H, t, hd).transpose(0, 2, 1, 3).reshape(b, t, H * hd)
        x = x + _linear(attn, blk["attn"]["o"])

        h = rms_norm(x, blk["post_ln"], config.rms_norm_eps)
        if "gate_up" in blk["mlp"]:  # fused quantized projection
            gu = _linear(h, blk["mlp"]["gate_up"])
            ffn = gu.shape[-1] // 2
            gate = jax.nn.silu(gu[..., :ffn])
            up = gu[..., ffn:]
        else:
            gate = jax.nn.silu(_linear(h, blk["mlp"]["gate"]))
            up = _linear(h, blk["mlp"]["up"])
        x = x + _linear(gate * up, blk["mlp"]["down"])

    x = rms_norm(x, params["final_ln"], config.rms_norm_eps)
    if config.tie_word_embeddings:
        from whisper_mlx_tpu.models.whisper import embed_logits

        logits = embed_logits(params["embed"], x, config.dtype)
    else:
        logits = _linear(x, params["lm_head"])
    return logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), new_cache


def init_params(config: QwenConfig, seed: int = 0, dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D, I = config.hidden_size, config.intermediate_size
    H, KV, hd = config.num_attention_heads, config.num_key_value_heads, config.hd

    def dense(n_in, n_out, bias=False):
        p = {"w": (rng.standard_normal((n_in, n_out)) / math.sqrt(n_in)).astype(np.float32)}
        if bias:
            p["b"] = np.zeros(n_out, np.float32)
        return p

    def layer():
        attn = {
            "q": dense(D, H * hd, config.attention_bias),
            "k": dense(D, KV * hd, config.attention_bias),
            "v": dense(D, KV * hd, config.attention_bias),
            "o": dense(H * hd, D),
        }
        if config.qk_norm:
            attn["q_norm"] = np.ones(hd, np.float32)
            attn["k_norm"] = np.ones(hd, np.float32)
        return {
            "input_ln": np.ones(D, np.float32),
            "attn": attn,
            "post_ln": np.ones(D, np.float32),
            "mlp": {"gate": dense(D, I), "up": dense(D, I), "down": dense(I, D)},
        }

    params: Params = {
        "embed": (rng.standard_normal((config.vocab_size, D)) * 0.02).astype(np.float32),
        "layers": [layer() for _ in range(config.num_hidden_layers)],
        "final_ln": np.ones(D, np.float32),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = dense(D, config.vocab_size)
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
