"""fuse_qwen_projections: fused q/k/v and gate/up must be exact.

Row-stacking group-quantized tensors is exact (per-output-row groups);
these tests pin prefill and incremental decode logits of the fused tree
to the unfused one (ops/quant.py fuse_qwen_projections, wired in
checkpoint/qwen_loader.py for quantized checkpoints).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from whisper_mlx_tpu.models import qwen
from whisper_mlx_tpu.ops.quant import QuantTensor, fuse_qwen_projections, quantize

CFG = dataclasses.replace(
    qwen.QWEN_CONFIGS["qwen2.5-7b"], hidden_size=128, intermediate_size=192,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, vocab_size=512, dtype=jnp.float32,
)
CFG3 = dataclasses.replace(  # qwen3-style: qk-norm, no attention bias
    CFG, qk_norm=True, attention_bias=False, tie_word_embeddings=False,
)


def _q_of(w_in_out):
    wq, sc, bi = quantize(np.asarray(w_in_out, np.float32).T, 4, 64)
    return QuantTensor(jnp.asarray(wq), jnp.asarray(sc), jnp.asarray(bi), 4, 64)


def _quantize_tree(node):
    if isinstance(node, dict):
        if "w" in node and getattr(node["w"], "ndim", 0) == 2 \
                and node["w"].shape[0] % 64 == 0:
            new = {"w": _q_of(node["w"])}
            if "b" in node:
                new["b"] = node["b"]
            return new
        return {k: _quantize_tree(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_quantize_tree(v) for v in node]
    return node


def _fused_pair(cfg):
    params = qwen.init_params(cfg, seed=0)
    qp = {k: (_quantize_tree(v) if k in ("layers", "lm_head") else v)
          for k, v in params.items()}
    return qp, fuse_qwen_projections(qp)


def _check(cfg):
    qp, fp = _fused_pair(cfg)
    assert "qkv" in fp["layers"][0]["attn"]
    assert "gate_up" in fp["layers"][0]["mlp"]
    rng = np.random.default_rng(0)
    cache = qwen.init_kv_cache(cfg, 2, 16)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
    l1, c1 = qwen.decode_step(qp, toks, jnp.int32(0), cache, cfg)
    l2, c2 = qwen.decode_step(fp, toks, jnp.int32(0), cache, cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)
    n1, _ = qwen.decode_step(qp, toks[:, :1], jnp.int32(5), c1, cfg)
    n2, _ = qwen.decode_step(fp, toks[:, :1], jnp.int32(5), c2, cfg)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-4)


def test_fused_projections_exact_qwen2():
    _check(CFG)


def test_fused_projections_exact_qwen3_layout():
    _check(CFG3)
