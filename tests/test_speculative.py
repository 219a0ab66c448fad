"""Speculative decoding: EXACT equivalence with target-only greedy.

The defining property of greedy speculative decoding — any draft model
(even an adversarially different random one) must leave the output
token-identical to vanilla greedy decoding of the target.
"""

import numpy as np
import pytest

import torch  # noqa: F401
import jax.numpy as jnp

from whisper_mlx_tpu.inference.speculative import speculative_generate
from whisper_mlx_tpu.models.qwen import QwenConfig, decode_step, init_kv_cache, init_params


def _vanilla_greedy(params, config, prompt_ids, max_tokens, stop_ids, max_len=256):
    cache = init_kv_cache(config, 1, max_len)
    logits, cache = decode_step(
        params, jnp.asarray([prompt_ids], jnp.int32), jnp.int32(0), cache, config
    )
    pos = len(prompt_ids)
    tok = int(jnp.argmax(logits[0, -1]))
    out = []
    while len(out) < max_tokens:
        out.append(tok)
        if tok in stop_ids:
            break
        logits, cache = decode_step(
            params, jnp.asarray([[tok]], jnp.int32), jnp.int32(pos), cache, config
        )
        pos += 1
        tok = int(jnp.argmax(logits[0, -1]))
    return out


@pytest.fixture(scope="module")
def models():
    target_cfg = QwenConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
    )
    draft_cfg = QwenConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        rope_theta=10_000.0, tie_word_embeddings=True, attention_bias=True,
    )
    return (init_params(target_cfg, seed=0), target_cfg,
            init_params(draft_cfg, seed=99), draft_cfg)


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("seed", [0, 1])
def test_speculative_equals_vanilla_greedy(models, k, seed):
    tp, tc, dp, dc = models
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 256, size=8).tolist()
    stop_ids = {7}  # arbitrary; may or may not be hit

    ref = _vanilla_greedy(tp, tc, prompt, max_tokens=24, stop_ids=stop_ids)
    out, stats = speculative_generate(
        tp, tc, dp, dc, prompt, max_tokens=24, stop_ids=stop_ids, k=k, max_len=256,
    )
    assert out == ref, f"k={k} seed={seed}: {out} != {ref}"
    assert stats.proposed >= stats.accepted >= 0
    assert stats.target_calls >= 1


def test_speculative_self_draft_accepts_everything(models):
    """Draft == target → acceptance rate 1.0 and far fewer target calls."""
    tp, tc, _, _ = models
    prompt = [3, 50, 120]
    ref = _vanilla_greedy(tp, tc, prompt, max_tokens=20, stop_ids=set())
    out, stats = speculative_generate(
        tp, tc, tp, tc, prompt, max_tokens=20, stop_ids=set(), k=4, max_len=256,
    )
    assert out == ref
    assert stats.acceptance_rate == 1.0
    # 20 tokens with k=4: prefill + ~4-5 verify calls instead of 20 steps
    assert stats.target_calls <= 7
