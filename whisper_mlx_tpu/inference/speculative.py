"""Speculative decoding for the LLM engine (greedy, exactness-preserving).

The reference's chat serving is single-stream (one generation at a time
behind the global lock — SURVEY.md §2.4), which makes decode LATENCY the
user-facing metric. Speculative decoding attacks it: a small draft model
proposes ``k`` tokens; the target model verifies all of them in ONE
prefill-shaped forward (k+1 positions instead of k+1 sequential steps).
With greedy acceptance the output is PROVABLY identical to target-only
greedy decoding: accept the longest prefix where each draft token equals
the target's argmax at that position; the target's argmax at the first
mismatch (or the bonus position after full acceptance) becomes the next
committed token — exactly sequential greedy's choice at every step.

Invariants (absolute sequence S = prompt + committed tokens):
- target cache holds KV for S[:t_pos]; ``next_tok`` = S's next committed
  token, not yet in any cache;
- draft cache holds KV for S[:d_pos] plus garbage beyond, which the next
  sync block overwrites before the causal mask can expose it (same
  argument as prompt-length bucketing in inference/generate.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.models.qwen import (
    Params,
    QwenConfig,
    decode_step,
    init_kv_cache,
)


@dataclass
class SpecStats:
    proposed: int = 0
    accepted: int = 0
    target_calls: int = 0
    draft_calls: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)


def speculative_generate(
    target_params: Params,
    target_config: QwenConfig,
    draft_params: Params,
    draft_config: QwenConfig,
    prompt_ids: list[int],
    max_tokens: int,
    stop_ids: set[int],
    k: int = 4,
    max_len: int = 2048,
) -> tuple[list[int], SpecStats]:
    """Greedy speculative decode → (generated tokens, stats).

    Output is token-identical to greedy decoding with the target alone
    (asserted by tests against the vanilla loop).
    """
    stats = SpecStats()
    S = list(prompt_ids)

    t_cache = init_kv_cache(target_config, 1, max_len)
    d_cache = init_kv_cache(draft_config, 1, max_len)

    prompt = jnp.asarray([S], jnp.int32)
    t_logits, t_cache = decode_step(target_params, prompt, jnp.int32(0), t_cache, target_config)
    stats.target_calls += 1
    _, d_cache = decode_step(draft_params, prompt, jnp.int32(0), d_cache, draft_config)
    stats.draft_calls += 1
    t_pos = len(S)
    d_pos = len(S)
    next_tok = int(jnp.argmax(t_logits[0, -1]))

    out: list[int] = []
    while len(out) < max_tokens:
        S.append(next_tok)
        out.append(next_tok)
        if next_tok in stop_ids or len(out) >= max_tokens:
            break

        # ---- draft: sync to the frontier, then propose ---------------------
        sync = S[d_pos:]  # ≥1 tokens (at least next_tok); overwrites garbage
        d_logits, d_cache = decode_step(
            draft_params, jnp.asarray([sync], jnp.int32), jnp.int32(d_pos),
            d_cache, draft_config,
        )
        stats.draft_calls += 1
        d_step_pos = len(S)
        proposals: list[int] = [int(jnp.argmax(d_logits[0, -1]))]
        budget = min(k, max_tokens - len(out))
        while len(proposals) < budget and proposals[-1] not in stop_ids:
            d_logits, d_cache = decode_step(
                draft_params, jnp.asarray([[proposals[-1]]], jnp.int32),
                jnp.int32(d_step_pos), d_cache, draft_config,
            )
            stats.draft_calls += 1
            d_step_pos += 1
            proposals.append(int(jnp.argmax(d_logits[0, -1])))
        d_pos = len(S)  # proposal writes beyond len(S) are garbage-until-sync
        stats.proposed += len(proposals)

        # ---- target: verify [next_tok, *proposals] in one forward ----------
        block = [next_tok] + proposals
        t_logits, t_cache = decode_step(
            target_params, jnp.asarray([block], jnp.int32), jnp.int32(t_pos),
            t_cache, target_config,
        )
        stats.target_calls += 1
        target_greedy = np.asarray(jnp.argmax(t_logits[0], axis=-1))
        # target_greedy[i] = target's token for sequence position t_pos+i+1

        n_accept = 0
        for i, proposal in enumerate(proposals):
            if int(target_greedy[i]) == proposal:
                n_accept += 1
                if proposal in stop_ids:
                    break
            else:
                break
        stats.accepted += n_accept

        accepted = proposals[:n_accept]
        take = accepted[: max_tokens - len(out)]
        S.extend(take)
        out.extend(take)
        if len(out) >= max_tokens or (take and take[-1] in stop_ids):
            break

        # committed target KV now covers S (positions t_pos..t_pos+n_accept
        # hold [next_tok, *accepted]); garbage beyond is overwritten before
        # the causal mask exposes it
        t_pos = t_pos + n_accept + 1
        next_tok = int(target_greedy[n_accept])

    return out, stats
