"""Logit filters as pure, batched JAX functions (jit-safe, fixed shapes).

The reference's decode path applies these inside Python per step (mlx_whisper
``decoding.py`` semantics — SURVEY.md §2.1 "Decoding strategies"): suppress
lists, blank suppression at the start, and the timestamp grammar. Here each
filter is a pure ``(logits, tokens, cur_len) -> logits`` function over the
fixed (batch, n_ctx) token buffer so the whole decode loop stays inside one
``lax.while_loop`` — no host round-trips per token.

Filter semantics follow the public Whisper decoding rules:
- ``suppress_mask``: -inf at a precomputed set of token ids (non-speech
  symbols, sot/notimestamps/etc.);
- blank suppression: at the first sampled position, " " and EOT;
- timestamp rules: timestamps come in pairs, are monotonically
  non-decreasing, the first sampled token must be a timestamp (bounded by
  ``max_initial_timestamp``), and when the total timestamp probability mass
  beats every text token, a timestamp must be sampled.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


@dataclass(frozen=True)
class FilterConfig:
    """Static decode-filter configuration (hashable; jit-static)."""

    eot: int
    no_timestamps: int
    timestamp_begin: int
    sample_begin: int  # index of the first *sampled* position in the buffer
    max_initial_timestamp_index: int | None = 50  # 1.0 s default
    apply_timestamp_rules: bool = True


def make_suppress_mask(
    n_vocab: int,
    suppress_ids: tuple[int, ...],
    blank_ids: tuple[int, ...],
) -> tuple[np.ndarray, np.ndarray]:
    """Boolean (n_vocab,) masks: always-suppressed ids / begin-only ids."""
    always = np.zeros(n_vocab, bool)
    always[list(suppress_ids)] = True
    begin = np.zeros(n_vocab, bool)
    begin[list(blank_ids)] = True
    return always, begin


def apply_filters(
    logits: jnp.ndarray,  # (batch, n_vocab) fp32
    tokens: jnp.ndarray,  # (batch, n_ctx) int32 buffer, valid up to cur_len
    cur_len: jnp.ndarray,  # scalar int32: number of valid tokens
    suppress_mask: jnp.ndarray,  # (n_vocab,) bool
    blank_mask: jnp.ndarray,  # (n_vocab,) bool
    cfg: FilterConfig,
) -> jnp.ndarray:
    logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)

    at_begin = cur_len == cfg.sample_begin
    logits = jnp.where(at_begin & blank_mask[None, :], NEG_INF, logits)

    if cfg.apply_timestamp_rules:
        logits = _timestamp_rules(logits, tokens, cur_len, cfg)
    return logits


def _timestamp_rules(
    logits: jnp.ndarray,
    tokens: jnp.ndarray,
    cur_len: jnp.ndarray,
    cfg: FilterConfig,
) -> jnp.ndarray:
    b, n_vocab = logits.shape
    n_ctx = tokens.shape[1]
    ts_begin = cfg.timestamp_begin
    vocab_idx = jnp.arange(n_vocab)[None, :]  # (1, n_vocab)
    is_ts_col = vocab_idx >= ts_begin
    is_text_col = vocab_idx < cfg.eot

    # <|notimestamps|> is never sampled when rules are on
    logits = jnp.where(vocab_idx == cfg.no_timestamps, NEG_INF, logits)

    # last / penultimate sampled tokens (guarded when fewer than 1/2 sampled)
    has_last = cur_len > cfg.sample_begin
    has_penult = cur_len > cfg.sample_begin + 1
    last = tokens[:, jnp.maximum(cur_len - 1, 0)]
    penult = tokens[:, jnp.maximum(cur_len - 2, 0)]
    last_was_ts = has_last & (last >= ts_begin)
    penult_was_ts = jnp.where(has_penult, penult >= ts_begin, True)

    # pair grammar: ts,ts -> must emit text; x,ts -> must emit ts or EOT
    force_text = last_was_ts & penult_was_ts
    force_ts = last_was_ts & ~penult_was_ts
    logits = jnp.where(force_text[:, None] & is_ts_col, NEG_INF, logits)
    logits = jnp.where(force_ts[:, None] & is_text_col, NEG_INF, logits)

    # monotonicity: suppress timestamps below the running max
    pos = jnp.arange(n_ctx)[None, :]
    sampled = (pos >= cfg.sample_begin) & (pos < cur_len)
    ts_vals = jnp.where(sampled & (tokens >= ts_begin), tokens, -1)
    max_ts = jnp.max(ts_vals, axis=1)  # (batch,), -1 if none
    has_ts = max_ts >= 0
    ts_floor = jnp.where(force_ts, max_ts, max_ts + 1)  # whisper's off-by-one rule
    low_ts = has_ts[:, None] & is_ts_col & (vocab_idx < ts_floor[:, None])
    logits = jnp.where(low_ts, NEG_INF, logits)

    # first sampled token must be a timestamp (everything below ts_begin —
    # text, EOT and specials alike — is suppressed), bounded by
    # max_initial_timestamp
    at_begin = cur_len == cfg.sample_begin
    logits = jnp.where(at_begin & (vocab_idx < ts_begin), NEG_INF, logits)
    if cfg.max_initial_timestamp_index is not None:
        last_allowed = ts_begin + cfg.max_initial_timestamp_index
        logits = jnp.where(at_begin & (vocab_idx > last_allowed), NEG_INF, logits)

    # if total timestamp probability beats every text token, force a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
    )  # (batch,)
    max_text_logprob = jnp.max(
        jnp.where(vocab_idx < ts_begin, logprobs, NEG_INF), axis=-1
    )
    force = ts_logprob > max_text_logprob
    logits = jnp.where(force[:, None] & (vocab_idx < ts_begin), NEG_INF, logits)
    return logits
