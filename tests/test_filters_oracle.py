"""Timestamp-rule parity vs transformers' WhisperTimeStampLogitsProcessor.

An independent implementation of the same published decode grammar; our
vectorized `_timestamp_rules` must produce identical masks and surviving
logits for random histories — this is the strongest offline check of the
grammar that drives golden-token parity (SURVEY.md §7 hard part).
"""

import numpy as np
import pytest

import torch
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.filters import FilterConfig, _timestamp_rules
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer


def _oracle(scores: np.ndarray, input_ids: np.ndarray, tok, sample_begin: int,
            max_initial_idx: int):
    from transformers import GenerationConfig
    from transformers.models.whisper.generation_whisper import (
        WhisperTimeStampLogitsProcessor,
    )

    cfg = GenerationConfig(
        no_timestamps_token_id=tok.no_timestamps,
        eos_token_id=tok.eot,
        max_initial_timestamp_index=max_initial_idx,
        decoder_start_token_id=tok.sot,
    )
    proc = WhisperTimeStampLogitsProcessor(cfg, begin_index=sample_begin)
    out = proc(torch.from_numpy(input_ids), torch.from_numpy(scores.copy()))
    return out.numpy()


def _ours(scores: np.ndarray, input_ids: np.ndarray, tok, sample_begin: int,
          max_initial_idx: int, n_ctx: int):
    b, cur_len = input_ids.shape
    buf = np.zeros((b, n_ctx), np.int32)
    buf[:, :cur_len] = input_ids
    fc = FilterConfig(
        eot=tok.eot, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin, sample_begin=sample_begin,
        max_initial_timestamp_index=max_initial_idx,
    )
    out = _timestamp_rules(
        jnp.asarray(scores), jnp.asarray(buf), jnp.int32(cur_len), fc
    )
    return np.asarray(out)


@pytest.mark.parametrize("seed", range(6))
def test_timestamp_rules_match_transformers(seed):
    tok = make_synthetic_tokenizer()
    n_vocab = tok.n_vocab
    n_ctx = 64
    sample_begin = 3
    rng = np.random.default_rng(seed)

    histories = {
        0: [],  # at begin: first-token rule
        1: [tok.timestamp_begin + 5],  # single timestamp → force text/eot? (pair rule)
        2: [tok.timestamp_begin + 5, 40],  # ts then text
        3: [tok.timestamp_begin + 5, tok.timestamp_begin + 5],  # consecutive pair
        4: [40, 41, tok.timestamp_begin + 9, tok.timestamp_begin + 12],  # monotonicity state
        5: list(rng.integers(0, n_vocab, size=7)),  # random garbage history
    }[seed % 6]

    sot_seq = [tok.sot, tok.language_token("en"), tok.transcribe]
    input_ids = np.asarray([sot_seq + list(map(int, histories))], np.int64)
    scores = rng.standard_normal((1, n_vocab)).astype(np.float32)

    ref = _oracle(scores, input_ids, tok, sample_begin, 50)
    got = _ours(scores, input_ids.astype(np.int32), tok, sample_begin, 50, n_ctx)

    ref_inf = np.isneginf(ref)
    got_inf = got <= -1e30  # our NEG_INF representation
    np.testing.assert_array_equal(got_inf, ref_inf, err_msg=f"mask mismatch seed={seed}")
    np.testing.assert_allclose(
        np.where(ref_inf, 0.0, got), np.where(ref_inf, 0.0, ref), atol=1e-6
    )
