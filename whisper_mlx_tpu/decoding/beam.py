"""Vectorized beam search, fully jitted (fixed shapes, no host loop).

The reference's beam search (mlx_whisper ``decoding.py`` semantics —
SURVEY.md §2.1) keeps Python dicts of hypotheses per step. TPU-native
design (cf. PAPERS.md vectorized beam-search refs): hypotheses live in a
``(windows, beam, ctx)`` token buffer, one ``lax.while_loop`` advances all
windows × beams together, and the self-KV cache uses INDIRECTION
addressing — each lane writes its own row; a tiny ``(N*B, T)`` ancestry
matrix (reordered by parent each step) maps positions to owning lanes
inside attention (ops/kv_quant.py attention_*_ancestry). The cache itself
is never gathered/rewritten (the old per-step parent gather re-wrote every
cache byte at below copy bandwidth — r2's measured beam bottleneck).

Semantics preserved from the reference:
- candidates enumerated best-first; EOT-ended ones feed a finished pool
  (capacity ``round(beam_size * patience)``, no replacement once full —
  matching the reference's insertion-only dict), others refill the B live
  beams — top-2B is sufficient since EOT contributes ≤1 candidate per beam;
- step 0 proposes from beam 0 only (live beams start identical);
- finalize ranks finished hypotheses by GoogleNMT length penalty
  (``((5+L)/6)**lp``, or plain length normalization when lp is None).

Hypothesis uniqueness: the reference dedupes identical hypothesis strings
via dict keys. Here duplicates are structurally impossible instead — step 0
leaves a single live beam (the rest are -inf-masked), and every later step's
candidates are (parent, token) pairs over pairwise-distinct parent
sequences, so live beams stay pairwise distinct by induction; the finished
pool inherits distinctness (finished-at-step-t and backfilled-live entries
also differ in length). The final backfill adds each live beam at most once
(slots beyond ``fin_count + B`` stay -inf). Tie-breaking matches the
reference's stable ordering: both resolve equal scores lexicographically by
(parent, token id) — ``lax.top_k`` over the flattened (B*V) axis breaks
ties by flat index, the reference's stable sort by insertion order.
Verified by the tie-heavy distinctness + host-equivalence tests in
tests/test_beam.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_mlx_tpu.decoding.filters import FilterConfig, apply_filters
from whisper_mlx_tpu.models.whisper import (
    Params,
    WhisperConfig,
    cross_kv,
    decode_step,
    init_kv_cache,
)

NEG_INF = float("-inf")

# test hook: forces the iterative branch on non-TPU backends
_FORCE_ITER = False


def _topk_flat(cand: jnp.ndarray, k: int):
    """Exact top-k over the last axis, tie-break-identical to lax.top_k
    (equal values surface in ascending flat index — argmax returns the
    FIRST max, and masking it makes the next equal value the next pick).

    On TPU, ``lax.top_k`` over the (N, B·V≈260k) beam candidate row lowers
    to a sort and measured 1.62 ms/step; k rounds of masked argmax stream
    the row k+? times at the HBM rate and measured 0.73 ms (r4 probe,
    N=1000 scan, value+index equality asserted against lax.top_k). Other
    backends keep lax.top_k (CPU argmax rounds are slower, parity is
    dtype-exact either way)."""
    if (jax.default_backend() != "tpu" or k > 16) and not _FORCE_ITER:
        return jax.lax.top_k(cand, k)
    # Argmax rounds run on a MONOTONE uint32 order-key, not the floats:
    # picked entries are masked to key 0, which is strictly below every
    # real key — masking the float with -inf cannot exclude entries that
    # ARE -inf (beam rows start fully -inf-masked), and lax.top_k must be
    # matched index-for-index there too. No NaNs reach this point (cand is
    # cum_logprob + log_softmax of finite logits, -inf only from masking).
    bits = jax.lax.bitcast_convert_type(cand.astype(jnp.float32), jnp.uint32)
    neg = bits >= jnp.uint32(0x80000000)
    work = jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))
    iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
    scores, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(work, axis=-1).astype(jnp.int32)
        scores.append(jnp.take_along_axis(cand, i[:, None], axis=-1)[:, 0])
        idxs.append(i)
        work = jnp.where(iota == i[:, None], jnp.uint32(0), work)
    return jnp.stack(scores, axis=-1), jnp.stack(idxs, axis=-1)


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (N, P, ctx) finished hypotheses (EOT-terminated)
    lengths: jnp.ndarray  # (N, P) sampled length before EOT
    scores: jnp.ndarray  # (N, P) raw sum_logprobs (incl. EOT)
    fin_count: jnp.ndarray  # (N,) valid finished hypotheses
    no_speech_probs: jnp.ndarray  # (N,)


@partial(
    jax.jit,
    static_argnames=("config", "filter_cfg", "sample_len", "sot_index",
                     "beam_size", "pool_size", "phases", "kv_scheme",
                     "window"),
)
def beam_decode(
    params: Params,
    audio_states: jnp.ndarray,  # (N, 1500, d)
    initial_tokens: jnp.ndarray,  # (N, n_init)
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    config: WhisperConfig,
    filter_cfg: FilterConfig,
    sample_len: int,
    sot_index: int,
    no_speech_token: int,
    beam_size: int,
    pool_size: int,
    phases: "tuple[int, ...] | None" = None,
    kv_scheme: str = "flat",
    window: "int | None" = None,  # shared-scheme F read width (positions)
) -> BeamResult:
    N, n_init = initial_tokens.shape
    B, P = beam_size, pool_size
    n_ctx = config.n_text_ctx
    eot = filter_cfg.eot
    NB = N * B

    # packed quant params only reach here at few-row shapes (see greedy.py)
    # cross K/V are beam-invariant (pure function of the audio): computed
    # ONCE per window and SHARED across the B hypothesis rows via grouped
    # cross-attention (share_xkv_groups) — replicating them multiplied the
    # decode loop's dominant HBM stream by B.
    xkv = cross_kv(params, audio_states, config)
    if config.self_kv_layout != "tminor":
        # beam converts the prefilled cache to its own lane-interleaved
        # FLAT layout below; the greedy tmajor layout does not apply here
        import dataclasses

        config = dataclasses.replace(config, self_kv_layout="tminor")
    # growing-cache phase ladder (same rationale/eligibility as
    # decoding/greedy.py): every step re-reads the WHOLE self-KV
    # allocation, so early steps must not stream dead tail positions.
    # tminor rounds T to 128-lane tiles — one boundary at 128 is all that
    # helps at a 224-step horizon (reads avg T≈184 instead of 256).
    horizon = n_init + sample_len
    if phases is None:
        phases = (128,)
    phase_bounds = [b for b in sorted(set(phases))
                    if n_init + 1 < b and horizon > b + 32]
    # kv_scheme="shared": F (the flat per-lane cache) is allocated at the
    # FULL horizon up front — its reads are windowed (W columns via
    # per-window dynamic slices), so the phase ladder only governs the
    # shared-prefix buffer S's width
    shared = kv_scheme == "shared"
    shared_window = int(window) if window else 64
    cache = init_kv_cache(
        config, NB,
        max_len=horizon if shared
        else (phase_bounds[0] if phase_bounds else horizon))
    t_alloc = (cache[0]["k8t"].shape[3] if "k8t" in cache[0]
               else cache[0]["k"].shape[2])
    # indirection-addressed cache (VERDICT r2 item 3): the cache is NEVER
    # gathered/reordered by parent — each lane writes its own row, and the
    # ancestry matrix maps (lane, position) → the lane whose row holds that
    # hypothesis's K/V (ops/kv_quant.py attention_*_ancestry). The old
    # per-step whole-cache gather read+rewrote every cache byte at well
    # below copy bandwidth.
    own_lane = jnp.tile(jnp.arange(B, dtype=jnp.int32), (N,))  # (NB,)
    anc0 = jnp.tile(own_lane[:, None], (1, t_alloc))  # prefill rows are own

    if kv_scheme not in ("flat", "shared", "perm", "permg", "permp",
                         "permi"):
        raise ValueError(f"unknown beam kv_scheme {kv_scheme!r}")

    def _permute_lanes(a, oh, flat_parent):
        """Physically reorder lanes of a (NB, ...) cache tensor within each
        window's B-lane group by the parent map (classic beam reorder).

        ``perm`` lowers it as a (N, B, B) one-hot matmul on the MXU — bf16
        for int8/int4 codes (|code| ≤ 127 is exact in bf16 and exactly one
        term of the contraction is nonzero, so the round-trip is lossless).
        ``permg`` is XLA's gather. Both measured far below copy bandwidth
        (scripts/profile_beam.py PROF_PERM) — ``permp`` (the Pallas DMA
        kernel, handled by the caller) is the production lowering."""
        if kv_scheme == "permg":
            return jnp.take(a, flat_parent, axis=0)
        x = a.reshape(N, B, -1)
        if a.dtype in (jnp.int8, jnp.int4):
            out = jnp.einsum("nbk,nkx->nbx", oh.astype(jnp.bfloat16),
                             x.astype(jnp.bfloat16))
        else:
            out = jnp.einsum("nbk,nkx->nbx", oh.astype(x.dtype), x)
        return out.astype(a.dtype).reshape(a.shape)

    _pallas_interpret = jax.default_backend() != "tpu"

    def _move_entry(e, src, src_flat):
        """permi: in-place copy-on-divergence row moves for one layer."""
        if not any(v.dtype == jnp.int4 for v in e.values()):
            from whisper_mlx_tpu.ops.lane_permute import lane_move_inplace

            keys = sorted(e)
            outs = lane_move_inplace([e[k] for k in keys], src_flat,
                                     interpret=_pallas_interpret)
            return dict(zip(keys, outs))
        # int4 fallback: src is still a lane map — apply it as a one-hot
        # matmul (no s4 block DMA in Mosaic)
        oh_src = jax.nn.one_hot(src, B, dtype=jnp.float32)
        return {k: _permute_lanes(v, oh_src, src_flat) for k, v in e.items()}

    def _permute_entry(e, oh, flat_parent):
        """Permute one layer's cache entry (dict of (NB, ...) tensors)."""
        if kv_scheme == "permp" and not any(
                v.dtype == jnp.int4 for v in e.values()):
            from whisper_mlx_tpu.ops.lane_permute import permute_lanes

            keys = sorted(e)
            outs = permute_lanes([e[k] for k in keys], flat_parent,
                                 interpret=_pallas_interpret)
            return dict(zip(keys, outs))
        # int4 blocks fall back to the one-hot matmul (Mosaic has no s4
        # block DMA); int4 self-KV is opt-in (docs/kv_quant_study.md)
        return {k: _permute_lanes(v, oh, flat_parent) for k, v in e.items()}

    init_flat = jnp.repeat(initial_tokens, B, axis=0)
    logits_all, cache, _ = decode_step(params, init_flat, jnp.int32(0), cache,
                                       xkv, config, share_xkv_groups=B)
    # Convert the prefilled self-KV cache to the beam lane-INTERLEAVED
    # flat layout (one-time, outside the loop): column t*B + k of the
    # time axis holds lane k's position t. In the loop the step write is
    # one contiguous B-column dynamic_update_slice and attention is a
    # plain batched matmul over T*B keys — the greedy path's measured
    # lowering (the 5-D grouped ancestry form forced XLA to stage + copy
    # the whole carried cache every step: +3.56 s/batch at beam5/B=12,
    # scripts/profile_beam.py).
    def _to_flat(entry):
        if "k8t" in entry:
            def flat_kv(a):  # (NB, h, d, T) -> (N, h, d, T*B)
                nb, hh, dd, tt = a.shape
                return (a.reshape(N, B, hh, dd, tt).transpose(0, 2, 3, 4, 1)
                        .reshape(N, hh, dd, tt * B))

            def flat_s(s):  # (NB, h, T, 1) -> (N, h, T*B, 1)
                nb, hh, tt, _ = s.shape
                return (s[..., 0].reshape(N, B, hh, tt).transpose(0, 2, 3, 1)
                        .reshape(N, hh, tt * B)[..., None])

            return {"k8f": flat_kv(entry["k8t"]), "ksf": flat_s(entry["ks"]),
                    "v8f": flat_kv(entry["v8t"]), "vsf": flat_s(entry["vs"])}

        def flat_fp(a):  # (NB, h, T, d) -> (N, h, T*B, d)
            nb, hh, tt, dd = a.shape
            return (a.reshape(N, B, hh, tt, dd).transpose(0, 2, 3, 1, 4)
                    .reshape(N, hh, tt * B, dd))

        return {"kf": flat_fp(entry["k"]), "vf": flat_fp(entry["v"])}

    def _ts_of(bound: int) -> int:
        """S-buffer width for a segment bound (same 128-lane rounding as
        init_kv_cache, capped at the F allocation's T)."""
        return min(-(-bound // 128) * 128, t_alloc)

    def _build_S(cache_flat, anc, s_fill, Ts):
        """(Re)build the shared-prefix buffers: S[:, …, t] = the agreed
        lane's F column for t < s_fill (one gather per layer — runs at
        init and phase boundaries only)."""
        t_idx = jnp.arange(Ts)
        lane_t = anc.reshape(N, B, -1)[:, 0, :Ts]  # agreed region: row 0
        idx = jnp.clip(t_idx[None, :], 0, t_alloc - 1) * B + lane_t  # (N,Ts)
        out = []
        for e in cache_flat:
            if "k8f" in e:
                gcol = lambda a: jnp.take_along_axis(
                    a, idx[:, None, None, :], axis=3)
                gsc = lambda s_: jnp.take_along_axis(
                    s_, idx[:, None, :, None], axis=2)
                out.append({**e, "sk8": gcol(e["k8f"]), "sks": gsc(e["ksf"]),
                            "sv8": gcol(e["v8f"]), "svs": gsc(e["vsf"])})
            else:
                gcol = lambda a: jnp.take_along_axis(
                    a, idx[:, None, :, None], axis=2)
                out.append({**e, "skf": gcol(e["kf"]), "svf": gcol(e["vf"])})
        return out

    def _strip_S(entries):
        return [{k: v for k, v in e.items()
                 if k not in ("sk8", "sks", "sv8", "svs", "skf", "svf")}
                for e in entries]

    if kv_scheme == "shared" and config.self_kv_bits == 4:
        raise ValueError("kv_scheme='shared' requires self_kv_bits in "
                         "(0, 8) — no s4 gather on this backend")
    if kv_scheme == "shared":
        cache = [_to_flat(e) for e in cache]
        s_fill0 = jnp.full((N,), n_init, jnp.int32)
        ts0 = _ts_of(phase_bounds[0] if phase_bounds else horizon)
        cache = _build_S(cache, anc0, s_fill0, ts0)
    elif kv_scheme == "flat":
        cache = [_to_flat(e) for e in cache]
    elif kv_scheme == "permi":
        # copy-on-divergence: plain per-lane layout; the carried (N, B)
        # matrix maps logical beam j -> the LANE holding its cache row
        # (rows stay put unless a parent spawns extra children)
        anc0 = jnp.tile(jnp.arange(B, dtype=jnp.int32)[None, :], (N, 1))
    else:
        # perm/permg/permp keep the plain per-lane (greedy) layout;
        # ancestry is unused (the cache is physically reordered each step).
        anc0 = jnp.zeros((1, 1), jnp.int32)
    no_speech_probs = jax.nn.softmax(
        logits_all[::B, sot_index].astype(jnp.float32), axis=-1
    )[:, no_speech_token]
    last_logits = logits_all[:, -1].astype(jnp.float32)  # (N*B, V)

    tokens0 = jnp.zeros((NB, n_ctx), jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, init_flat.astype(jnp.int32), (0, 0))

    class State(NamedTuple):
        tokens: jnp.ndarray  # (N*B, ctx)
        cum_logprob: jnp.ndarray  # (N, B)
        logits: jnp.ndarray  # (N*B, V)
        cache: list
        anc: jnp.ndarray  # (N*B, t_alloc) ancestry: lane owning each position
        cur_len: jnp.ndarray
        fin_tokens: jnp.ndarray  # (N, P, ctx)
        fin_lengths: jnp.ndarray  # (N, P)
        fin_scores: jnp.ndarray  # (N, P)
        fin_count: jnp.ndarray  # (N,)
        # kv_scheme="shared" only (dummies otherwise): per-window count of
        # agreed positions committed to the single-copy S buffers, and the
        # fast-loop exit flag (divergence outgrew the W read window)
        s_fill: jnp.ndarray = jnp.zeros((1,), jnp.int32)
        overflow: jnp.ndarray = jnp.asarray(False)

    # step 0: only beam 0 is live (all beams identical after prefill)
    cum0 = jnp.where(jnp.arange(B)[None, :] == 0, 0.0, NEG_INF)
    cum0 = jnp.tile(cum0, (N, 1))

    state = State(
        tokens=tokens0,
        cum_logprob=cum0,
        logits=last_logits,
        cache=cache,
        anc=anc0,
        cur_len=jnp.int32(n_init),
        fin_tokens=jnp.zeros((N, P, n_ctx), jnp.int32),
        fin_lengths=jnp.zeros((N, P), jnp.int32),
        fin_scores=jnp.full((N, P), NEG_INF, jnp.float32),
        fin_count=jnp.zeros((N,), jnp.int32),
        s_fill=(jnp.full((N,), n_init, jnp.int32) if kv_scheme == "shared"
                else jnp.zeros((1,), jnp.int32)),
        overflow=jnp.asarray(False),
    )
    max_len = min(n_init + sample_len, n_ctx)
    V = config.n_vocab
    K = 2 * B  # top-K candidates per window (≥B non-EOT guaranteed)

    def cond(s: State):
        return (s.cur_len < max_len) & ~jnp.all(s.fin_count >= P)

    def body(s: State, scheme: str = kv_scheme) -> State:
        if scheme == "permi":
            # decode_step returns LANE-ordered logits; selection runs in
            # LOGICAL beam order (tie-breaks identical to the host
            # reference), so gather rows by the logical->lane map
            flat_lane = (s.anc + jnp.arange(N)[:, None] * B).reshape(-1)
            logits_in = s.logits[flat_lane]
        else:
            logits_in = s.logits
        logits = apply_filters(
            logits_in, s.tokens, s.cur_len, suppress_mask, blank_mask, filter_cfg
        )  # (N*B, V)
        logprobs = jax.nn.log_softmax(logits, axis=-1).reshape(N, B, V)
        cand = s.cum_logprob[:, :, None] + logprobs  # (N, B, V)
        top_scores, top_idx = _topk_flat(cand.reshape(N, B * V), K)  # (N, K)
        parent = top_idx // V  # (N, K) source beam
        token = (top_idx % V).astype(jnp.int32)  # (N, K)

        is_eot = token == eot

        # ---- finished pool (insertion-only, best-first within the step) ----
        # rank EOT candidates by order (already sorted); pool slots fill while
        # fin_count < P
        eot_rank = jnp.cumsum(is_eot.astype(jnp.int32), axis=1) - 1  # rank among EOTs
        slot = s.fin_count[:, None] + eot_rank  # target pool slot
        can_insert = is_eot & (slot < P)
        # scatter finished hypotheses into the pool
        parent_flat = parent + jnp.arange(N)[:, None] * B  # (N, K) → N*B index
        seqs = s.tokens[parent_flat.reshape(-1)].reshape(N, K, n_ctx)
        # append the (EOT) token at position cur_len
        seqs = jax.vmap(
            jax.vmap(
                lambda ti, toki: jax.lax.dynamic_update_slice(ti, toki[None], (s.cur_len,))
            )
        )(seqs, token)

        def insert_pool(ft, fl, fs, seqs_w, can_w, slot_w, scores_w, cur_len):
            # ft (P, ctx), seqs_w (K, ctx): scatter rows where can_w
            slot_safe = jnp.where(can_w, slot_w, P)  # P = dropped
            onehot = jax.nn.one_hot(slot_safe, P, dtype=jnp.int32)  # (K, P)
            chosen = jnp.einsum("kp,kc->pc", onehot, seqs_w)  # (P, ctx)
            written = onehot.sum(0) > 0  # (P,)
            ft = jnp.where(written[:, None], chosen, ft)
            sc = jnp.einsum("kp,k->p", onehot.astype(jnp.float32), scores_w)
            fs = jnp.where(written, sc, fs)
            ln = cur_len - jnp.asarray(n_init, jnp.int32)  # sampled length before EOT
            fl = jnp.where(written, ln, fl)
            return ft, fl, fs

        fin_tokens, fin_lengths, fin_scores = jax.vmap(insert_pool)(
            s.fin_tokens, s.fin_lengths, s.fin_scores,
            seqs, can_insert, slot, top_scores,
            jnp.full((N,), s.cur_len, jnp.int32),
        )
        fin_count = jnp.minimum(
            s.fin_count + jnp.sum(can_insert, axis=1, dtype=jnp.int32), P
        )

        # ---- refill live beams with best B non-EOT candidates -------------
        nb_rank = jnp.cumsum((~is_eot).astype(jnp.int32), axis=1) - 1
        keep = (~is_eot) & (nb_rank < B)
        # select, per window, the kept K-indices in order → B slots
        sel = jnp.where(keep, nb_rank, B)
        onehot_b = jax.nn.one_hot(sel, B, dtype=jnp.int32)  # (N, K, B)
        new_parent = jnp.einsum("nkb,nk->nb", onehot_b, parent)  # (N, B)
        new_token = jnp.einsum("nkb,nk->nb", onehot_b, token)
        new_cum = jnp.einsum("nkb,nk->nb", onehot_b.astype(jnp.float32), top_scores)

        flat_parent = (new_parent + jnp.arange(N)[:, None] * B).reshape(-1)  # (N*B,)
        tokens = s.tokens[flat_parent]
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_token.reshape(-1, 1), (0, s.cur_len)
        )
        s_fill, overflow = s.s_fill, s.overflow
        if scheme == "flat":
            # ancestry reorder (tiny (NB, T) int32 gather) replaces the old
            # whole-cache gather; the new token's K/V will be written by this
            # lane itself at cur_len
            anc = s.anc[flat_parent]
            anc = jax.lax.dynamic_update_slice(
                anc, own_lane[:, None], (0, s.cur_len))
            step_logits, cache_new, _ = decode_step(
                params, new_token.reshape(-1, 1), s.cur_len, s.cache, xkv,
                config, share_xkv_groups=B, beam_ancestry=anc,
            )
        elif scheme == "shared":
            # PREFIX SHARING: same ancestry discipline as flat, plus eager
            # per-window commits of newly-agreed columns into S. Agreement
            # is ancestrally monotone (children inherit the live set's
            # common prefix), so commits are permanent; the fast loop exits
            # (overflow) when any active window's divergent tail outgrows
            # the static W read window, and the flat loop finishes the
            # segment exactly.
            anc = s.anc[flat_parent]
            anc = jax.lax.dynamic_update_slice(
                anc, own_lane[:, None], (0, s.cur_len))
            anc3 = anc.reshape(N, B, t_alloc)
            ts_seg = (s.cache[0]["sk8"].shape[3] if "sk8" in s.cache[0]
                      else s.cache[0]["skf"].shape[2])
            cache_c = s.cache
            for _ in range(2):  # ≤2 commits/step: drains divergence lag
                p = s_fill  # (N,) next column to commit
                pc = jnp.clip(p, 0, t_alloc - 1)
                cols = jnp.take_along_axis(
                    anc3, pc[:, None, None], axis=2)[:, :, 0]  # (N, B)
                agreed = jnp.all(cols == cols[:, :1], axis=1)
                ok = agreed & (p < s.cur_len) & (p < ts_seg)
                lane = cols[:, 0]
                j = (pc * B + lane)  # (N,) F column
                pw = jnp.clip(p, 0, ts_seg - 1)
                new_c = []
                for e in cache_c:
                    e2 = dict(e)
                    if "sk8" in e:
                        pairs = (("k8f", "sk8", 3), ("v8f", "sv8", 3),
                                 ("ksf", "sks", 2), ("vsf", "svs", 2))
                    else:
                        pairs = (("kf", "skf", 2), ("vf", "svf", 2))
                    for fk, sk, ax in pairs:
                        if ax == 3:
                            col = jnp.take_along_axis(
                                e[fk], j[:, None, None, None], axis=3)
                            old = jnp.take_along_axis(
                                e[sk], pw[:, None, None, None], axis=3)
                            newcol = jnp.where(
                                ok[:, None, None, None], col, old)
                            e2[sk] = jax.vmap(
                                lambda sbuf, c, pp: jax.lax.dynamic_update_slice(
                                    sbuf, c, (0, 0, pp)))(e[sk], newcol, pw)
                        else:
                            col = jnp.take_along_axis(
                                e[fk], j[:, None, None, None], axis=2)
                            old = jnp.take_along_axis(
                                e[sk], pw[:, None, None, None], axis=2)
                            newcol = jnp.where(
                                ok[:, None, None, None], col, old)
                            e2[sk] = jax.vmap(
                                lambda sbuf, c, pp: jax.lax.dynamic_update_slice(
                                    sbuf, c, (0, pp, 0)))(e[sk], newcol, pw)
                    new_c.append(e2)
                cache_c = new_c
                s_fill = jnp.where(ok, p + 1, p)
            active = s.fin_count < P
            overflow = s.overflow | jnp.any(
                active & (s_fill < s.cur_len + 2 - shared_window))
            step_logits, cache_new, _ = decode_step(
                params, new_token.reshape(-1, 1), s.cur_len, cache_c, xkv,
                config, share_xkv_groups=B, beam_ancestry=anc,
                beam_s_fill=s_fill, beam_window=shared_window,
            )
        elif scheme == "permi":
            # ---- copy-on-divergence lane assignment ----
            # The first child of each parent inherits the parent's LANE
            # (cache row untouched); extra children claim dead lanes and
            # copy the parent's row in place (ops/lane_permute.py
            # lane_move_inplace) — HBM traffic proportional to actual beam
            # divergence instead of a full per-step cache permute.
            lane_of = s.anc  # (N, B) logical beam -> lane
            parent_lane = jnp.take_along_axis(lane_of, new_parent, axis=1)
            iota_b = jnp.arange(B, dtype=jnp.int32)
            eq = new_parent[:, :, None] == new_parent[:, None, :]  # (N,j,i)
            lower = iota_b[None, :, None] > iota_b[None, None, :]
            dup_before = jnp.any(eq & lower, axis=2)  # (N, j)
            first = ~dup_before
            oh_pl = jax.nn.one_hot(parent_lane, B, dtype=jnp.int32)
            keep = jnp.sum(oh_pl, axis=1) > 0  # (N, l) lane still referenced
            dead_rank = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - 1
            oh_dead = ((~keep)[:, :, None]
                       & (dead_rank[:, :, None] == iota_b[None, None, :]))
            lane_at_rank = jnp.einsum(
                "nlr,l->nr", oh_dead.astype(jnp.int32), iota_b)  # (N, rank)
            nf_rank = jnp.cumsum(dup_before.astype(jnp.int32), axis=1) - 1
            fill_lane = jnp.take_along_axis(
                lane_at_rank, jnp.clip(nf_rank, 0, B - 1), axis=1)
            lane_new = jnp.where(first, parent_lane, fill_lane)  # (N, j)
            oh_new = jax.nn.one_hot(lane_new, B, dtype=jnp.int32)  # (N,j,l)
            moved = oh_new * dup_before.astype(jnp.int32)[:, :, None]
            src_sc = jnp.einsum("njl,nj->nl", moved, parent_lane)
            hit = jnp.sum(moved, axis=1) > 0
            # src[l] = l for untouched lanes (the kernel skips their DMA);
            # sources are always kept lanes, never targets (precondition)
            src = jnp.where(hit, src_sc, iota_b[None, :])
            token_lane = jnp.einsum("njl,nj->nl", oh_new, new_token)
            src_flat = (src + jnp.arange(N)[:, None] * B).reshape(-1)
            cache_in = [_move_entry(e, src, src_flat) for e in s.cache]
            step_logits, cache_new, _ = decode_step(
                params, token_lane.reshape(-1, 1), s.cur_len, cache_in, xkv,
                config, share_xkv_groups=B,
            )
            anc = lane_new
        else:
            # physical lane permute (exactly the gathered classic beam);
            # the new token's K/V is then written by each lane at cur_len
            anc = s.anc
            oh = jax.nn.one_hot(new_parent, B, dtype=jnp.float32)  # (N,B,B)
            cache_in = [_permute_entry(e, oh, flat_parent) for e in s.cache]
            step_logits, cache_new, _ = decode_step(
                params, new_token.reshape(-1, 1), s.cur_len, cache_in, xkv,
                config, share_xkv_groups=B,
            )
        return State(
            tokens=tokens,
            cum_logprob=new_cum,
            logits=step_logits[:, -1].astype(jnp.float32),
            cache=cache_new,
            anc=anc,
            cur_len=s.cur_len + 1,
            fin_tokens=fin_tokens,
            fin_lengths=fin_lengths,
            fin_scores=fin_scores,
            fin_count=fin_count,
            s_fill=s_fill,
            overflow=overflow,
        )

    def run_loop(s: State, bound: int, scheme: str = kv_scheme) -> State:
        def condb(st: State):
            c = cond(st) & (st.cur_len < bound)
            if scheme == "shared":
                c = c & ~st.overflow
            return c
        return jax.lax.while_loop(condb, lambda st: body(st, scheme), s)

    # The loop cache is either the lane-interleaved FLAT layout (column
    # t·B+k of the T·B axis = lane k's position t) or, for perm/permg, the
    # plain per-lane layout; in both, growing T pads the SAME axis at the
    # end — every old column keeps its meaning in the bigger buffer.
    t_axis_flat = {"k8f": 3, "v8f": 3, "ksf": 2, "vsf": 2, "kf": 2, "vf": 2,
                   "k8t": 3, "v8t": 3, "ks": 2, "vs": 2, "k": 2, "v": 2}
    if kv_scheme == "shared":
        # Segments: fast (prefix-shared) loop → exact flat fallback for any
        # overflow remainder → full S re-consolidation at the boundary
        # (one gather sweep, amortized over the segment). F never grows —
        # only S's read width rides the phase ladder.
        seg_bounds = [min(pb, max_len) for pb in phase_bounds] + [max_len]
        final = state  # placeholder (loop always assigns)
        for i, bound in enumerate(seg_bounds):
            fast = run_loop(state, bound, "shared")
            flat_state = fast._replace(cache=_strip_S(fast.cache))
            flat_done = run_loop(flat_state, bound, "flat")
            if i + 1 < len(seg_bounds):
                ts_next = _ts_of(seg_bounds[i + 1])
                anc3 = flat_done.anc.reshape(N, B, t_alloc)
                eq = jnp.all(anc3 == anc3[:, :1], axis=1)  # (N, T)
                valid = (jnp.arange(t_alloc)[None, :]
                         < flat_done.cur_len)
                pref = jnp.cumprod(
                    (eq & valid).astype(jnp.int32), axis=1).sum(axis=1)
                s_fill_new = jnp.minimum(pref, ts_next).astype(jnp.int32)
                cache_S = _build_S(flat_done.cache, flat_done.anc,
                                   s_fill_new, ts_next)
                state = flat_done._replace(cache=cache_S,
                                           s_fill=s_fill_new,
                                           overflow=jnp.asarray(False))
            else:
                final = flat_done
        phase_bounds = []  # the generic growth loop below must not run
    lane_mult = B if kv_scheme == "flat" else 1
    for i, pb in enumerate(phase_bounds):
        mid = run_loop(state, min(pb, max_len))
        nxt = phase_bounds[i + 1] if i + 1 < len(phase_bounds) else horizon
        # 1-row probe just to inherit init_kv_cache's T rounding rules
        probe = init_kv_cache(config, 1, max_len=nxt)
        t_next = (probe[0]["k8t"].shape[3] if "k8t" in probe[0]
                  else probe[0]["k"].shape[2])

        def grow(a, axis, t_next=t_next):
            shp = list(a.shape)
            shp[axis] = t_next * lane_mult
            return jax.lax.dynamic_update_slice_in_dim(
                jnp.zeros(shp, a.dtype), a, 0, axis=axis)

        grown = [{k: grow(v, t_axis_flat[k]) for k, v in entry.items()}
                 for entry in mid.cache]
        if kv_scheme == "flat":
            # new tail positions: own-lane ancestry, same as anc0 (they are
            # causally masked until this lane itself writes them)
            anc_grown = jnp.tile(own_lane[:, None], (1, t_next))
            anc_grown = jax.lax.dynamic_update_slice(
                anc_grown, mid.anc, (0, 0))
        else:
            anc_grown = mid.anc
        state = mid._replace(cache=grown, anc=anc_grown)
    if kv_scheme != "shared":
        final = run_loop(state, max_len)

    # windows with an underfull pool: back-fill from the best live beams
    # (reference finalize adds unfinished hypotheses when finished < beam)
    live_tokens = final.tokens.reshape(N, B, n_ctx)
    order = jnp.argsort(-final.cum_logprob, axis=1)  # best live first
    live_sorted = jnp.take_along_axis(live_tokens, order[:, :, None], axis=1)
    live_scores = jnp.take_along_axis(final.cum_logprob, order, axis=1)

    def backfill(ft, fl, fs, count, live_t, live_s, cur_len):
        idx = jnp.arange(P)
        src_raw = idx - count
        # each live beam joins the pool at most ONCE (the reference adds each
        # unfinished hypothesis once; slots beyond count+B stay empty/-inf)
        valid = (idx >= count) & (src_raw < B)
        src = jnp.clip(src_raw, 0, B - 1)
        cand_t = live_t[src]
        # live hypotheses have no EOT; append one at cur_len
        cand_t = jax.vmap(
            lambda t: jax.lax.dynamic_update_slice(t, jnp.asarray([eot], jnp.int32), (cur_len,))
        )(cand_t)
        cand_s = live_s[src]
        ft = jnp.where(valid[:, None], cand_t, ft)
        fs = jnp.where(valid, cand_s, fs)
        fl = jnp.where(valid, cur_len - n_init, fl)
        return ft, fl, fs

    fin_tokens, fin_lengths, fin_scores = jax.vmap(backfill)(
        final.fin_tokens, final.fin_lengths, final.fin_scores, final.fin_count,
        live_sorted, live_scores, jnp.full((N,), final.cur_len, jnp.int32),
    )

    return BeamResult(
        tokens=fin_tokens,
        lengths=fin_lengths,
        scores=fin_scores,
        fin_count=jnp.minimum(final.fin_count + B, P),
        no_speech_probs=no_speech_probs,
    )


def beam_decode_task(
    params: Params,
    mel_or_states: jnp.ndarray,
    tokenizer,
    config: WhisperConfig,
    options,
    *,
    states_precomputed: bool = False,
):
    """Host wrapper → list[DecodingResult]; ranks by length penalty."""
    from whisper_mlx_tpu.decoding.filters import make_suppress_mask
    from whisper_mlx_tpu.decoding.task import (
        DecodingResult,
        _resolve_suppress,
        build_initial_tokens,
        compression_ratio,
    )
    from whisper_mlx_tpu.models.whisper import encode

    audio_states = (
        mel_or_states if states_precomputed else encode(params, mel_or_states, config)
    )
    N = audio_states.shape[0]
    B = options.beam_size
    patience = options.patience if options.patience is not None else 1.0
    P = max(round(B * patience), 1)

    init_tokens, sot_index, sample_begin = build_initial_tokens(
        tokenizer, options, config.n_text_ctx
    )
    sample_len = options.sample_len or (config.n_text_ctx // 2)
    suppress_ids = _resolve_suppress(options, tokenizer)
    blank_ids = tuple(tokenizer.encode(" ")) + (tokenizer.eot,) if options.suppress_blank else ()
    always_np, begin_np = make_suppress_mask(config.n_vocab, suppress_ids, blank_ids)
    max_initial_ts_idx = (
        round(options.max_initial_timestamp / 0.02)
        if options.max_initial_timestamp is not None
        else None
    )
    filter_cfg = FilterConfig(
        eot=tokenizer.eot,
        no_timestamps=tokenizer.no_timestamps,
        timestamp_begin=tokenizer.timestamp_begin,
        sample_begin=sample_begin,
        max_initial_timestamp_index=max_initial_ts_idx,
        apply_timestamp_rules=not options.without_timestamps,
    )

    import os

    raw_phases = os.environ.get("WTPU_BEAM_PHASES")
    phases: tuple[int, ...] | None = None  # beam_decode default (128,)
    if raw_phases is not None:  # "" disables, "64,128" overrides
        phases = tuple(int(p) for p in raw_phases.split(",") if p.strip())
    # self-KV scheme: flat (ancestry indirection) | shared (cross-
    # hypothesis prefix sharing) | perm/permg/permp/permi (physical
    # reorders — all measured ≥2× slower, docs/performance.md r5 table).
    kv_scheme = os.environ.get("WTPU_BEAM_KV", "flat")
    if kv_scheme == "shared" and config.self_kv_bits == 4:
        kv_scheme = "flat"  # no s4 gather on this backend
    window = int(os.environ.get("WTPU_BEAM_WIN", "64"))

    result = beam_decode(
        params, audio_states,
        jnp.tile(jnp.asarray(init_tokens, jnp.int32)[None, :], (N, 1)),
        jnp.asarray(always_np), jnp.asarray(begin_np),
        config=config, filter_cfg=filter_cfg, sample_len=sample_len,
        sot_index=sot_index, no_speech_token=tokenizer.no_speech,
        beam_size=B, pool_size=P, phases=phases, kv_scheme=kv_scheme,
        window=window,
    )

    tokens_np = np.asarray(result.tokens)
    lengths_np = np.asarray(result.lengths)
    scores_np = np.asarray(result.scores)
    ns_np = np.asarray(result.no_speech_probs)

    lp = options.length_penalty
    out = []
    for w in range(N):
        best, best_score = 0, -np.inf
        for p in range(P):
            L = max(int(lengths_np[w, p]), 1)
            penalty = float(L) if lp is None else ((5.0 + L) / 6.0) ** lp
            score = scores_np[w, p] / penalty
            if score > best_score:
                best_score, best = score, p
        L = int(lengths_np[w, best])
        toks = tokens_np[w, best, sample_begin : sample_begin + L].tolist()
        text = tokenizer.decode(toks).strip()
        avg_lp = float(scores_np[w, best]) / (L + 1)
        out.append(DecodingResult(
            tokens=toks, text=text, language=tokenizer.language,
            avg_logprob=avg_lp, no_speech_prob=float(ns_np[w]),
            temperature=options.temperature,
            compression_ratio=compression_ratio(text),
        ))
    return out
