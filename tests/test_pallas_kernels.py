"""Pallas kernels vs their XLA reference paths (interpret mode on CPU).

Each kernel must match the XLA implementation it replaces to float
tolerance; the real-TPU compiled path is exercised by bench.py on hardware.
"""

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.ops.flash_attention import flash_attention
from whisper_mlx_tpu.ops.quant import QuantTensor, dequantize, quantize
from whisper_mlx_tpu.ops.quant_pallas import quant_matmul_pallas


def test_quant_matmul_pallas_matches_xla():
    rng = np.random.default_rng(0)
    M, K, N = 8, 256, 384
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=4, group_size=64)
    qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(biases), 4, 64)
    ref = x @ dequantize(w_q, scales, biases, 4, 64).T
    out = np.asarray(quant_matmul_pallas(jnp.asarray(x), qt, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_quant_matmul_pallas_int8_unaligned():
    rng = np.random.default_rng(1)
    M, K, N = 3, 128, 200  # M < sublane, N not a tile multiple
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=8, group_size=64)
    qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(biases), 8, 64)
    ref = x @ dequantize(w_q, scales, biases, 8, 64).T
    out = np.asarray(quant_matmul_pallas(jnp.asarray(x), qt, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_quant_matmul_mb_bitexact_vs_production(monkeypatch):
    """Multi-buffered DMA-ring kernel == production kernel, bit-exact
    (planar dequant mode — same contraction order as production; the u8
    mode permutes rows and is tolerance-tested separately).

    Small shapes: interpret-mode DMA/semaphore emulation is slow on CPU.
    Covers depth<n_tiles (ring reuse), depth==n_tiles, and unpadded N."""
    from whisper_mlx_tpu.ops.quant_pallas_mb import quant_matmul_mb

    monkeypatch.setenv("WTPU_MBT_DQ", "planar")

    rng = np.random.default_rng(2)
    for (M, K, N, bits, tile, depth) in [
        (1, 128, 384, 4, 128, 2),   # 3 tiles, ring wraps
        (3, 128, 256, 8, 128, 2),   # depth == n_tiles
        (2, 128, 200, 4, 128, 2),   # N padded
    ]:
        w = rng.standard_normal((N, K)).astype(np.float32)
        x = rng.standard_normal((M, K)).astype(np.float32)
        w_q, scales, biases = quantize(w, bits=bits, group_size=64)
        qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                         jnp.asarray(biases), bits, 64)
        ref = np.asarray(quant_matmul_pallas(jnp.asarray(x), qt, interpret=True))
        out = np.asarray(quant_matmul_mb(jnp.asarray(x), qt, tile_n=tile,
                                         depth=depth, interpret=True))
        np.testing.assert_array_equal(out, ref)


def test_prepare_mbt_params_resident_layout(monkeypatch):
    """prepare_mbt_params: linears → QuantTensorT (per-leaf tile/depth
    aux), embeds stay packed, dequantize round-trips, and the interpreted
    mbt kernel run from the stored aux is bit-exact vs production."""
    from whisper_mlx_tpu.ops.quant import prepare_mbt_params
    from whisper_mlx_tpu.ops.quant_pallas_mb import (
        QuantTensorT, quant_matmul_mbt)

    monkeypatch.setenv("WTPU_MBT_DQ", "planar")

    rng = np.random.default_rng(3)
    K, N = 128, 384

    def qt_of(n, k):
        w = rng.standard_normal((n, k)).astype(np.float32)
        w_q, scales, biases = quantize(w, bits=4, group_size=64)
        return QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                           jnp.asarray(biases), 4, 64)

    tree = {"embed": qt_of(512, K), "layers": [{"qkv": qt_of(N, K)}]}
    out = prepare_mbt_params(tree)
    assert isinstance(out["embed"], QuantTensor)  # gatherable layout kept
    leaf = out["layers"][0]["qkv"]
    assert isinstance(leaf, QuantTensorT)
    assert leaf.shape == (N, K) and leaf.tile_n == 512 and leaf.depth == 2

    src = tree["layers"][0]["qkv"]
    np.testing.assert_array_equal(
        np.asarray(leaf.dequantize()),
        dequantize(np.asarray(src.w_q), np.asarray(src.scales),
                   np.asarray(src.biases), 4, 64))

    x = rng.standard_normal((2, K)).astype(np.float32)
    ref = np.asarray(quant_matmul_pallas(jnp.asarray(x), src, interpret=True))
    got = np.asarray(quant_matmul_mbt(jnp.asarray(x), leaf, tile_n=128,
                                      interpret=True))
    np.testing.assert_array_equal(got, ref)

    # max_k policy: deep-K linears stay on the production layout
    deep = prepare_mbt_params({"w": qt_of(N, 256)}, max_k=128)
    assert isinstance(deep["w"], QuantTensor)


def test_quant_matmul_mbt_u8_dequant_mode(monkeypatch):
    """u8-bitcast dequant (one sublane-expanding bitcast + two nibble
    masks instead of 8 per-plane shift/mask/cast chains) matches the
    planar mode and the dequant reference. 4-bit only; the activation
    rides the _u8_perm row order."""
    from whisper_mlx_tpu.ops.quant_pallas_mb import (
        quant_matmul_mbt, transpose_quant)

    rng = np.random.default_rng(4)
    for (M, K, N) in [(1, 128, 384), (3, 256, 200)]:
        w = rng.standard_normal((N, K)).astype(np.float32)
        w_q, scales, biases = quantize(w, bits=4, group_size=64)
        qt = transpose_quant(
            QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                        jnp.asarray(biases), 4, 64), tile_n=128, depth=2)
        x = rng.standard_normal((M, K)).astype(np.float32)
        ref = x @ dequantize(w_q, scales, biases, 4, 64).T

        monkeypatch.setenv("WTPU_MBT_DQ", "u8")
        out_u8 = np.asarray(
            quant_matmul_mbt.__wrapped__(jnp.asarray(x), qt, None, None, True))
        monkeypatch.setenv("WTPU_MBT_DQ", "planar")
        out_pl = np.asarray(
            quant_matmul_mbt.__wrapped__(jnp.asarray(x), qt, None, None, True))
        np.testing.assert_allclose(out_u8, ref, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(out_pl, ref, atol=2e-4, rtol=2e-4)


def test_quant_matmul_mbt_i8_codes_resident(monkeypatch):
    """i8 codes-resident mode (WTPU_MBT_DQ=i8): one unpacked code per
    byte, dequant = one cast + mul. Matches the packed planar kernel
    bit-exactly (same contraction order, natural k rows), and
    dequantize() round-trips for the large-M/prefill fallback."""
    from whisper_mlx_tpu.ops.quant_pallas_mb import (
        QuantTensorT, quant_matmul_mbt, transpose_quant)

    monkeypatch.setenv("WTPU_MBT_DQ", "i8")
    rng = np.random.default_rng(5)
    for (M, K, N) in [(1, 128, 384), (3, 256, 200)]:
        w = rng.standard_normal((N, K)).astype(np.float32)
        w_q, scales, biases = quantize(w, bits=4, group_size=64)
        q = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                        jnp.asarray(biases), 4, 64)
        qt = transpose_quant(q, tile_n=128, depth=2)
        assert isinstance(qt, QuantTensorT) and qt.codes_resident
        assert qt.wqt.shape == (K, N) and qt.wqt.dtype == jnp.int8
        assert qt.shape == (N, K)
        np.testing.assert_allclose(
            np.asarray(qt.dequantize()),
            dequantize(w_q, scales, biases, 4, 64), atol=1e-5, rtol=1e-5)

        x = rng.standard_normal((M, K)).astype(np.float32)
        ref = x @ dequantize(w_q, scales, biases, 4, 64).T
        out = np.asarray(
            quant_matmul_mbt.__wrapped__(jnp.asarray(x), qt, None, None, True))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)

        # 8-bit tensors ignore the i8 request (codes 0..255 overflow i8)
        w_q8, s8, b8 = quantize(w, bits=8, group_size=64)
        qt8 = transpose_quant(QuantTensor(jnp.asarray(w_q8), jnp.asarray(s8),
                                          jnp.asarray(b8), 8, 64))
        assert not qt8.codes_resident


@pytest.mark.parametrize("dq_mode", ["planar", "u8", "i8"])
def test_quant_matmul_mbt_contig_layout(monkeypatch, dq_mode):
    """Tile-contiguous resident layout (WTPU_MBT_CONTIG=1): words
    pre-tiled to (n_tiles, Kp, tile_n) so each ring slab is ONE flat HBM
    DMA. Must be bit-exact vs the (Kp, N) column-slice layout in every
    dequant mode, including a non-tile-multiple N (pad at setup) and the
    dequantize() round-trip used by the prefill fallback."""
    from whisper_mlx_tpu.ops.quant_pallas_mb import (
        quant_matmul_mbt, transpose_quant)

    monkeypatch.setenv("WTPU_MBT_DQ", dq_mode)
    rng = np.random.default_rng(6)
    for (M, K, N) in [(1, 128, 384), (3, 256, 200)]:
        w = rng.standard_normal((N, K)).astype(np.float32)
        w_q, scales, biases = quantize(w, bits=4, group_size=64)
        q = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales),
                        jnp.asarray(biases), 4, 64)
        qt = transpose_quant(q, tile_n=128, depth=2, contig=False)
        qtc = transpose_quant(q, tile_n=128, depth=2, contig=True)
        assert qtc.contig and qtc.wqt.ndim == 3
        assert qtc.shape == qt.shape == (N, K)
        np.testing.assert_array_equal(np.asarray(qtc.dequantize()),
                                      np.asarray(qt.dequantize()))

        x = rng.standard_normal((M, K)).astype(np.float32)
        base = np.asarray(
            quant_matmul_mbt.__wrapped__(jnp.asarray(x), qt, None, None, True))
        got = np.asarray(
            quant_matmul_mbt.__wrapped__(jnp.asarray(x), qtc, None, None, True))
        np.testing.assert_array_equal(got, base)


def _sdpa_ref(q, k, v, causal=False):
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float32)
    if causal:
        Tq, Tk = s.shape[-2:]
        mask = np.tril(np.ones((Tq, Tk), bool))
        s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal):
    rng = np.random.default_rng(2)
    B, H, T, hd = 2, 3, 300, 64  # T not a tile multiple → padding path
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, H, T, hd)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    ref = _sdpa_ref(q, k, v, causal)
    out = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, tile_q=128, tile_k=128, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_attention_long_kv():
    rng = np.random.default_rng(3)
    B, H, Tq, Tk, hd = 1, 2, 64, 1500, 64  # cross-attention shape
    q = rng.standard_normal((B, H, Tq, hd)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, H, Tk, hd)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, H, Tk, hd)).astype(np.float32)
    ref = _sdpa_ref(q, k, v)
    out = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        tile_q=64, tile_k=512, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_pallas_matches_xla(n_mels):
    from tests.conftest import make_speechy_audio
    from whisper_mlx_tpu.audio.mel import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_mlx_tpu.ops.mel_pallas import log_mel_pallas

    audio = pad_or_trim(jnp.asarray(make_speechy_audio(4.0)), N_SAMPLES)
    ref = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    out = np.asarray(log_mel_pallas(audio, n_mels=n_mels, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_encoder_flash_flag_matches_xla():
    """encode(flash_attention=True) ≈ encode(False) (interpret-mode kernel)."""
    import dataclasses
    from unittest import mock

    from whisper_mlx_tpu.models.whisper import WhisperConfig, encode, init_params
    from whisper_mlx_tpu.ops import dense_attention as da
    from whisper_mlx_tpu.ops import flash_attention as fa

    config = WhisperConfig(
        n_mels=80, n_vocab=500,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 3000, 80)).astype(np.float32))

    ref = np.asarray(encode(params, mel, config))

    orig_fa = fa.flash_attention
    orig_da = da.dense_attention

    # force interpret mode on CPU (mha routes Tk ≤ 2048 to the dense
    # kernel, longer to flash — patch both)
    def interp_fa(q, k, v, **kw):
        kw["interpret"] = True
        return orig_fa(q, k, v, **kw)

    def interp_da(q, k, v, **kw):
        kw["interpret"] = True
        return orig_da(q, k, v, **kw)

    cfg_flash = dataclasses.replace(config, flash_attention=True)
    with mock.patch.object(fa, "flash_attention", interp_fa), \
            mock.patch.object(da, "dense_attention", interp_da):
        out = np.asarray(encode(params, mel, cfg_flash))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_dense_attention_fast_softmax():
    """fast_softmax=True (bf16 softmax, MXU-dot denominator) stays within
    bf16 rounding of the exact-softmax kernel on bf16 inputs. fp32 inputs
    ignore the flag (oracle path unchanged)."""
    from whisper_mlx_tpu.ops.dense_attention import dense_attention

    rng = np.random.default_rng(6)
    B, H, Tq, Tk, hd = 1, 3, 130, 200, 64  # padded Tq/Tk paths
    q = (rng.standard_normal((B, H, Tq, hd)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((B, H, Tk, hd)) * 0.3).astype(np.float32)
    v = rng.standard_normal((B, H, Tk, hd)).astype(np.float32)
    ref = _sdpa_ref(q, k, v)

    qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))
    out_fast = np.asarray(dense_attention(
        qb, kb, vb, fast_softmax=True, interpret=True), np.float32)
    out_ref = np.asarray(dense_attention(
        qb, kb, vb, fast_softmax=False, interpret=True), np.float32)
    np.testing.assert_allclose(out_fast, out_ref, atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(out_fast, ref, atol=6e-2, rtol=6e-2)

    # fp32 inputs: flag is a no-op (exact oracle path)
    out32 = np.asarray(dense_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        fast_softmax=True, interpret=True))
    np.testing.assert_allclose(out32, ref, atol=2e-5, rtol=2e-5)


def test_quant_matmul_pallas_bf16_compute():
    """bf16 activations take the bf16 dequant+dot path (the serving path);
    error stays within bf16 rounding of the exact dequant matmul."""
    rng = np.random.default_rng(2)
    M, K, N = 8, 256, 384
    w = rng.standard_normal((N, K)).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=4, group_size=64)
    qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(biases), 4, 64)
    ref = x @ dequantize(w_q, scales, biases, 4, 64).T
    out = np.asarray(
        quant_matmul_pallas(jnp.asarray(x, jnp.bfloat16), qt, interpret=True)
    ).astype(np.float32)
    # error must stay at bf16-rounding scale relative to the SIGNAL (outputs
    # near zero make pointwise relative error meaningless): measured ~0.7%
    # of mean |ref|, same as the bf16 XLA dequant-matmul's own rounding
    signal = np.abs(ref).mean()
    err = np.abs(out - ref)
    assert err.mean() < 0.02 * signal, (err.mean(), signal)
    assert err.max() < 0.10 * np.abs(ref).max(), (err.max(), np.abs(ref).max())


def test_stacked_quant_matmul_matches_parts():
    """stack_quant (fused QKV) is exact: the stacked dequant matmul equals
    the concatenation of the per-projection results."""
    from whisper_mlx_tpu.ops.quant import stack_quant

    rng = np.random.default_rng(3)
    M, K, N = 4, 128, 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    qts, refs = [], []
    for seed in range(3):
        w = np.random.default_rng(seed).standard_normal((N, K)).astype(np.float32)
        w_q, s, b = quantize(w, bits=4, group_size=64)
        qts.append(QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64))
        refs.append(x @ dequantize(w_q, s, b, 4, 64).T)
    fused = stack_quant(qts)
    assert fused.shape == (3 * N, K)
    out = np.asarray(quant_matmul_pallas(jnp.asarray(x), fused, interpret=True))
    np.testing.assert_allclose(out, np.concatenate(refs, axis=1), atol=2e-4, rtol=2e-4)


# -- W8A8 MXU decode path (ops/quant_a8.py) ----------------------------------


def _a8_emulate(x, codes, scale, n_orig):
    """Integer-exact host emulation of a8_matmul's arithmetic."""
    x2 = x.reshape(-1, x.shape[-1]).astype(np.float64)
    sx = np.maximum(np.abs(x2).max(-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(x2 / sx), -127, 127).astype(np.int32)
    acc = xq @ codes.astype(np.int32)  # exact int32
    out = acc.astype(np.float64) * scale[0][None, :] * sx
    return out[:, :n_orig]


def test_a8_matmul_integer_exact():
    """a8_matmul == the int32 host emulation bit-for-bit on the integer
    part (the MXU accumulate is exact; only the two fp scale multiplies
    round)."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import a8_matmul, requant_a8

    rng = np.random.default_rng(0)
    for n, k, m, tile in ((192, 128, 1, 128), (320, 256, 4, 128),
                          (128, 128, 9, 128)):
        w = rng.standard_normal((n, k)).astype(np.float32)
        w_q, s, b = quantize(w, bits=4, group_size=64)
        q = QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64)
        at = requant_a8(q, tile_n=tile, depth=2)
        x = rng.standard_normal((m, k)).astype(np.float32)
        got = np.asarray(a8_matmul(jnp.asarray(x), at, interpret=True))
        ref = _a8_emulate(x, np.asarray(at._codes_2d()), np.asarray(at.scale), n)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_a8_requant_chunked_identical(monkeypatch):
    """Row-chunked requant (WTPU_A8_CHUNK_ROWS, the 14B-head OOM fix) is
    bit-identical to the whole-tensor conversion: per-channel scales are
    row-local, so the N split cannot change any code or scale."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import requant_a8

    rng = np.random.default_rng(2)
    n, k = 300, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    q = QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64)
    monkeypatch.setenv("WTPU_A8_CHUNK_ROWS", "0")
    whole = requant_a8(q, tile_n=128, depth=2)
    monkeypatch.setenv("WTPU_A8_CHUNK_ROWS", "64")  # ragged: 300 = 4×64+44
    chunked = requant_a8(q, tile_n=128, depth=2)
    np.testing.assert_array_equal(np.asarray(whole.codes),
                                  np.asarray(chunked.codes))
    np.testing.assert_array_equal(np.asarray(whole.scale),
                                  np.asarray(chunked.scale))


def test_a8_skip_keys_mixed_tree(monkeypatch):
    """WTPU_A8_SKIP=down keeps that linear on the packed int4 kernel while
    the rest convert — the mixed-kernel policy from the r5 isolates (a8
    loses on `down`'s K=18944 bandwidth-bound shape). The leaf under
    {"down": {"w": ...}} must match by its LINEAR name, not the generic
    "w" key."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import A8Tensor, prepare_a8_params

    rng = np.random.default_rng(3)

    def qt(n, k):
        w_q, s, b = quantize(rng.standard_normal((n, k)).astype(np.float32),
                             bits=4, group_size=64)
        return QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b),
                           4, 64)

    tree = {"layers": [{"mlp": {"gate_up": {"w": qt(256, 128)},
                                "down": {"w": qt(128, 256)}},
                        "attn": {"qkv": {"w": qt(192, 128)}}}]}
    monkeypatch.setenv("WTPU_A8_SKIP", "down")
    out = prepare_a8_params(tree)
    blk = out["layers"][0]
    assert isinstance(blk["mlp"]["down"]["w"], QuantTensor)
    assert isinstance(blk["mlp"]["gate_up"]["w"], A8Tensor)
    assert isinstance(blk["attn"]["qkv"]["w"], A8Tensor)


def test_a8_accuracy_vs_fp_dequant():
    """W8A8 error vs the exact int4-dequant matmul stays small: the int8
    re-quant grid is finer than the int4 grid it encodes, so the dominant
    term is the per-token activation quant (~0.5% RMS)."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import a8_matmul, requant_a8

    rng = np.random.default_rng(1)
    n, k = 512, 1024
    w = rng.standard_normal((n, k)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    q = QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64)
    at = requant_a8(q, tile_n=256, depth=2)
    x = rng.standard_normal((3, k)).astype(np.float32)
    exact = np.asarray(jnp.asarray(x) @ q.dequantize(jnp.float32).T)
    got = np.asarray(a8_matmul(jnp.asarray(x), at, interpret=True))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel
    # and the W8 re-quant alone (fp activations) is tighter still
    wa8 = np.asarray(at.dequantize(jnp.float32))
    w4 = np.asarray(q.dequantize(jnp.float32))
    assert np.abs(wa8 - w4).max() <= np.abs(w4).max() / 127 + 1e-6


def test_a8_lead_dims_and_ragged_n():
    """(B, T, K) lead dims and N not a tile_n multiple both round-trip."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import a8_matmul, requant_a8

    rng = np.random.default_rng(2)
    n, k = 200, 128  # N=200 pads to 256 at tile_n=128
    w = rng.standard_normal((n, k)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    q = QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64)
    at = requant_a8(q, tile_n=128, depth=4)
    assert at.shape == (n, k)
    x = rng.standard_normal((2, 3, k)).astype(np.float32)
    got = np.asarray(a8_matmul(jnp.asarray(x), at, interpret=True))
    assert got.shape == (2, 3, n)
    ref = _a8_emulate(x, np.asarray(at._codes_2d()), np.asarray(at.scale), n)
    np.testing.assert_allclose(got.reshape(6, n), ref, rtol=2e-5, atol=1e-5)


def test_prepare_a8_params_tree_and_dispatch():
    """prepare_a8_params converts linears, keeps embeddings packed; the
    quant_matmul dispatch routes A8Tensor to dequant-GEMM off-TPU (and the
    a8 kernel on TPU, exercised by scripts/bench_qwen.py)."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quant_matmul, quantize
    from whisper_mlx_tpu.ops.quant_a8 import A8Tensor, prepare_a8_params

    rng = np.random.default_rng(3)
    def qt(n, k):
        w_q, s, b = quantize(rng.standard_normal((n, k)).astype(np.float32),
                             bits=4, group_size=64)
        return QuantTensor(jnp.asarray(w_q), jnp.asarray(s),
                           jnp.asarray(b), 4, 64)

    tree = {"embed": qt(256, 128), "layers": [{"wq": qt(128, 128)}]}
    out = prepare_a8_params(tree, tile_n=128)
    assert isinstance(out["embed"], QuantTensor)  # row-gathered: stays
    leaf = out["layers"][0]["wq"]
    assert isinstance(leaf, A8Tensor)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    got = np.asarray(quant_matmul(x, leaf))  # CPU → dequant-GEMM fallback
    ref = np.asarray(x) @ np.asarray(leaf.dequantize(jnp.float32)).T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_prepare_a8_free_source_deletes_and_protects_tied():
    """free_source=True frees each packed source buffer after conversion
    (HBM peak = ~one tree, the 14B-on-16GiB requirement) but never frees
    buffers shared with an embed-key tensor (tied word embeddings)."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import A8Tensor, prepare_a8_params

    rng = np.random.default_rng(5)
    def qt(n, k):
        w_q, s, b = quantize(rng.standard_normal((n, k)).astype(np.float32),
                             bits=4, group_size=64)
        return QuantTensor(jnp.asarray(w_q), jnp.asarray(s),
                           jnp.asarray(b), 4, 64)

    tied = qt(256, 128)
    lin = qt(128, 128)
    tree = {"embed": tied, "head": tied, "layers": [{"wq": lin}]}
    out = prepare_a8_params(tree, tile_n=128, free_source=True)
    assert isinstance(out["head"], A8Tensor)
    assert isinstance(out["embed"], QuantTensor)
    np.asarray(tied.w_q)  # tied source must survive
    with pytest.raises(Exception):
        np.asarray(lin.w_q)  # plain linear source must be freed
    # the converted tensor is intact
    assert np.asarray(out["layers"][0]["wq"].dequantize(jnp.float32)).shape \
        == (128, 128)


def test_a8_matmul_xla_lowering_contig(monkeypatch):
    """WTPU_A8_XLA=1 (pure-XLA dot_general) must work with the DEFAULT
    contig=True code layout — regression for the 3-D codes being fed to
    dot_general directly (r4 advisor finding: trace-time TypeError)."""
    from whisper_mlx_tpu.ops.quant import QuantTensor, quantize
    from whisper_mlx_tpu.ops.quant_a8 import a8_matmul, requant_a8

    monkeypatch.setenv("WTPU_A8_XLA", "1")
    rng = np.random.default_rng(11)
    n, k = 200, 256
    w = rng.standard_normal((n, k)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    q = QuantTensor(jnp.asarray(w_q), jnp.asarray(s), jnp.asarray(b), 4, 64)
    x = rng.standard_normal((3, k)).astype(np.float32)
    for contig in (True, False):
        at = requant_a8(q, tile_n=128, depth=2, contig=contig)
        got = np.asarray(a8_matmul(jnp.asarray(x), at))
        ref = _a8_emulate(x, np.asarray(at._codes_2d()), np.asarray(at.scale), n)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_beamflat_attention_kernel_matches_xla():
    """Fused beam-flat attention kernel (interpret) vs the XLA einsum
    chain of attention_int8_beamflat — same masked softmax math."""
    import numpy as np

    from whisper_mlx_tpu.ops.beamflat_attention import (
        beamflat_attention_kernel,
    )
    from whisper_mlx_tpu.ops.kv_quant import (
        _beamflat_mask,
        attention_int8_beamflat,
    )

    rng = np.random.default_rng(7)
    n, g, h, d, T = 2, 5, 4, 64, 32
    NB, J = n * g, T * g
    q = jnp.asarray(rng.standard_normal((NB, h, 1, d)), jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 128, (n, h, d, J)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (n, h, d, J)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((n, h, J, 1)) ** 2 * 0.02 + 1e-3,
                     jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((n, h, J, 1)) ** 2 * 0.02 + 1e-3,
                     jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, g, (NB, T)), jnp.int32)
    pos = jnp.int32(T - 2)

    ref = attention_int8_beamflat(q, k8, ks, v8, vs, anc, pos, g)
    m = _beamflat_mask(anc, n, g, J, pos)
    out = beamflat_attention_kernel(q, k8, ks, v8, vs, m, groups=g,
                                    interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 output grid


def test_beamflat_attention_kernel_tpu_lowering():
    """Cross-platform TPU lowering (jax.export) of the fused beam kernel at
    the REAL bench shapes — runs Mosaic's block-mapping checks on CPU.

    Regression: r4 shipped block specs whose trailing dims were neither
    8/128-divisible nor equal to the array dims ((1, 64) vs (20, 64));
    interpret-mode tests passed but every TPU beam decode crashed at trace
    time. Mosaic only validates specs during TPU lowering, which
    jax.export can run on any host.
    """
    import functools

    from whisper_mlx_tpu.ops.beamflat_attention import (
        beamflat_attention_kernel,
    )

    n, g, h, d = 24, 5, 20, 64  # large-v3 beam5 serving shapes
    NB = n * g
    for T in (128, 224):  # WTPU_BEAM_PHASES ladder: phase + full horizon
        J = T * g
        q = jnp.zeros((NB, h, 1, d), jnp.bfloat16)
        k8 = jnp.zeros((n, h, d, J), jnp.int8)
        ks = jnp.zeros((n, h, J, 1), jnp.bfloat16)
        m = jnp.zeros((n, g, J), bool)
        fn = functools.partial(beamflat_attention_kernel, groups=g)
        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
            q, k8, ks, k8, ks, m)
        assert "tpu" in [p.lower() for p in exp.platforms]
