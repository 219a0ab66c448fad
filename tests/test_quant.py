"""Quantization format + quantized-model correctness.

Key invariants:
- quantize→dequantize round-trip error bounded by scale/2 per element;
- decode with a quantized model EXACTLY matches decode with the explicitly
  dequantized fp weights (the quant matmul must introduce no extra error);
- MLX-format export→load round-trips both fp and quantized checkpoints.
"""

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from whisper_mlx_tpu.decoding.task import DecodingOptions, decode
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params
from whisper_mlx_tpu.ops.quant import (
    QuantTensor,
    dequantize,
    quant_matmul,
    quant_rows,
    quantize,
    quantize_params,
)


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_roundtrip_error_bound(bits):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=bits, group_size=64)
    assert w_q.dtype == np.uint32
    assert w_q.shape == (32, 128 * bits // 32)
    assert scales.shape == (32, 2)
    back = dequantize(w_q, scales, biases, bits, 64)
    err = np.abs(back - w)
    assert np.all(err <= scales.repeat(64, axis=1) * 0.5 + 1e-6)


def test_quant_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((48, 128)).astype(np.float32)  # (out, in)
    x = rng.standard_normal((5, 128)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=4, group_size=64)
    qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(biases), 4, 64)
    ref = x @ dequantize(w_q, scales, biases, 4, 64).T
    out = np.asarray(quant_matmul(jnp.asarray(x), qt))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_quant_rows_lookup():
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((100, 64)).astype(np.float32)
    w_q, scales, biases = quantize(emb, bits=4, group_size=64)
    qt = QuantTensor(jnp.asarray(w_q), jnp.asarray(scales), jnp.asarray(biases), 4, 64)
    ids = jnp.asarray([[3, 77], [0, 99]])
    rows = np.asarray(quant_rows(qt, ids))
    full = dequantize(w_q, scales, biases, 4, 64)
    np.testing.assert_allclose(rows, full[np.asarray(ids)], atol=1e-6)


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    params = init_params(config, seed=0)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 3000, 80)).astype(np.float32)
    return params, config, tok, jnp.asarray(mel)


def test_quantized_decode_matches_dequantized_fp(tiny):
    """Quantized model must equal the fp model built from dequantized
    weights — token-for-token (proves the quant matmul path is exact)."""
    params, config, tok, mel = tiny
    qparams = quantize_params(params, bits=4, group_size=64)

    def dequant_tree(node):
        if isinstance(node, dict):
            return {k: dequant_tree(v) for k, v in node.items()}
        if isinstance(node, list):
            return [dequant_tree(v) for v in node]
        if isinstance(node, QuantTensor):
            return node  # handled by parent
        return node

    # build fp params where every QuantTensor is replaced by dequantized fp
    def to_fp(node):
        if isinstance(node, QuantTensor):
            return node.dequantize()  # (out, in) — needs transpose for "w"
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and isinstance(v, QuantTensor):
                    out[k] = v.dequantize().T  # back to (in, out)
                elif k == "token_emb" and isinstance(v, QuantTensor):
                    out[k] = v.dequantize()  # (vocab, d) stays
                else:
                    out[k] = to_fp(v)
            return out
        if isinstance(node, list):
            return [to_fp(v) for v in node]
        return node

    fp_params = to_fp(qparams)
    opts = DecodingOptions(sample_len=16)
    r_q = decode(qparams, mel, tok, config, opts)
    r_fp = decode(fp_params, mel, tok, config, opts)
    assert [r.tokens for r in r_q] == [r.tokens for r in r_fp]
    np.testing.assert_allclose(r_q[0].avg_logprob, r_fp[0].avg_logprob, atol=1e-4)


def test_quantized_model_close_to_fp(tiny):
    """4-bit decode should stay close to fp (same first tokens on an easy
    argmax): sanity that quantization error is bounded, not exploding."""
    params, config, tok, mel = tiny
    qparams = quantize_params(params, bits=8, group_size=64)
    r_fp = decode(params, mel, tok, config, DecodingOptions(sample_len=8))
    r_q = decode(qparams, mel, tok, config, DecodingOptions(sample_len=8))
    assert abs(r_fp[0].avg_logprob - r_q[0].avg_logprob) < 0.5


def test_mlx_export_load_roundtrip(tiny, tmp_path):
    from whisper_mlx_tpu.checkpoint.quant_loader import export_mlx_whisper, load_mlx_whisper

    params, config, tok, mel = tiny

    # fp roundtrip
    export_mlx_whisper(params, config, tmp_path / "fp")
    p2, c2 = load_mlx_whisper(tmp_path / "fp")
    assert c2 == config
    r1 = decode(params, mel, tok, config, DecodingOptions(sample_len=8))
    r2 = decode(p2, mel, tok, c2, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r1] == [r.tokens for r in r2]

    # quantized roundtrip
    qparams = quantize_params(params, bits=4, group_size=64)
    export_mlx_whisper(qparams, config, tmp_path / "q4",
                       quantization={"bits": 4, "group_size": 64})
    p3, c3 = load_mlx_whisper(tmp_path / "q4")
    r3 = decode(qparams, mel, tok, config, DecodingOptions(sample_len=8))
    r4 = decode(p3, mel, tok, c3, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r3] == [r.tokens for r in r4]


def test_openai_pt_loader(tiny, tmp_path):
    """OpenAI .pt format: synthesize a checkpoint with the original naming
    from our pytree, load it back, decode must match exactly."""
    import numpy as np
    import torch

    from whisper_mlx_tpu.checkpoint.openai_loader import load_openai_whisper

    params, config, tok, mel = tiny

    sd = {}

    def put_dense(prefix, node):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(node["w"], np.float32).T))
        if "b" in node:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(node["b"], np.float32))

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(node["g"], np.float32))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(node["b"], np.float32))

    def put_attn(prefix, node):
        put_dense(f"{prefix}.query", node["q"])
        put_dense(f"{prefix}.key", node["k"])
        put_dense(f"{prefix}.value", node["v"])
        put_dense(f"{prefix}.out", node["o"])

    enc = params["encoder"]
    for name in ("conv1", "conv2"):
        sd[f"encoder.{name}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(enc[name]["w"], np.float32).transpose(2, 1, 0)))
        sd[f"encoder.{name}.bias"] = torch.from_numpy(np.asarray(enc[name]["b"], np.float32))
    sd["encoder.positional_embedding"] = torch.from_numpy(np.asarray(enc["pos_emb"], np.float32))
    for i, blk in enumerate(enc["blocks"]):
        pre = f"encoder.blocks.{i}"
        put_ln(f"{pre}.attn_ln", blk["attn_ln"])
        put_attn(f"{pre}.attn", blk["attn"])
        put_ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        put_dense(f"{pre}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"{pre}.mlp.2", blk["mlp"]["fc2"])
    put_ln("encoder.ln_post", enc["ln_post"])
    dec = params["decoder"]
    sd["decoder.token_embedding.weight"] = torch.from_numpy(np.asarray(dec["token_emb"], np.float32))
    sd["decoder.positional_embedding"] = torch.from_numpy(np.asarray(dec["pos_emb"], np.float32))
    for i, blk in enumerate(dec["blocks"]):
        pre = f"decoder.blocks.{i}"
        put_ln(f"{pre}.attn_ln", blk["attn_ln"])
        put_attn(f"{pre}.attn", blk["attn"])
        put_ln(f"{pre}.cross_attn_ln", blk["cross_attn_ln"])
        put_attn(f"{pre}.cross_attn", blk["cross_attn"])
        put_ln(f"{pre}.mlp_ln", blk["mlp_ln"])
        put_dense(f"{pre}.mlp.0", blk["mlp"]["fc1"])
        put_dense(f"{pre}.mlp.2", blk["mlp"]["fc2"])
    put_ln("decoder.ln", dec["ln"])

    dims = dict(n_mels=config.n_mels, n_vocab=config.n_vocab,
                n_audio_ctx=config.n_audio_ctx, n_audio_state=config.n_audio_state,
                n_audio_head=config.n_audio_head, n_audio_layer=config.n_audio_layer,
                n_text_ctx=config.n_text_ctx, n_text_state=config.n_text_state,
                n_text_head=config.n_text_head, n_text_layer=config.n_text_layer)
    pt = tmp_path / "model.pt"
    torch.save({"dims": dims, "model_state_dict": sd}, pt)

    p2, c2 = load_openai_whisper(pt)
    assert c2 == config
    r1 = decode(params, mel, tok, config, DecodingOptions(sample_len=8))
    r2 = decode(p2, mel, tok, c2, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r1] == [r.tokens for r in r2]


def test_native_checkpoint_roundtrip(tiny, tmp_path):
    """save_params/load_params preserve fp and quantized pytrees exactly."""
    from whisper_mlx_tpu.checkpoint.native_io import load_params, save_params

    params, config, tok, mel = tiny

    save_params(params, tmp_path / "fp.safetensors")
    p2 = load_params(tmp_path / "fp.safetensors")
    r1 = decode(params, mel, tok, config, DecodingOptions(sample_len=8))
    r2 = decode(p2, mel, tok, config, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r1] == [r.tokens for r in r2]

    qparams = quantize_params(params, bits=4, group_size=64)
    save_params(qparams, tmp_path / "q4.safetensors")
    p3 = load_params(tmp_path / "q4.safetensors")
    r3 = decode(qparams, mel, tok, config, DecodingOptions(sample_len=8))
    r4 = decode(p3, mel, tok, config, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r3] == [r.tokens for r in r4]


def test_quantize_jax_matches_numpy():
    from whisper_mlx_tpu.ops.quant import quantize_jax

    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    w_q, scales, biases = quantize(w, bits=4, group_size=64)
    qt = quantize_jax(jnp.asarray(w), bits=4, group_size=64)
    np.testing.assert_array_equal(np.asarray(qt.w_q), w_q)
    np.testing.assert_allclose(np.asarray(qt.scales), scales, atol=1e-7)
    np.testing.assert_allclose(np.asarray(qt.biases), biases, atol=1e-7)


def test_fused_qkv_decode_identical(tiny):
    """fuse_whisper_qkv is bit-exact: fused-QKV decode produces the same
    tokens and logprob as the unfused quantized model (VERDICT r1 item 3)."""
    from whisper_mlx_tpu.ops.quant import fuse_whisper_qkv

    params, config, tok, mel = tiny
    qparams = quantize_params(params, bits=4, group_size=64)
    fused = fuse_whisper_qkv(qparams)
    # fused blocks replace q/k/v with one stacked projection
    assert "qkv" in fused["decoder"]["blocks"][0]["attn"]
    assert "q" not in fused["decoder"]["blocks"][0]["attn"]
    assert "q" in fused["decoder"]["blocks"][0]["cross_attn"]  # cross not fused

    opts = DecodingOptions(sample_len=12)
    r_q = decode(qparams, mel, tok, config, opts)
    r_f = decode(fused, mel, tok, config, opts)
    assert [r.tokens for r in r_q] == [r.tokens for r in r_f]
    np.testing.assert_allclose(r_q[0].avg_logprob, r_f[0].avg_logprob, atol=1e-5)


def test_dequantize_params_matches_quant_path():
    """Dequant-at-load serving (quant_loader dequant=True) must reproduce
    the quantized path exactly: both represent the same 4-bit weights, so
    decode over the dense dequantized tree == decode over QuantTensors
    (on CPU both compute f32; on TPU they differ only by the fused
    kernel's bf16 compute class)."""
    import dataclasses

    from whisper_mlx_tpu.models.whisper import (
        WhisperConfig,
        cross_kv,
        decode_step,
        encode,
        init_kv_cache,
        init_params,
    )
    from whisper_mlx_tpu.ops.quant import dequantize_params, quantize_params

    cfg = WhisperConfig(
        n_mels=80, n_vocab=512, n_audio_state=128, n_audio_head=4,
        n_audio_layer=2, n_text_state=128, n_text_head=4, n_text_layer=2,
    )
    params = init_params(cfg, seed=0)
    qp = quantize_params(params, bits=4, group_size=64)
    dp = dequantize_params(qp, dtype=jnp.float32)

    # identical tree structure and leaf shapes as the original fp pytree
    flat_o, tree_o = jax.tree_util.tree_flatten(params)
    flat_d, tree_d = jax.tree_util.tree_flatten(dp)
    assert tree_o == tree_d
    assert all(a.shape == b.shape for a, b in zip(flat_o, flat_d))

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 3000, 80)).astype(np.float32))
    sq = encode(qp, mel, cfg)
    sd = encode(dp, mel, cfg)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sd), atol=1e-4)

    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    lq, _, _ = decode_step(qp, toks, jnp.int32(0), init_kv_cache(cfg, 1),
                           cross_kv(qp, sq, cfg), cfg)
    ld, _, _ = decode_step(dp, toks, jnp.int32(0), init_kv_cache(cfg, 1),
                           cross_kv(dp, sd, cfg), cfg)
    scale = float(jnp.max(jnp.abs(lq)))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld),
                               atol=1e-3 * max(scale, 1.0))


@pytest.mark.parametrize("bits", [4, 8])
def test_native_group_matmul_exact(bits):
    """NativeQuantTensor grouped-einsum matmul == dequant reference, on both
    the small-M grouped path and the large-M dense fallback (decode loops
    convert params in-jit via prepare_native_params — probe_quant_xla.py
    measured this path faster than dense bf16 AND the Pallas kernel)."""
    from whisper_mlx_tpu.ops.quant import to_native

    rng = np.random.default_rng(3)
    n, k, gs = 96, 256, 64
    w = rng.standard_normal((n, k)).astype(np.float32)
    q = QuantTensor(*map(jnp.asarray, quantize(w, bits, gs)), bits, gs)
    w_ref = np.asarray(q.dequantize())

    @jax.jit
    def run(x, qt):
        nq = to_native(qt)
        return quant_matmul(x, nq), nq.dequantize()

    for m in (1, 7, 6000):  # 6000 rows exceeds the grouped-partial budget
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        y, w_native = run(x, q)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w_ref.T,
                                   rtol=2e-5, atol=2e-4)
        # native dequantize == packed dequantize up to XLA FMA fusion (the
        # jitted multiply-add contracts in higher intermediate precision)
        np.testing.assert_allclose(np.asarray(w_native), w_ref,
                                   rtol=1e-6, atol=1e-6)


def test_prepare_native_params_embeds_and_linears(tiny):
    """prepare_native_params: linears → NativeQuantTensor, embedding →
    dense (dequantized once per call); greedy decode through the prepared
    tree is what test_quantized_decode_matches_dequantized_fp pins."""
    from whisper_mlx_tpu.ops.quant import NativeQuantTensor, prepare_native_params

    params, config, tok, mel = tiny
    qparams = quantize_params(params, bits=4, group_size=64)

    @jax.jit
    def prep(p):
        out = prepare_native_params(p, embed_dtype=jnp.float32)
        return out

    prepped = prep(qparams)
    assert isinstance(prepped["decoder"]["token_emb"], jnp.ndarray)
    np.testing.assert_allclose(  # == up to XLA FMA fusion (1 ulp)
        np.asarray(prepped["decoder"]["token_emb"]),
        np.asarray(qparams["decoder"]["token_emb"].dequantize()),
        rtol=1e-6, atol=1e-7)
    found = []

    def walk(node):
        if isinstance(node, NativeQuantTensor):
            found.append(node)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(prepped)
    assert found, "no linear was converted to NativeQuantTensor"
    assert all(f.codes.dtype in (jnp.uint8, jnp.uint4) for f in found)


def test_unfuse_whisper_qkv_roundtrip(tiny):
    """fuse → unfuse restores the exact packed q/k/v tensors (row slicing
    of the stacked QuantTensor), and dense decode through
    maybe_dense_decode_params of a FUSED tree equals the unfused decode."""
    from whisper_mlx_tpu.ops.quant import (
        fuse_whisper_qkv,
        maybe_dense_decode_params,
        unfuse_whisper_qkv,
    )

    params, config, tok, mel = tiny
    qparams = quantize_params(params, bits=4, group_size=64)
    fused = fuse_whisper_qkv(qparams)
    assert "qkv" in fused["decoder"]["blocks"][0]["attn"]
    back = unfuse_whisper_qkv(fused)
    for part in ("encoder", "decoder"):
        for orig_blk, back_blk in zip(qparams[part]["blocks"], back[part]["blocks"]):
            for key in ("q", "k", "v"):
                a, b = orig_blk["attn"][key]["w"], back_blk["attn"][key]["w"]
                np.testing.assert_array_equal(np.asarray(a.w_q), np.asarray(b.w_q))
                np.testing.assert_array_equal(np.asarray(a.scales), np.asarray(b.scales))

    # dense conversion of the fused tree (rows>16 path) decodes identically
    # to the packed unfused tree
    dense = maybe_dense_decode_params(fused, rows=32, dtype=jnp.float32)
    assert "qkv" not in dense["decoder"]["blocks"][0]["attn"]
    r_dense = decode(dense, mel, tok, config, DecodingOptions(sample_len=8))
    r_packed = decode(qparams, mel, tok, config, DecodingOptions(sample_len=8))
    assert [r.tokens for r in r_dense] == [r.tokens for r in r_packed]


def test_dense_rows_min_override(monkeypatch):
    """WTPU_DENSE_ROWS_MIN overrides the batched dense-argument boundary."""
    import numpy as np

    from whisper_mlx_tpu.ops.quant import (
        QuantTensor,
        maybe_dense_decode_params,
        quantize,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 128)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    tree = {"w": QuantTensor(jnp.asarray(w_q), jnp.asarray(s),
                             jnp.asarray(b), 4, 64)}
    monkeypatch.setenv("WTPU_DENSE_ROWS_MIN", "1000")
    assert maybe_dense_decode_params(tree, rows=56) is tree  # stays packed
    monkeypatch.delenv("WTPU_DENSE_ROWS_MIN")
    out = maybe_dense_decode_params(tree, rows=56)
    assert not isinstance(out["w"], QuantTensor)  # converted


def test_fewrow_mbt_optin(monkeypatch):
    """WTPU_FEWROW_MBT=1: few-row decode params ride the transposed
    DMA-ring layout (QuantTensorT), cached across calls; dequantizes back
    to the same weights. Default keeps the packed tree."""
    import numpy as np

    from whisper_mlx_tpu.ops.quant import (
        QuantTensor, dequantize, maybe_dense_decode_params, quantize)
    from whisper_mlx_tpu.ops.quant_pallas_mb import QuantTensorT

    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 128)).astype(np.float32)
    w_q, s, b = quantize(w, bits=4, group_size=64)
    tree = {"w": QuantTensor(jnp.asarray(w_q), jnp.asarray(s),
                             jnp.asarray(b), 4, 64)}
    assert maybe_dense_decode_params(tree, rows=6) is tree  # default packed

    monkeypatch.setenv("WTPU_FEWROW_MBT", "1")
    out = maybe_dense_decode_params(tree, rows=6)
    assert isinstance(out["w"], QuantTensorT)
    assert maybe_dense_decode_params(tree, rows=6) is out  # cached
    np.testing.assert_array_equal(
        np.asarray(out["w"].dequantize()), dequantize(w_q, s, b, 4, 64))
