"""Continuous-batching scheduler: cross-request window batching."""

import asyncio

import numpy as np
import pytest

import torch  # noqa: F401
import jax
import jax.numpy as jnp

from tests.conftest import make_speechy_audio
from whisper_mlx_tpu.decoding.task import DecodingOptions
from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params
from whisper_mlx_tpu.runtime.batcher import TranscriptionBatcher


@pytest.fixture(scope="module")
def tiny():
    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    return init_params(config, seed=0), config, tok


def test_concurrent_requests_share_batches(tiny):
    params, config, tok = tiny
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=4, max_wait_ms=200,
        decoding=DecodingOptions(sample_len=8),
    )

    async def run():
        a = make_speechy_audio(seconds=65.0)   # 3 windows
        b = make_speechy_audio(seconds=20.0, seed=1)  # 1 window
        r_a, r_b = await asyncio.gather(
            batcher.transcribe(a), batcher.transcribe(b)
        )
        batcher.shutdown()
        return r_a, r_b

    r_a, r_b = asyncio.run(run())
    assert set(r_a) >= {"text", "segments", "language"}
    # request A spans 3 windows → seeks cover 0, 3000, 6000
    seeks = sorted({s["seek"] for s in r_a["segments"]})
    assert seeks and seeks[0] == 0
    # the 4 windows fit one batch: ≤2 flushes even with scheduling noise
    assert batcher.stats["windows"] == 4
    assert batcher.stats["batches"] <= 2


def test_batcher_matches_batched_transcribe(tiny):
    """Batcher output must equal transcribe(batch_windows=True) segment
    text/tokens for the same audio (same decode path, same windows)."""
    from whisper_mlx_tpu.inference.transcribe import transcribe

    params, config, tok = tiny
    audio = make_speechy_audio(seconds=40.0)

    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=2, max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8),
    )

    async def run():
        r = await batcher.transcribe(audio)
        batcher.shutdown()
        return r

    via_batcher = asyncio.run(run())
    via_transcribe = transcribe(
        audio, params=params, config=config, tokenizer=tok,
        temperature=0.0, batch_windows=True, window_batch_size=2,
        sample_len=8, no_speech_threshold=None, verbose=False,
    )
    toks_a = [s["tokens"] for s in via_batcher["segments"]]
    toks_b = [s["tokens"] for s in via_transcribe["segments"]]
    assert toks_a == toks_b


def test_stream_transcribe_progressive(tiny):
    """Streaming mode yields each window as it decodes, in bounded count."""
    params, config, tok = tiny
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=2, max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8),
    )

    async def run():
        audio = make_speechy_audio(seconds=65.0)  # 3 windows
        events = []
        async for ev in batcher.stream_transcribe(audio):
            events.append(ev)
        batcher.shutdown()
        return events

    events = asyncio.run(run())
    assert len(events) == 3
    assert {e["window"] for e in events} == {0, 1, 2}
    assert all(e["of"] == 3 for e in events)
    assert all("segments" in e for e in events)


def test_worker_failure_fails_waiters_and_recovers(tiny):
    """A failing batch must raise in every awaiting request (not hang), wake
    streaming consumers, and the batcher must serve the NEXT request after a
    clean worker restart (same drain discipline as inference/batch_engine)."""
    params, config, tok = tiny
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=2, max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8),
    )
    real_launch = batcher._launch

    def boom(jobs):
        raise RuntimeError("device exploded")

    async def run():
        audio = make_speechy_audio(seconds=20.0)  # 1 window
        batcher._launch = boom
        with pytest.raises(RuntimeError, match="device exploded"):
            await asyncio.wait_for(batcher.transcribe(audio), timeout=30)
        with pytest.raises(RuntimeError, match="device exploded"):
            agen = batcher.stream_transcribe(audio)
            await asyncio.wait_for(agen.__anext__(), timeout=30)
        assert not batcher._requests  # no leaked request entries
        batcher._launch = real_launch  # next request restarts the worker
        r = await asyncio.wait_for(batcher.transcribe(audio), timeout=60)
        batcher.shutdown()
        return r

    r = asyncio.run(run())
    assert set(r) >= {"text", "segments", "language"}


def test_batch_buckets_pick_smallest_fit(tiny):
    """With bucket sizes (2, 4), a 1-window request rides the 2-bucket and a
    3-window request the 4-bucket (fill stats expose the chosen shape); the
    collect loop still fills up to the LARGEST bucket."""
    params, config, tok = tiny
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=[4, 2], max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8),
    )
    assert batcher.buckets == (2, 4) and batcher.batch_size == 4

    async def run():
        r1 = await batcher.transcribe(make_speechy_audio(seconds=20.0))  # 1 win
        fill_after_1 = batcher.stats["fill_sum"]
        r2 = await batcher.transcribe(make_speechy_audio(seconds=65.0))  # 3 win
        batcher.shutdown()
        return r1, r2, fill_after_1

    r1, r2, fill_after_1 = asyncio.run(run())
    assert r1["segments"] and r2["segments"]
    assert fill_after_1 == pytest.approx(1 / 2)          # bucket 2, not 4
    assert batcher.stats["fill_sum"] == pytest.approx(1 / 2 + 3 / 4)


def test_batcher_quantized_params(tiny):
    """Packed 4-bit params serve through the batcher: the encoder rides the
    dense-argument policy (ops/quant.py) and output matches the offline
    batched transcribe on the same quantized tree."""
    from whisper_mlx_tpu.inference.transcribe import transcribe
    from whisper_mlx_tpu.ops.quant import quantize_params

    params, config, tok = tiny
    qparams = quantize_params(params, bits=4, group_size=32)
    batcher = TranscriptionBatcher(
        qparams, config, tok, batch_size=4, max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8),
    )
    audio = make_speechy_audio(seconds=65.0)

    async def run():
        r = await batcher.transcribe(audio)
        batcher.shutdown()
        return r

    got = asyncio.run(run())
    want = transcribe(
        audio, params=qparams, config=config, tokenizer=tok,
        temperature=0.0, language=None, batch_windows=True,
        window_batch_size=4, sample_len=8, condition_on_previous_text=False,
    )
    assert [s["tokens"] for s in got["segments"]] == \
        [s["tokens"] for s in want["segments"]]


def test_int16_audio_bit_identical(tiny):
    """The raw-PCM16 serving upload (audio as <i2, converted on device,
    audio/decode.load_audio_pcm16) must produce byte-identical results to
    the f32 path — int16 values and /2^15 are both exact in f32."""
    params, config, tok = tiny
    pcm = (np.clip(make_speechy_audio(seconds=40.0), -1, 1) * 32767).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0

    async def run(audio):
        batcher = TranscriptionBatcher(
            params, config, tok, batch_size=4, max_wait_ms=20,
            decoding=DecodingOptions(sample_len=8),
        )
        r = await batcher.transcribe(audio)
        batcher.shutdown()
        return r

    r_i16 = asyncio.run(run(pcm))
    r_f32 = asyncio.run(run(f32))
    assert [s["tokens"] for s in r_i16["segments"]] == [
        s["tokens"] for s in r_f32["segments"]
    ]
    assert r_i16["text"] == r_f32["text"]


def test_batcher_mesh_token_identical(tiny):
    """Multi-chip DP serving (VERDICT r3 item 1): the batcher with a dp=4
    mesh must produce EXACTLY the single-device tokens — GSPMD shards the
    window batch over chips without changing the math. This is the
    production path that replaces the reference's single-writer lock
    (reference daemon/server.py:280)."""
    from whisper_mlx_tpu.parallel.mesh import make_mesh

    params, config, tok = tiny
    audio = make_speechy_audio(seconds=95.0)  # 4 windows — one dp=4 batch

    async def run(mesh):
        batcher = TranscriptionBatcher(
            params, config, tok, batch_size=4, max_wait_ms=20,
            decoding=DecodingOptions(sample_len=8), mesh=mesh,
        )
        r = await batcher.transcribe(audio)
        batcher.shutdown()
        return r, batcher

    r_single, _ = asyncio.run(run(None))
    r_mesh, b_mesh = asyncio.run(run(make_mesh(dp=4, tp=1, devices=jax.devices()[:4])))
    assert b_mesh.buckets == (4,)
    assert [s["tokens"] for s in r_mesh["segments"]] == \
        [s["tokens"] for s in r_single["segments"]]
    assert r_mesh["text"] == r_single["text"]


def test_batcher_mesh_buckets_dp_divisible(tiny):
    """Buckets round up to dp multiples so every compiled shape shards
    evenly over the mesh (a 1-window request still rides a dp-wide batch)."""
    from whisper_mlx_tpu.parallel.mesh import make_mesh

    params, config, tok = tiny
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=[2, 6], max_wait_ms=10,
        decoding=DecodingOptions(sample_len=8), mesh=mesh,
    )
    assert batcher.buckets == (4, 8)

    async def run():
        r = await batcher.transcribe(make_speechy_audio(seconds=20.0))  # 1 win
        batcher.shutdown()
        return r

    r = asyncio.run(run())
    assert r["segments"]


def test_batcher_mesh_quantized_replicates(tiny):
    """Packed 4-bit trees serve over the mesh too: shard_params replicates
    QuantTensor trees (parallel/sharding.py) and output stays identical to
    the single-device quantized batcher."""
    from whisper_mlx_tpu.ops.quant import quantize_params
    from whisper_mlx_tpu.parallel.mesh import make_mesh

    params, config, tok = tiny
    qparams = quantize_params(params, bits=4, group_size=32)
    audio = make_speechy_audio(seconds=40.0)  # 2 windows

    async def run(mesh):
        batcher = TranscriptionBatcher(
            qparams, config, tok, batch_size=2, max_wait_ms=10,
            decoding=DecodingOptions(sample_len=8), mesh=mesh,
        )
        r = await batcher.transcribe(audio)
        batcher.shutdown()
        return r

    r_single = asyncio.run(run(None))
    r_mesh = asyncio.run(run(make_mesh(dp=2, tp=1, devices=jax.devices()[:2])))
    assert [s["tokens"] for s in r_mesh["segments"]] == \
        [s["tokens"] for s in r_single["segments"]]


def test_load_audio_pcm16_gating(tmp_path):
    """pcm16 fast path: int16 passthrough only for 16 kHz/16-bit/mono WAVs;
    everything else falls back (None)."""
    import struct as _struct

    from whisper_mlx_tpu.audio.decode import load_audio, load_audio_pcm16

    def wav(path, rate=16_000, channels=1, bits=16, fmt=1, n=1600):
        rng = np.random.default_rng(0)
        if bits == 16:
            body = (np.clip(rng.standard_normal(n * channels) * 0.1, -1, 1)
                    * 32767).astype("<i2").tobytes()
        else:  # f32 WAV
            body = rng.standard_normal(n * channels).astype("<f4").tobytes()
        block = channels * bits // 8
        hdr = b"RIFF" + _struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                      rate * block, block, bits)
        hdr += b"data" + _struct.pack("<I", len(body))
        path.write_bytes(hdr + body)
        return path

    good = wav(tmp_path / "good.wav")
    raw = load_audio_pcm16(good)
    assert raw is not None and raw.dtype == np.int16
    np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, load_audio(good))

    assert load_audio_pcm16(wav(tmp_path / "sr.wav", rate=8_000)) is None
    assert load_audio_pcm16(wav(tmp_path / "st.wav", channels=2)) is None
    assert load_audio_pcm16(wav(tmp_path / "f32.wav", bits=32, fmt=3)) is None
    assert load_audio_pcm16(tmp_path / "missing.wav") is None
    (tmp_path / "junk.wav").write_bytes(b"not a wav")
    assert load_audio_pcm16(tmp_path / "junk.wav") is None

    # odd-length data chunk = corrupt 16-bit PCM: the fast path must refuse
    # (None) so load_audio raises the same canonical error for both paths
    odd = wav(tmp_path / "odd.wav")
    body = odd.read_bytes()
    odd.write_bytes(body[:-1])
    assert load_audio_pcm16(odd) is None
    with pytest.raises(ValueError):
        load_audio(odd)


def test_load_audio_serving_single_parse(tmp_path, monkeypatch):
    """load_audio_serving: int16 passthrough for eligible WAVs, f32 decode
    from ONE parse otherwise (the old pcm16→load_audio chain read every
    non-fast-path WAV twice — ADVICE r3), canonical errors preserved."""
    import struct as _struct

    import whisper_mlx_tpu.audio.decode as dec

    def wav(path, rate=16_000, channels=1, bits=16, fmt=1, n=1600):
        rng = np.random.default_rng(0)
        if bits == 16:
            body = (np.clip(rng.standard_normal(n * channels) * 0.1, -1, 1)
                    * 32767).astype("<i2").tobytes()
        else:
            body = rng.standard_normal(n * channels).astype("<f4").tobytes()
        block = channels * bits // 8
        hdr = b"RIFF" + _struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                      rate * block, block, bits)
        hdr += b"data" + _struct.pack("<I", len(body))
        path.write_bytes(hdr + body)
        return path

    reads = []
    real_read_bytes = dec.Path.read_bytes
    monkeypatch.setattr(dec.Path, "read_bytes",
                        lambda self: (reads.append(str(self)),
                                      real_read_bytes(self))[1])

    fast = wav(tmp_path / "fast.wav")
    out = dec.load_audio_serving(fast)
    assert out.dtype == np.int16 and reads.count(str(fast)) == 1

    reads.clear()
    stereo = wav(tmp_path / "stereo.wav", channels=2)
    out = dec.load_audio_serving(stereo)
    assert out.dtype == np.float32
    assert reads.count(str(stereo)) == 1  # decoded from the one parse
    np.testing.assert_array_equal(out, dec.load_audio(stereo))

    with pytest.raises((ValueError, OSError)):  # canonical load_audio error
        dec.load_audio_serving(tmp_path / "nope.wav")


def test_adaptive_flush_fills_while_device_busy(tiny, monkeypatch):
    """Fill-aware flush (VERDICT r4 #2): while a batch is in flight,
    arrivals staggered far past max_wait_ms must still coalesce into FULL
    batches (an early partial flush would only queue behind the running
    batch). With the old fixed-deadline policy this scenario produced four
    1-window flushes after the first batch; adaptive produces one full one."""
    import time as _time

    params, config, tok = tiny
    batcher = TranscriptionBatcher(
        params, config, tok, batch_size=4, max_wait_ms=10, idle_gap_ms=5,
        decoding=DecodingOptions(sample_len=4),
    )

    # make the "device" slow: each launch's finalize blocks ~0.4 s, so the
    # staggered arrivals (4 x 60 ms > max_wait_ms) land while batch 1 runs
    real_launch = batcher._launch

    def slow_launch(jobs):
        finalize = real_launch(jobs)

        def slow_finalize():
            _time.sleep(0.4)
            return finalize() if callable(finalize) else finalize

        return slow_finalize

    monkeypatch.setattr(batcher, "_launch", slow_launch)

    async def run():
        first = asyncio.create_task(
            batcher.transcribe(make_speechy_audio(seconds=5.0)))
        await asyncio.sleep(0.05)  # batch 1 (1 window) is now in flight
        late = []
        for i in range(4):
            late.append(asyncio.create_task(
                batcher.transcribe(make_speechy_audio(seconds=5.0, seed=i))))
            await asyncio.sleep(0.06)  # stagger past max_wait_ms
        results = await asyncio.gather(first, *late)
        batcher.shutdown()
        return results

    results = asyncio.run(run())
    assert len(results) == 5
    assert batcher.stats["windows"] == 5
    # batch 1 = the lone first window; the 4 staggered windows must ride
    # ONE full batch collected while the device was busy
    assert batcher.stats["batches"] == 2, batcher.stats
    # lone first window (fill 1/4) + one FULL batch of the 4 staggered ones
    assert batcher.stats["fill_sum"] >= 0.25 + 1.0 - 1e-6, batcher.stats
