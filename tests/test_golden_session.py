"""Golden-session daemon e2e: SEMANTIC assertions without model weights.

The reference e2e asserts real answers ("what is 2+2" → "4") because it
serves downloaded weights (reference tests/test_daemon_e2e.py:617-670); this
image has none, so tests/test_daemon_e2e.py is schema-only. Here a scripted
deterministic engine (serving/scripted.py, QWEN_SCRIPTED_MODEL) drives the
REAL agent loop — ChatML build, <tool_call> parse, registry execution of the
real run_python tool, tool-response feedback into round 2, SSE streaming,
session persistence — and the answers are assertable: the final response
can only contain the tool's stdout if the whole loop actually ran.
"""

import asyncio
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import pytest

PORT = 15996
BASE = f"http://127.0.0.1:{PORT}"

SCRIPT = {
    "rules": [
        {
            "match": "what is 2+2",
            "response": (
                "<think>I should compute this with the python tool.</think>\n"
                "<tool_call>{\"name\": \"run_python\", "
                "\"arguments\": {\"code\": \"print(2+2)\"}}</tool_call>"
            ),
        },
        {
            "match": "<tool_response>",
            "response": "The tool returned: {{tool_response}} — so the answer is 4.",
        },
    ],
    "default": "I have no script for that.",
}


@pytest.fixture(scope="module")
def golden_daemon(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    script_path = tmp / "script.json"
    script_path.write_text(json.dumps(SCRIPT))
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        QWEN_SCRIPTED_MODEL=str(script_path),
        QWEN_SESSIONS_DIR=str(tmp / "sessions"),
        QWEN_DATA_DIR=str(tmp / "data"),
        MIRROR_DATA_DIR=str(tmp / "mirror"),
    )
    env.pop("QWEN_MODEL_PATH", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_mlx_tpu.serving.server",
         "--port", str(PORT)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(f"{BASE}/health", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception:
            time.sleep(0.3)
    else:
        proc.terminate()
        pytest.fail("golden daemon never became healthy")
    yield proc
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _post(path, body, timeout=300):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_golden_tool_round_answer(golden_daemon):
    """'what is 2+2' → scripted tool call → REAL run_python executes →
    stdout '4' flows back into the final response."""
    s = _post("/v1/sessions", {"profile": "mirror"})
    r = _post(f"/v1/sessions/{s['id']}/chat", {"message": "what is 2+2?"})
    assert "so the answer is 4" in r["response"]
    # the interpolated tool response proves run_python really executed
    assert '\\"stdout\\": \\"4' in json.dumps(r["response"]) or '"stdout": "4' in r["response"]
    assert r["rounds"] == 2
    assert [t["name"] for t in r["tool_results"]] == ["run_python"]
    out = json.loads(r["tool_results"][0]["result"])
    assert out["stdout"].strip() == "4"
    assert out["returncode"] == 0
    # thinking block extracted, not leaked into the response
    assert r["thinking"] and "compute" in r["thinking"][0]
    assert "<think>" not in r["response"]


def test_golden_session_persisted(golden_daemon):
    """The session store records the user turn, assistant turn, and the tool
    interaction (reference session schema)."""
    s = _post("/v1/sessions", {"profile": "mirror"})
    _post(f"/v1/sessions/{s['id']}/chat", {"message": "what is 2+2?"})
    with urllib.request.urlopen(f"{BASE}/v1/sessions/{s['id']}", timeout=10) as r:
        sess = json.loads(r.read())
    roles = [m["role"] for m in sess["messages"]]
    assert roles[:2] == ["user", "assistant"]
    assert "so the answer is 4" in sess["messages"][1]["content"]


def test_golden_sse_event_sequence(golden_daemon):
    """SSE stream emits the full agent-event sequence with the scripted
    semantics (generating → thinking → tool_call → tool_result →
    generating → response)."""
    s = _post("/v1/sessions", {"profile": "mirror"})
    req = urllib.request.Request(
        f"{BASE}/v1/sessions/{s['id']}/chat/stream",
        data=json.dumps({"message": "what is 2+2?"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=300) as resp:
        buf = b""
        while True:
            chunk = resp.read(1)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                frame, buf = buf.split(b"\n\n", 1)
                for line in frame.split(b"\n"):
                    if line.startswith(b"data: "):
                        events.append(json.loads(line[6:]))
    kinds = [e.get("event") for e in events]
    assert "tool_call" in kinds and "tool_result" in kinds
    assert kinds.index("tool_call") < kinds.index("tool_result")
    tc = next(e for e in events if e.get("event") == "tool_call")
    assert tc["name"] == "run_python"
    assert tc["arguments"]["code"] == "print(2+2)"
    tr = next(e for e in events if e.get("event") == "tool_result")
    assert '"stdout": "4' in tr["result_preview"]
    resp_ev = next(e for e in events if e.get("event") == "response")
    assert "so the answer is 4" in resp_ev["content"]


def test_golden_default_rule(golden_daemon):
    s = _post("/v1/sessions", {"profile": "mirror"})
    r = _post(f"/v1/sessions/{s['id']}/chat", {"message": "unscripted input"})
    assert r["response"] == "I have no script for that."
    assert r["rounds"] == 1 and not r["tool_results"]
