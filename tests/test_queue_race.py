"""Queue/race regression (reference ``tests/test_queue_race.py``).

The reference encodes its one known race — queue bookkeeping vs the
generation lock — and its fix (a cooperative ``await asyncio.sleep(0)``
before entering the lock, reference :3-15). These tests fire concurrent
session chats at a subprocess daemon and assert: unique queue positions,
first-in not queued, later arrivals actually waited; plus the double-
cleanup regression (sequential requests leave a clean generation status).
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

PORT = 15998
BASE = f"http://127.0.0.1:{PORT}"


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("race")
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        QWEN_SESSIONS_DIR=str(tmp / "sessions"),
        QWEN_DATA_DIR=str(tmp / "data"),
        MIRROR_DATA_DIR=str(tmp / "mirror"),
    )
    env.pop("QWEN_MODEL_PATH", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_mlx_tpu.serving.server", "--port", str(PORT)],
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
        pytest.fail("daemon never became healthy")
    yield proc
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _post_sync(path, body, timeout=300):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


async def _post(path, body, timeout=300):
    return await asyncio.to_thread(_post_sync, path, body, timeout)


def test_concurrent_chats_queue_fairly(daemon):
    """N concurrent session chats → unique queue positions; the non-queued
    request exists; late arrivals waited (reference :134-233)."""

    async def run():
        sessions = []
        for _ in range(3):
            s = await _post("/v1/sessions", {"profile": "general"})
            sessions.append(s["id"])
        tasks = [
            asyncio.create_task(_post(f"/v1/sessions/{sid}/chat", {"message": f"hi {i}"}))
            for i, sid in enumerate(sessions)
        ]
        return await asyncio.gather(*tasks)

    results = asyncio.run(run())
    stats = [r["queue_stats"] for r in results]
    positions = sorted(s["queue_position"] for s in stats)
    assert positions == [0, 1, 2], stats
    by_pos = {s["queue_position"]: s for s in stats}
    assert by_pos[0]["was_queued"] is False
    assert by_pos[1]["was_queued"] and by_pos[2]["was_queued"]
    # the last request waited for at least one full generation
    assert by_pos[2]["queue_wait_ms"] > 100, stats


def test_sequential_requests_clean_status(daemon):
    """Double-cleanup regression (reference :236-297): after sequential
    chats, the generation status is empty."""
    s = _post_sync("/v1/sessions", {"profile": "general"})
    for i in range(2):
        _post_sync(f"/v1/sessions/{s['id']}/chat", {"message": f"msg {i}"})
    with urllib.request.urlopen(f"{BASE}/v1/generation/status", timeout=10) as r:
        status = json.loads(r.read())
    assert status["queue_length"] == 0
    assert status["active"] is None
