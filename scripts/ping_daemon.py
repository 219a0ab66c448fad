"""Smoke-test probe against a live daemon (reference ``scripts/ping_daemon.py``).

Six checks (reference :49-205): health, profiles, tools, general chat,
direct tool invocation, mirror chat. Pure stdlib (urllib) like the
reference.
"""

from __future__ import annotations

import json
import sys
import urllib.error
import urllib.request

BASE = "http://127.0.0.1:5997"


def _get(path: str):
    with urllib.request.urlopen(BASE + path, timeout=30) as r:
        return json.loads(r.read())


def _post(path: str, body: dict, timeout: float = 300):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main() -> int:
    global BASE
    if len(sys.argv) > 1:
        BASE = sys.argv[1].rstrip("/")
    checks = 0
    failed = 0

    def check(name: str, fn):
        nonlocal checks, failed
        checks += 1
        try:
            fn()
            print(f"  ok: {name}")
        except Exception as exc:
            failed += 1
            print(f"FAIL: {name}: {type(exc).__name__}: {exc}")

    check("health", lambda: _get("/health")["status"] == "ok" or (_ for _ in ()).throw(AssertionError))

    def profiles():
        names = {p["name"] for p in _get("/v1/profiles")["profiles"]}
        assert {"general", "mirror", "code_runner"} <= names, names

    check("profiles", profiles)

    def tools():
        tools = _get("/v1/tools")["tools"]
        assert len(tools) >= 24, len(tools)

    check("tools list", tools)

    def chat():
        r = _post("/v1/chat", {"message": "What is 2+2?", "profile": "general"})
        assert "response" in r and "queue_stats" in r, r.keys()

    check("general chat", chat)

    def invoke():
        r = _post("/v1/tools/get_current_datetime/invoke", {"arguments": {}})
        assert r["tool_name"] == "get_current_datetime"
        assert "latency_ms" in r

    check("direct tool invoke", invoke)

    def mirror_chat():
        r = _post("/v1/chat", {"message": "any recent linear activity?", "profile": "mirror"})
        assert "response" in r

    check("mirror chat", mirror_chat)

    print(f"{checks - failed}/{checks} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
