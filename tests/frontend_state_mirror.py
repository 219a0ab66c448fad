"""Python mirror of frontend/state.js — pins the frontend state semantics.

This image ships no JS runtime or browser, so the vanilla-JS state module
cannot execute under pytest. Instead this mirror implements the SAME
functions 1:1; scripts/gen_frontend_vectors.py renders the shared case list
(frontend/tests.js FOLD_CASES et al.) through the mirror into
frontend/test_vectors.json, and:

- tests/test_frontend_state.py asserts the mirror reproduces the committed
  vectors (semantics pinned offline, forever);
- frontend/tests.html runs the REAL state.js against the same vectors in
  any browser (the `run-frontend-tests` launcher) — any divergence between
  mirror and JS fails there.

Keep function-for-function parity with frontend/state.js when editing.
"""

from __future__ import annotations

import json
import re
from typing import Any

# Drift pins (tests/test_frontend_state.py::test_mirror_drift_pins): any
# edit to frontend/state.js or frontend/test_vectors.json fails CI until
# the change is replicated here, vectors are regenerated
# (scripts/gen_frontend_vectors.py), and BOTH pins are refreshed —
# `python scripts/gen_frontend_vectors.py --pins` prints the new values.
# frontend/tests.js pins the same vectors hash for the browser leg.
STATE_JS_SHA256 = "7f2ec547393f5346cc952fef48f165662bf588e38fb956d84c5bc3e424b7834d"
VECTORS_SHA256 = "2b018ca95f9df7cc574ebea4155057f56501fe4838d56a2a9d774506b4b40861"


def initial_state() -> dict:
    return {
        "messages": [],
        "activity": {
            "status": "idle",
            "currentRound": 0,
            "currentTool": None,
            "events": [],
        },
        "generating": False,
        "error": None,
        "optimisticIndex": None,
    }


def _clone(s: dict) -> dict:
    return {
        "messages": [dict(m, toolResults=list(m["toolResults"])) for m in s["messages"]],
        "activity": dict(s["activity"], events=list(s["activity"]["events"])),
        "generating": s["generating"],
        "error": s["error"],
        "optimisticIndex": s["optimisticIndex"],
    }


def begin_generation(state: dict, content: str, now: float) -> dict:
    s = _clone(state)
    s["optimisticIndex"] = len(s["messages"])
    s["messages"].append({"role": "user", "content": content, "toolResults": []})
    s["generating"] = True
    s["error"] = None
    s["activity"] = {
        "status": "thinking", "currentRound": 0, "currentTool": None, "events": [],
    }
    return s


def fold_event(state: dict, ev: dict, now: float) -> dict:  # noqa: C901
    s = _clone(state)
    ts = ev["timestamp"] * 1000 if isinstance(ev.get("timestamp"), (int, float)) else now

    def push(type_: str, text: str, detail: Any = None) -> None:
        s["activity"]["events"].append({
            "type": type_, "round": ev.get("round"),
            "text": text, "detail": detail, "ts": ts,
        })

    kind = ev.get("event")
    if kind == "generating":
        s["activity"]["status"] = "thinking"
        if ev.get("round") is not None:
            s["activity"]["currentRound"] = ev["round"]
        s["activity"]["currentTool"] = None
        push("generating", f"round {ev['round'] if ev.get('round') is not None else '?'}")
    elif kind == "token":
        last = s["messages"][-1] if s["messages"] else None
        if not last or last["role"] != "assistant-pending":
            last = {"role": "assistant-pending", "content": "", "toolResults": []}
            s["messages"].append(last)
        last["content"] += ev.get("text") or ""
    elif kind == "thinking":
        content = str(ev.get("content") or "")
        push("thinking", content[:200], ev.get("content") or None)
    elif kind == "tool_call":
        s["activity"]["status"] = "tool"
        s["activity"]["currentTool"] = ev.get("name")
        push("tool_call", ev.get("name") or "?",
             ev["arguments"] if "arguments" in ev else None)
    elif kind == "tool_result":
        s["activity"]["status"] = "thinking"
        s["activity"]["currentTool"] = None
        latency = (
            f"{round(ev['latency_ms'])}ms" if ev.get("latency_ms") is not None else ""
        )
        name = ev.get("name") or "?"
        push("tool_result", f"{name} · {latency}" if latency else name,
             ev.get("result_preview"))
        last = s["messages"][-1] if s["messages"] else None
        if not last or last["role"] != "assistant-pending":
            last = {"role": "assistant-pending", "content": "", "toolResults": []}
            s["messages"].append(last)
        last["toolResults"].append({
            "name": name,
            "latencyMs": ev.get("latency_ms"),
            "preview": ev.get("result_preview") or "",
        })
    elif kind == "response":
        tool_results: list = []
        if s["messages"] and s["messages"][-1]["role"] == "assistant-pending":
            tool_results = s["messages"][-1]["toolResults"]
            s["messages"].pop()
        s["messages"].append({
            "role": "assistant",
            "content": ev.get("content") if ev.get("content") is not None else "",
            "toolResults": tool_results,
        })
        push("response", str(ev.get("content") or "")[:120])
    elif kind == "complete":
        s["activity"]["status"] = "idle"
        s["activity"]["currentTool"] = None
        s["generating"] = False
        s["optimisticIndex"] = None
        push("complete", "done")
    elif kind == "error":
        s["activity"]["status"] = "idle"
        s["activity"]["currentTool"] = None
        s["generating"] = False
        s["error"] = str(ev["detail"]) if ev.get("detail") is not None else "unknown error"
        push("error", s["error"])
        if s["messages"] and s["messages"][-1]["role"] == "assistant-pending":
            s["messages"].pop()
        oi = s["optimisticIndex"]
        if oi is not None and oi < len(s["messages"]) and s["messages"][oi]["role"] == "user":
            del s["messages"][oi]
        s["optimisticIndex"] = None
    else:
        push(kind or "unknown", _json_stringify(ev)[:120])
    return s


def finish_generation(state: dict) -> dict:
    s = _clone(state)
    s["generating"] = False
    s["optimisticIndex"] = None
    if s["activity"]["status"] != "idle":
        s["activity"]["status"] = "idle"
    s["activity"]["currentTool"] = None
    return s


def activity_status_text(activity: dict) -> str:
    if activity["status"] == "tool":
        return (f"Running {activity['currentTool']}…"
                if activity["currentTool"] else "Running tool…")
    if activity["status"] == "thinking":
        return (f"Thinking (round {activity['currentRound']})…"
                if activity["currentRound"] > 0 else "Thinking…")
    return "Idle"


def fuzzy_match(query: str, text: str) -> bool:
    q = str(query).lower()
    t = str(text).lower()
    qi = 0
    for ch in t:
        if qi < len(q) and ch == q[qi]:
            qi += 1
    return qi == len(q)


def score_match(query: str, text: str) -> int:
    q = str(query).lower()
    t = str(text).lower()
    if not q:
        return 0
    if t == q:
        return 1000
    if t.startswith(q):
        return 800
    if re.search(r"[\s/_-]" + re.escape(q), t):
        return 600
    idx = t.find(q)
    if idx >= 0:
        return 400 - min(idx, 200)
    qi, first, last = 0, -1, -1
    for ti, ch in enumerate(t):
        if qi < len(q) and ch == q[qi]:
            if first < 0:
                first = ti
            last = ti
            qi += 1
    if qi != len(q):
        return -1
    span = last - first + 1
    return max(1, 200 - (span - len(q)) * 10 - first)


def filter_commands(commands: list, query: str, recent_ids: list | None = None,
                    limit: int = 12) -> list:
    recent_ids = recent_ids or []
    if not query:
        by_id = {c["id"]: c for c in commands}
        recent = [by_id[i] for i in recent_ids if i in by_id]
        others = [c for c in commands if c["id"] not in recent_ids]
        return (recent + others)[:limit]
    matched = [c for c in commands if fuzzy_match(query, c["label"])]
    # stable sort by descending score (matches JS Array.sort comparator here
    # because scores are ints and Python's sort is stable like V8's)
    return sorted(matched, key=lambda c: -score_match(query, c["label"]))[:limit]


def _json_stringify(value: Any, indent: int | None = None) -> str:
    """json.dumps tuned to match JSON.stringify output."""
    if indent is None:
        return json.dumps(value, ensure_ascii=False, separators=(",", ":"))
    return json.dumps(value, ensure_ascii=False, indent=indent)


def format_result(value: Any, preview_len: int = 60) -> dict:
    parsed = value
    if isinstance(value, str):
        try:
            parsed = json.loads(value)
        except (ValueError, TypeError):
            parsed = value
    full = parsed if isinstance(parsed, str) else _json_stringify(parsed, indent=2)
    one_line = re.sub(r"\s+", " ", full).strip()
    preview = one_line[:preview_len] + "…" if len(one_line) > preview_len else one_line
    return {"preview": preview, "full": full}
