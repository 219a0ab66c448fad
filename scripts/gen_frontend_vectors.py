"""Regenerate frontend/test_vectors.json from the Python state mirror.

The mirror (tests/frontend_state_mirror.py) is the offline oracle for
frontend/state.js semantics (no JS runtime in this image). Run after any
intentional semantics change, commit the updated vectors, and re-check the
real JS via frontend/tests.html (`run-frontend-tests`) when a browser is
available.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests import frontend_state_mirror as m  # noqa: E402


def run_fold_case(case: dict) -> dict:
    s = m.initial_state()
    s = m.begin_generation(s, case["send"], 1000)
    for ev in case["events"]:
        s = m.fold_event(s, ev, 1000)
    if case.get("finish"):
        s = m.finish_generation(s)
    return {
        "messages": s["messages"],
        "activity": s["activity"],
        "generating": s["generating"],
        "error": s["error"],
    }


def generate(cases: dict) -> dict:
    return {
        "fold": [
            {"name": c["name"], "result": run_fold_case(c)} for c in cases["fold"]
        ],
        "fuzzy": [
            {"query": c["query"], "text": c["text"],
             "result": m.fuzzy_match(c["query"], c["text"])}
            for c in cases["fuzzy"]
        ],
        "filter": [
            {"name": c["name"],
             "result": [x["id"] for x in m.filter_commands(
                 c["commands"], c["query"], c.get("recent"), c.get("limit", 12))]}
            for c in cases["filter"]
        ],
        "format": [
            {"name": c["name"], "result": m.format_result(c["value"], 60)}
            for c in cases["format"]
        ],
    }


def main() -> None:
    root = os.path.join(os.path.dirname(__file__), "..", "frontend")
    with open(os.path.join(root, "test_cases.json")) as f:
        cases = json.load(f)
    if "--pins" not in sys.argv:
        vectors = generate(cases)
        out = os.path.join(root, "test_vectors.json")
        with open(out, "w") as f:
            json.dump(vectors, f, indent=2, ensure_ascii=False)
            f.write("\n")
        print(f"wrote {out}")
    # print the drift pins to paste into tests/frontend_state_mirror.py
    # (STATE_JS_SHA256 / VECTORS_SHA256) and frontend/tests.js
    # (EXPECTED_VECTORS_SHA256)
    import hashlib

    for name in ("state.js", "test_vectors.json"):
        digest = hashlib.sha256(
            open(os.path.join(root, name), "rb").read()).hexdigest()
        print(f"{name}: {digest}")


if __name__ == "__main__":
    main()
