"""Frontend state semantics, pinned offline (VERDICT r1 item 4).

frontend/state.js is pure vanilla JS with a Python mirror
(tests/frontend_state_mirror.py). These tests run the shared case list
(frontend/test_cases.json) through the mirror and assert the committed
golden vectors (frontend/test_vectors.json) — the same vectors the real JS
checks itself against in frontend/tests.html whenever a browser exists
(`run-frontend-tests`). Behavioral expectations (reverts, status
transitions, palette ordering) are additionally asserted directly.
"""

import json
from pathlib import Path

import pytest

from scripts.gen_frontend_vectors import generate, run_fold_case
from tests import frontend_state_mirror as m

FRONTEND = Path(__file__).resolve().parents[1] / "frontend"


@pytest.fixture(scope="module")
def cases():
    return json.loads((FRONTEND / "test_cases.json").read_text())


@pytest.fixture(scope="module")
def vectors():
    return json.loads((FRONTEND / "test_vectors.json").read_text())


def test_vectors_match_mirror(cases, vectors):
    """Committed goldens == mirror output (regen via
    scripts/gen_frontend_vectors.py after intentional changes)."""
    assert generate(cases) == vectors


def test_fold_happy_path_semantics(cases):
    case = next(c for c in cases["fold"] if c["name"] == "tool_round_happy_path")
    out = run_fold_case(case)
    roles = [msg["role"] for msg in out["messages"]]
    assert roles == ["user", "assistant"]
    assert out["messages"][1]["content"] == "Hi there"
    # tool result folded into the final assistant message (CollapsibleResult)
    assert out["messages"][1]["toolResults"][0]["name"] == "web_search"
    assert out["activity"]["status"] == "idle"
    assert out["generating"] is False
    types = [e["type"] for e in out["activity"]["events"]]
    assert types == ["generating", "thinking", "tool_call", "tool_result",
                     "generating", "response", "complete"]


def test_fold_error_reverts_optimistic(cases):
    case = next(c for c in cases["fold"]
                if c["name"] == "error_reverts_optimistic_message")
    out = run_fold_case(case)
    assert out["messages"] == []  # user bubble + pending stream both reverted
    assert out["error"] == "boom"
    assert out["activity"]["status"] == "idle"
    assert out["generating"] is False


def test_fold_tool_status(cases):
    case = next(c for c in cases["fold"] if c["name"] == "tool_status_transitions")
    out = run_fold_case(case)
    assert out["activity"]["status"] == "tool"
    assert out["activity"]["currentTool"] == "read_file"
    assert m.activity_status_text(out["activity"]) == "Running read_file…"


def test_fold_event_timestamp(cases):
    case = next(c for c in cases["fold"]
                if c["name"] == "event_timestamp_used_when_present")
    out = run_fold_case(case)
    assert out["activity"]["events"][0]["ts"] == 5000  # seconds → ms
    assert out["activity"]["events"][1]["ts"] == 1000  # fallback to now


def test_fuzzy_and_filter_expectations(cases):
    for c in cases["fuzzy"]:
        assert m.fuzzy_match(c["query"], c["text"]) is c["expect"], c
    for c in cases["filter"]:
        out = m.filter_commands(c["commands"], c["query"], c.get("recent"),
                                c.get("limit", 12))
        if "expect_ids" in c:
            assert [x["id"] for x in out] == c["expect_ids"], c["name"]
        if "expect_len" in c:
            assert len(out) == c["expect_len"], c["name"]


def test_format_result_semantics():
    r = m.format_result('{"a": 1}')
    assert r["full"] == '{\n  "a": 1\n}'
    assert r["preview"] == '{ "a": 1 }'
    long = m.format_result("y" * 100, preview_len=60)
    assert long["preview"].endswith("…") and len(long["preview"]) == 61
    assert m.format_result("not json")["full"] == "not json"


def test_score_ordering_tiers():
    assert m.score_match("se", "se") > m.score_match("se", "session")
    assert m.score_match("se", "session") > m.score_match("se", "new session")
    assert m.score_match("se", "new session") > m.score_match("se", "closet")
    assert m.score_match("zz", "abc") == -1


def test_js_and_cases_in_sync(cases, vectors):
    """Structural guard: every case family present in both files with equal
    cardinality, and the JS files reference the shared assets."""
    for key in ("fold", "fuzzy", "filter", "format"):
        assert len(cases[key]) == len(vectors[key]), key
    tests_js = (FRONTEND / "tests.js").read_text()
    assert "test_cases.json" in (FRONTEND / "tests.html").read_text()
    assert "generateVectors" in tests_js and "runSuite" in tests_js
    state_js = (FRONTEND / "state.js").read_text()
    for fn in ("foldEvent", "beginGeneration", "finishGeneration",
               "fuzzyMatch", "scoreMatch", "filterCommands", "formatResult",
               "activityStatusText"):
        assert fn in state_js, f"state.js missing {fn}"


# ---------------------------------------------------------------------------
# static JS sanity (no JS runtime in this image): delimiter balance +
# DOM-id wiring between app.js and index.html
# ---------------------------------------------------------------------------

import re


def _strip_js(src: str) -> str:
    """Remove strings, template literals, comments and regex-free slashes so
    delimiter counting is meaningful."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            quote = c
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == quote:
                    i += 1
                    break
                i += 1
            out.append('""')
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            i += 2
            while i + 1 < n and not (src[i] == "*" and src[i + 1] == "/"):
                i += 1
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


@pytest.mark.parametrize("fname", ["state.js", "app.js", "api.js", "tests.js"])
def test_js_delimiters_balanced(fname):
    src = _strip_js((FRONTEND / fname).read_text())
    for open_c, close_c in ["{}", "()", "[]"]:
        assert src.count(open_c) == src.count(close_c), (
            f"{fname}: unbalanced {open_c}{close_c} "
            f"({src.count(open_c)} vs {src.count(close_c)})")
    # regexes with braces would trip the naive counter — keep them out of
    # the character-class-free style used across these files
    depth = 0
    for ch in src:
        depth += ch == "{"
        depth -= ch == "}"
        assert depth >= 0, f"{fname}: closing brace before opening"
    assert depth == 0


def test_app_js_dom_ids_exist():
    """Every $(\"id\")/getElementById(\"id\") in app.js resolves to an element
    in index.html (catches wiring breaks without a browser)."""
    app = (FRONTEND / "app.js").read_text()
    html = (FRONTEND / "index.html").read_text()
    ids_used = set(re.findall(r'\$\("([\w-]+)"\)', app))
    ids_used |= set(re.findall(r'getElementById\("([\w-]+)"\)', app))
    ids_defined = set(re.findall(r'id="([\w-]+)"', html))
    missing = ids_used - ids_defined
    assert not missing, f"app.js references missing element ids: {sorted(missing)}"


def test_index_html_loads_state_before_app():
    html = (FRONTEND / "index.html").read_text()
    assert html.index("state.js") < html.index("app.js")
    # a11y affordances from the reference surface
    for marker in ("skip-link", 'role="tablist"', 'role="listbox"',
                   'aria-live="polite"', 'role="radiogroup"'):
        assert marker in html, marker


# ---------------------------------------------------------------------------
# drift guard: editing state.js (or the golden vectors) without updating the
# Python mirror must fail loudly (VERDICT r4 weak #6)
# ---------------------------------------------------------------------------

import hashlib


def _sha256(path):
    return hashlib.sha256(path.read_bytes()).hexdigest()


def test_mirror_drift_pins():
    """frontend/state.js and test_vectors.json hashes are pinned in the
    mirror; tests.js pins the SAME vectors hash for the browser leg."""
    assert _sha256(FRONTEND / "state.js") == m.STATE_JS_SHA256, (
        "frontend/state.js changed: replicate the change in "
        "tests/frontend_state_mirror.py, regenerate vectors "
        "(scripts/gen_frontend_vectors.py), and refresh the pins "
        "(gen_frontend_vectors.py --pins)")
    assert _sha256(FRONTEND / "test_vectors.json") == m.VECTORS_SHA256, (
        "test_vectors.json changed without refreshing VECTORS_SHA256")
    tests_js = (FRONTEND / "tests.js").read_text()
    match = re.search(r'EXPECTED_VECTORS_SHA256\s*=\s*\n?\s*"([0-9a-f]{64})"',
                      tests_js)
    assert match, "tests.js lost its EXPECTED_VECTORS_SHA256 pin"
    assert match.group(1) == m.VECTORS_SHA256, (
        "browser-leg pin (frontend/tests.js) disagrees with the mirror pin")


def test_statejs_exports_all_mirrored():
    """Every function state.js exports has a snake_case mirror counterpart —
    adding an export without mirroring it fails here."""
    state_js = (FRONTEND / "state.js").read_text()
    api = re.search(r"const api = \{(.*?)\};", state_js, re.S)
    assert api, "state.js export block not found"
    names = re.findall(r"(\w+)\s*:", api.group(1))
    assert len(names) >= 9, names
    for name in names:
        snake = re.sub(r"([A-Z])", r"_\1", name).lower()
        assert callable(getattr(m, snake, None)), (
            f"state.js exports {name} but the mirror has no {snake}()")
