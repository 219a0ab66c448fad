"""Executable browser e2e spec for the web UI (python-playwright).

Mirror of the reference's Playwright spec (`frontend/e2e/app.spec.ts` +
`playwright.config.ts:40-46`): a globalSetup-style daemon spawn, then
DOM-level flows against the served `/ui`. This image ships no browsers, so
the runner (`run-frontend-tests`) gates this spec on playwright presence —
the flows below execute unmodified wherever `playwright install chromium`
has run; `tests/test_frontend_e2e_browser.py` wraps it for pytest with the
same skip gate.

Flows (from the plan in app.spec.md, now executable):
  1. load /ui        → health dot green, 3 profile chips
  2. chat round-trip → user bubble, streamed activity events, assistant
                       bubble, session auto-title in the rail
  3. ⌘K palette      → fuzzy-filter a tool, select → tools panel focused
  4. delete session  → rail updates; reload preserves remaining sessions
  5. daemon death    → health dot red, "daemon unreachable"

Run standalone:  python frontend/e2e/app_spec.py
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

PORT = int(os.environ.get("E2E_PORT", "16997"))
BASE = f"http://127.0.0.1:{PORT}"
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spawn_daemon(tmp: str) -> subprocess.Popen:
    """Reference global-setup equivalent (frontend/e2e/global-setup.ts:36-40)."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        QWEN_SESSIONS_DIR=os.path.join(tmp, "sessions"),
        QWEN_DATA_DIR=os.path.join(tmp, "data"),
        MIRROR_DATA_DIR=os.path.join(tmp, "mirror"),
        LINEAR_MIRROR_DIR=os.path.join(tmp, "linear"),
        VIBEOS_SLACK_MIRROR_DIR=os.path.join(tmp, "slack"),
    )
    env.pop("QWEN_MODEL_PATH", None)  # tiny random model
    proc = subprocess.Popen(
        [sys.executable, "-m", "whisper_mlx_tpu.serving.server",
         "--port", str(PORT), "--ui"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(BASE + "/health", timeout=2) as r:
                if r.status == 200:
                    return proc
        except OSError:
            time.sleep(0.3)
    proc.terminate()
    raise RuntimeError("daemon never became healthy")


def run_flows(page, daemon: subprocess.Popen) -> list[str]:
    """The five DOM flows; returns the list of passed flow names."""
    passed = []

    # -- flow 1: load /ui, health + profiles -------------------------------
    page.goto(BASE + "/ui")
    page.wait_for_selector("#health-dot.ok", timeout=15_000)
    chips = page.locator("#profiles button")
    assert chips.count() == 3, f"expected 3 profile chips, got {chips.count()}"
    passed.append("load-health-profiles")

    # -- flow 2: chat round-trip ------------------------------------------
    page.click("#new-session")
    page.fill("#composer", "What is 2+2? Reply with just the number.")
    page.press("#composer", "Enter")
    page.wait_for_selector(".msg.user", timeout=10_000)
    # activity log streams generation events during the round
    page.wait_for_selector("#activity-events .event", timeout=120_000)
    page.wait_for_selector(".msg.assistant", timeout=180_000)
    # session rail carries the auto-title (first user message prefix)
    title = page.locator("#sessions .session .title").first.inner_text()
    assert "2+2" in title or "What is" in title, f"auto-title missing: {title!r}"
    passed.append("chat-roundtrip")

    # -- flow 3: command palette -------------------------------------------
    page.keyboard.press("Control+k")
    page.wait_for_selector("#palette[open]", timeout=5_000)
    page.fill("#palette-input", "run_python")
    page.wait_for_selector("#palette-results .palette-row", timeout=5_000)
    page.press("#palette-input", "Enter")
    # selecting a tool command switches to the tools tab + prefills filter
    page.wait_for_selector("#tools-body:not([hidden])", timeout=5_000)
    flt = page.input_value("#tool-filter")
    assert "run_python" in flt, f"tool filter not prefilled: {flt!r}"
    passed.append("palette-tool-focus")

    # -- flow 4: delete session + persistence ------------------------------
    before = page.locator("#sessions .session").count()
    page.locator("#sessions .session .x").first.click()
    page.wait_for_function(
        f"document.querySelectorAll('#sessions .session').length == {before - 1}",
        timeout=10_000,
    )
    page.reload()
    page.wait_for_selector("#health-dot.ok", timeout=15_000)
    after = page.locator("#sessions .session").count()
    assert after == before - 1, f"persistence broken: {before - 1} != {after}"
    passed.append("delete-session-persistence")

    # -- flow 5: daemon death ----------------------------------------------
    daemon.send_signal(signal.SIGTERM)
    daemon.wait(timeout=15)
    page.reload(wait_until="domcontentloaded")
    page.wait_for_selector("#health-dot.bad", timeout=15_000)
    text = page.inner_text("#health-text")
    assert "unreachable" in text, f"expected unreachable banner, got {text!r}"
    passed.append("daemon-death-banner")
    return passed


def main() -> int:
    try:
        from playwright.sync_api import sync_playwright
    except ImportError:
        print(json.dumps({"skipped": "playwright not installed in this image"}))
        return 0

    with tempfile.TemporaryDirectory() as tmp:
        daemon = spawn_daemon(tmp)
        try:
            with sync_playwright() as p:
                browser = p.chromium.launch()
                page = browser.new_page()
                passed = run_flows(page, daemon)
                browser.close()
            print(json.dumps({"passed": passed}))
            return 0
        finally:
            if daemon.poll() is None:
                daemon.send_signal(signal.SIGTERM)
                try:
                    daemon.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    daemon.kill()


if __name__ == "__main__":
    raise SystemExit(main())
