"""Serving-layer unit tests: chat helpers, registry, sessions, FTS, tools.

Mirrors the reference's unit strategy (SURVEY.md §4): tmp_path + module-dir
patching for storage, no model involved.
"""

import json

import numpy as np
import pytest

from whisper_mlx_tpu.serving.chat import (
    extract_final_response,
    extract_thinking,
    format_tools_prompt,
    parse_tool_calls,
)
from whisper_mlx_tpu.serving.profiles import ALL_PROFILES, get_profile
from whisper_mlx_tpu.serving.sessions import SessionStore
from whisper_mlx_tpu.serving.tools.base import ToolSpec, tool
from whisper_mlx_tpu.serving.tools.google.fts.bm25 import BM25Scorer, tokenize
from whisper_mlx_tpu.serving.tools.registry import ToolRegistry, get_registry


# -- chat helpers ------------------------------------------------------------


def test_parse_tool_calls():
    text = (
        'let me check <tool_call>\n{"name": "search_emails", '
        '"arguments": {"query": "invoice"}}\n</tool_call> and also '
        '<tool_call>{"name": "get_email", "arguments": {"id": "x"}}</tool_call>'
    )
    calls = parse_tool_calls(text)
    assert [c.name for c in calls] == ["search_emails", "get_email"]
    assert calls[0].arguments == {"query": "invoice"}


def test_parse_tool_calls_malformed():
    assert parse_tool_calls("<tool_call>not json</tool_call>") == []
    assert parse_tool_calls("no calls here") == []


def test_extract_final_response_and_thinking():
    text = "<think>hmm\nok</think>The answer is 4.<tool_call>{}</tool_call>"
    assert extract_final_response(text) == "The answer is 4."
    assert extract_thinking(text) == ["hmm\nok"]


def test_format_tools_prompt():
    spec = ToolSpec(name="t1", description="d", parameters={"x": {"type": "string"}},
                    required=("x",))
    out = format_tools_prompt([spec])
    assert "<tools>" in out and "</tools>" in out
    assert '"t1"' in out
    assert "<tool_call>" in out
    assert format_tools_prompt([]) == ""


# -- registry ---------------------------------------------------------------


def test_registry_has_reference_tool_surface():
    reg = get_registry()
    names = set(reg.available_tools)
    # the reference's 24 registered tools (SURVEY.md §2.2 registry row)
    assert len(names) == 24
    for required in ("run_python", "get_current_datetime", "search_linear_issues",
                     "web_search", "browser_navigate", "ocr_document",
                     "search_emails", "search_calendar"):
        assert required in names
    # FTS variants exist as modules but are NOT registered (reference parity)
    assert "search_emails_fts" not in names


def test_registry_execute_sync_and_errors():
    reg = ToolRegistry()

    @tool(name="echo", description="echo")
    def echo(x: str = "") -> str:
        return json.dumps({"echo": x})

    reg.register(echo)
    assert json.loads(reg.execute("echo", {"x": "hi"})) == {"echo": "hi"}
    assert "error" in json.loads(reg.execute("nope", {}))
    # bad arguments are surfaced as error JSON, not exceptions
    assert "error" in json.loads(reg.execute("echo", {"bogus_arg": 1}))


def test_registry_execute_async_runs_sync_tools():
    import asyncio

    reg = ToolRegistry()

    @tool(name="syncy", description="s")
    def syncy() -> str:
        return "\"ok\""

    @tool(name="asyncy", description="a")
    async def asyncy() -> str:
        return "\"ok-async\""

    reg.register(syncy)
    reg.register(asyncy)

    async def run():
        return await reg.execute_async("syncy", {}), await reg.execute_async("asyncy", {})

    r1, r2 = asyncio.run(run())
    assert json.loads(r1) == "ok"
    assert json.loads(r2) == "ok-async"


# -- sessions ---------------------------------------------------------------


def test_session_store_roundtrip(tmp_path):
    store = SessionStore(tmp_path)
    s = store.create(profile="mirror", title="")
    s.add_message("user", "hello world this is a long first message " * 3)
    store.save(s)
    loaded = store.get(s.id)
    assert loaded is not None
    assert loaded.profile == "mirror"
    assert len(loaded.title) <= 60  # auto-title truncation
    assert loaded.messages[0].content.startswith("hello world")

    summaries = store.list_summaries()
    assert summaries[0]["id"] == s.id
    assert summaries[0]["message_count"] == 1

    assert store.delete(s.id)
    assert store.get(s.id) is None


def test_session_store_path_traversal(tmp_path):
    store = SessionStore(tmp_path)
    with pytest.raises(ValueError):
        store.get("../../etc/passwd")
    with pytest.raises(ValueError):
        store.get("a/b")


def test_session_store_prune_empty(tmp_path):
    store = SessionStore(tmp_path)
    empty = store.create()
    full = store.create()
    full.add_message("user", "hi")
    store.save(full)
    removed = store.prune_empty(0)
    assert removed == 1
    assert store.get(empty.id) is None
    assert store.get(full.id) is not None


# -- BM25 -------------------------------------------------------------------


def test_tokenize():
    assert tokenize("The quick brown fox!") == ["quick", "brown", "fox"]
    assert tokenize("a an the") == []
    assert "x" not in tokenize("x y z ab")  # <2 chars dropped


def test_bm25_ranking():
    docs = [
        "the quarterly budget report for finance",
        "lunch menu for the cafeteria",
        "budget planning meeting notes budget review",
        "vacation policy update",
    ]
    scorer = BM25Scorer.from_documents(docs)
    ranked = scorer.rank("budget report")
    assert ranked, "no results"
    top_ids = [i for i, _ in ranked]
    assert top_ids[0] in (0, 2)
    assert 1 not in top_ids and 3 not in top_ids  # zero-score dropped
    # doc with both terms beats doc with one occurrence of one term
    scores = dict(ranked)
    assert scores[0] > scores.get(2, 0) or scores[2] > 0


def test_bm25_empty_query():
    scorer = BM25Scorer.from_documents(["hello world"])
    assert scorer.rank("the a an") == []


# -- profiles ---------------------------------------------------------------


def test_profiles_match_reference_shape():
    assert set(ALL_PROFILES) == {"general", "mirror", "code_runner"}
    general = get_profile("general")
    assert len(general.tools) == 24
    assert general.max_tool_rounds == 8
    mirror = get_profile("mirror")
    assert len(mirror.tools) == 9
    assert "pagination" in mirror.system_prompt.lower() or "page" in mirror.system_prompt.lower()
    code_runner = get_profile("code_runner")
    assert len(code_runner.tools) == 10
    assert code_runner.max_tool_rounds == 10
    with pytest.raises(ValueError):
        get_profile("nope")


# -- legacy agent loop -------------------------------------------------------


def test_tool_calling_agent_loop():
    """ToolCallingAgent: tool round + think-nudge + final answer, with a
    scripted fake model (no weights needed)."""
    import json as _json

    from whisper_mlx_tpu.agents.agent import ToolCallingAgent
    from whisper_mlx_tpu.serving.tools.base import tool
    from whisper_mlx_tpu.serving.tools.registry import get_registry

    calls = {"n": 0}

    class FakeModel:
        def __init__(self, script):
            self.script = script

        def generate(self, messages, max_tokens, temperature):
            out = self.script[calls["n"]]
            calls["n"] += 1
            return out

    reg = get_registry()
    dt_tool = reg.get("get_current_datetime")
    model = FakeModel([
        '<tool_call>{"name": "get_current_datetime", "arguments": {}}</tool_call>',
        "<think>still thinking...</think>",  # triggers the nudge
        "The time is now.",
    ])
    agent = ToolCallingAgent(model=model, tools=[dt_tool], verbose=False,
                             max_tool_rounds=5)
    answer = agent.run("what time is it?")
    assert answer == "The time is now."
    assert calls["n"] == 3
    # history captured for multi-turn REPL use
    assert agent.history[-1]["content"] == "The time is now."


def test_tool_calling_agent_round_limit():
    from whisper_mlx_tpu.agents.agent import ToolCallingAgent
    from whisper_mlx_tpu.serving.tools.registry import get_registry

    class LoopModel:
        def generate(self, messages, max_tokens, temperature):
            return '<tool_call>{"name": "get_current_datetime", "arguments": {}}</tool_call>'

    agent = ToolCallingAgent(
        model=LoopModel(), tools=[get_registry().get("get_current_datetime")],
        verbose=False, max_tool_rounds=2,
    )
    assert "limit" in agent.run("loop forever")


def test_asr_serving_config_applier(monkeypatch):
    """Checkpoint loaders return the PARITY config; the daemon/CLI apply
    the measured-best serving config (runtime/serving_config.py). Forced
    to TPU-mode via env on the CPU backend; QuantTensor scales must stay
    fp32 (the fused kernel's accuracy contract)."""
    import jax.numpy as jnp

    from whisper_mlx_tpu.models.whisper import WhisperConfig, init_params
    from whisper_mlx_tpu.ops.quant import quantize_params
    from whisper_mlx_tpu.runtime.serving_config import apply_asr_serving_config

    monkeypatch.setenv("WTPU_SERVE_PRECISION", "bfloat16")
    monkeypatch.setenv("WTPU_SERVE_FLASH", "1")
    monkeypatch.setenv("WTPU_SERVE_KV", "4")
    monkeypatch.setenv("WTPU_SERVE_SELF_KV", "8")

    cfg = WhisperConfig(n_mels=80, n_vocab=512, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=1,
                        n_text_state=64, n_text_head=4, n_text_layer=1)
    p2, c2 = apply_asr_serving_config(init_params(cfg, seed=0), cfg)
    assert (c2.kv_bits, c2.self_kv_bits, c2.flash_attention) == (4, 8, True)
    assert c2.dtype == jnp.bfloat16
    assert p2["decoder"]["token_emb"].dtype == jnp.bfloat16

    pq, cq = apply_asr_serving_config(
        quantize_params(init_params(cfg, seed=0), bits=4), cfg)
    qt = pq["decoder"]["blocks"][0]["attn"]["q"]["w"]
    assert type(qt).__name__ == "QuantTensor"
    assert qt.scales.dtype == jnp.float32  # NOT cast

    # parity mode: no env → CPU backend leaves everything untouched
    for var in ("WTPU_SERVE_PRECISION", "WTPU_SERVE_FLASH",
                "WTPU_SERVE_KV", "WTPU_SERVE_SELF_KV"):
        monkeypatch.delenv(var)
    p0, c0 = apply_asr_serving_config(init_params(cfg, seed=0), cfg)
    assert (c0.kv_bits, c0.self_kv_bits, c0.flash_attention) == (0, 0, False)
    assert c0.dtype == cfg.dtype
