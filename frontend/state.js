/* Pure app-state module — no DOM, loadable in browser (<script>), as an ES
   shim, or any CommonJS runtime, so the folding logic is unit-testable
   (frontend/tests.html runs it against frontend/test_vectors.json; the same
   vectors are pinned offline by tests/test_frontend_state.py).

   Re-implements the semantics of the reference's useAppState mega-hook
   (reference frontend/src/hooks/useAppState.ts:444-531: SSE → activity fold,
   optimistic user message with revert-on-error) and the CommandPalette
   fuzzy filter (reference frontend/src/components/CommandPalette.tsx:38-115)
   over THIS daemon's wire events (serving/chat.py emits: generating, token,
   thinking, tool_call, tool_result, response, complete, error). */

(function (global) {
  "use strict";

  /* ---- state shape ------------------------------------------------------ */

  function initialState() {
    return {
      messages: [], // {role: user|assistant|assistant-pending, content, toolResults: []}
      activity: {
        status: "idle", // idle | thinking | tool
        currentRound: 0,
        currentTool: null,
        events: [], // {type, round?, text, detail?, ts}
      },
      generating: false,
      error: null,
      optimisticIndex: null, // index of the optimistic user message
    };
  }

  /* shallow-clone helpers: reducers never mutate their input */
  function cloneState(s) {
    return {
      messages: s.messages.slice(),
      activity: {
        status: s.activity.status,
        currentRound: s.activity.currentRound,
        currentTool: s.activity.currentTool,
        events: s.activity.events.slice(),
      },
      generating: s.generating,
      error: s.error,
      optimisticIndex: s.optimisticIndex,
    };
  }

  /* ---- generation lifecycle --------------------------------------------- */

  /* user hits send: optimistic user bubble + activity reset
     (reference useAppState.ts:409-441) */
  function beginGeneration(state, content, now) {
    const s = cloneState(state);
    s.optimisticIndex = s.messages.length;
    s.messages.push({ role: "user", content: content, toolResults: [] });
    s.generating = true;
    s.error = null;
    s.activity = {
      status: "thinking",
      currentRound: 0,
      currentTool: null,
      events: [],
    };
    void now;
    return s;
  }

  /* one SSE event → next state (reference useAppState.ts:444-531 switch) */
  function foldEvent(state, ev, now) {
    const s = cloneState(state);
    const ts = typeof ev.timestamp === "number" && isFinite(ev.timestamp)
      ? ev.timestamp * 1000
      : (now || 0);
    const push = (type, text, detail) => {
      s.activity.events.push({
        type: type,
        round: ev.round,
        text: text,
        detail: detail === undefined ? null : detail,
        ts: ts,
      });
    };

    switch (ev.event) {
      case "generating":
        s.activity.status = "thinking";
        s.activity.currentRound = ev.round != null ? ev.round : s.activity.currentRound;
        s.activity.currentTool = null;
        push("generating", "round " + (ev.round != null ? ev.round : "?"));
        break;

      case "token": {
        let last = s.messages[s.messages.length - 1];
        if (!last || last.role !== "assistant-pending") {
          last = { role: "assistant-pending", content: "", toolResults: [] };
          s.messages.push(last);
        } else {
          last = Object.assign({}, last);
          s.messages[s.messages.length - 1] = last;
        }
        last.content += ev.text || "";
        break;
      }

      case "thinking":
        push("thinking", String(ev.content || "").slice(0, 200),
             ev.content || null);
        break;

      case "tool_call":
        s.activity.status = "tool";
        s.activity.currentTool = ev.name || null;
        push("tool_call", ev.name || "?",
             ev.arguments === undefined ? null : ev.arguments);
        break;

      case "tool_result": {
        s.activity.status = "thinking";
        s.activity.currentTool = null;
        const latency = ev.latency_ms != null ? Math.round(ev.latency_ms) + "ms" : "";
        push("tool_result", (ev.name || "?") + (latency ? " · " + latency : ""),
             ev.result_preview === undefined ? null : ev.result_preview);
        // fold the result into the pending assistant bubble (CollapsibleResult
        // renders per-message toolResults inline)
        let last = s.messages[s.messages.length - 1];
        if (!last || last.role !== "assistant-pending") {
          last = { role: "assistant-pending", content: "", toolResults: [] };
          s.messages.push(last);
        } else {
          last = Object.assign({}, last, { toolResults: last.toolResults.slice() });
          s.messages[s.messages.length - 1] = last;
        }
        last.toolResults.push({
          name: ev.name || "?",
          latencyMs: ev.latency_ms != null ? ev.latency_ms : null,
          preview: ev.result_preview != null ? ev.result_preview : "",
        });
        break;
      }

      case "response": {
        // replace the streaming bubble with the final text, keep tool results
        let toolResults = [];
        const lastIdx = s.messages.length - 1;
        if (lastIdx >= 0 && s.messages[lastIdx].role === "assistant-pending") {
          toolResults = s.messages[lastIdx].toolResults;
          s.messages.pop();
        }
        s.messages.push({
          role: "assistant",
          content: ev.content != null ? ev.content : "",
          toolResults: toolResults,
        });
        push("response", String(ev.content || "").slice(0, 120));
        break;
      }

      case "complete":
        s.activity.status = "idle";
        s.activity.currentTool = null;
        s.generating = false;
        s.optimisticIndex = null;
        push("complete", "done");
        break;

      case "error": {
        s.activity.status = "idle";
        s.activity.currentTool = null;
        s.generating = false;
        s.error = ev.detail != null ? String(ev.detail) : "unknown error";
        push("error", s.error);
        // revert the optimistic user message + any pending bubble
        // (reference useAppState.ts:528-546)
        if (s.messages.length &&
            s.messages[s.messages.length - 1].role === "assistant-pending") {
          s.messages.pop();
        }
        if (s.optimisticIndex != null && s.messages[s.optimisticIndex] &&
            s.messages[s.optimisticIndex].role === "user") {
          s.messages.splice(s.optimisticIndex, 1);
        }
        s.optimisticIndex = null;
        break;
      }

      default:
        push(ev.event || "unknown", JSON.stringify(ev).slice(0, 120));
    }
    return s;
  }

  /* stream ended without complete/error (transport close): settle state */
  function finishGeneration(state) {
    const s = cloneState(state);
    s.generating = false;
    s.optimisticIndex = null;
    if (s.activity.status !== "idle") s.activity.status = "idle";
    s.activity.currentTool = null;
    return s;
  }

  /* ---- activity header (reference ActivityLog.tsx:35-60) ---------------- */

  function activityStatusText(activity) {
    switch (activity.status) {
      case "tool":
        return activity.currentTool
          ? "Running " + activity.currentTool + "…" : "Running tool…";
      case "thinking":
        return activity.currentRound > 0
          ? "Thinking (round " + activity.currentRound + ")…" : "Thinking…";
      default:
        return "Idle";
    }
  }

  /* ---- command palette (reference CommandPalette.tsx:38-115) ------------ */

  /* subsequence match: every query char appears in order */
  function fuzzyMatch(query, text) {
    const q = String(query).toLowerCase();
    const t = String(text).toLowerCase();
    let qi = 0;
    for (let ti = 0; ti < t.length && qi < q.length; ti++) {
      if (t[ti] === q[qi]) qi++;
    }
    return qi === q.length;
  }

  /* higher is better: exact > prefix > word-boundary > substring > spread */
  function scoreMatch(query, text) {
    const q = String(query).toLowerCase();
    const t = String(text).toLowerCase();
    if (!q) return 0;
    if (t === q) return 1000;
    if (t.startsWith(q)) return 800;
    const wb = t.search(new RegExp("[\\s/_-]" + q.replace(/[.*+?^${}()|[\]\\]/g, "\\$&")));
    if (wb >= 0) return 600;
    const idx = t.indexOf(q);
    if (idx >= 0) return 400 - Math.min(idx, 200);
    // subsequence density: tighter spans score higher
    let qi = 0, first = -1, last = -1;
    for (let ti = 0; ti < t.length && qi < q.length; ti++) {
      if (t[ti] === q[qi]) {
        if (first < 0) first = ti;
        last = ti;
        qi++;
      }
    }
    if (qi !== q.length) return -1;
    const span = last - first + 1;
    return Math.max(1, 200 - (span - q.length) * 10 - first);
  }

  /* empty query: recents (in order) then the rest; else fuzzy-filter + score
     (reference CommandPalette.tsx:88-115) */
  function filterCommands(commands, query, recentIds, limit) {
    recentIds = recentIds || [];
    limit = limit || 12;
    if (!query) {
      const byId = {};
      commands.forEach(function (c) { byId[c.id] = c; });
      const recent = recentIds
        .map(function (id) { return byId[id]; })
        .filter(Boolean);
      const others = commands.filter(function (c) {
        return recentIds.indexOf(c.id) === -1;
      });
      return recent.concat(others).slice(0, limit);
    }
    return commands
      .filter(function (c) { return fuzzyMatch(query, c.label); })
      .map(function (c) { return [scoreMatch(query, c.label), c]; })
      .sort(function (a, b) { return b[0] - a[0]; })
      .map(function (p) { return p[1]; })
      .slice(0, limit);
  }

  /* ---- collapsible result formatting (CollapsibleResult.tsx:34-88) ------ */

  function formatResult(value, previewLen) {
    previewLen = previewLen || 60;
    let parsed = value;
    if (typeof value === "string") {
      try {
        parsed = JSON.parse(value);
      } catch (e) {
        parsed = value;
      }
    }
    const full = typeof parsed === "string"
      ? parsed : JSON.stringify(parsed, null, 2);
    const oneLine = full.replace(/\s+/g, " ").trim();
    const preview = oneLine.length > previewLen
      ? oneLine.slice(0, previewLen) + "…" : oneLine;
    return { preview: preview, full: full };
  }

  /* ---- exports ----------------------------------------------------------- */

  const api = {
    initialState: initialState,
    beginGeneration: beginGeneration,
    foldEvent: foldEvent,
    finishGeneration: finishGeneration,
    activityStatusText: activityStatusText,
    fuzzyMatch: fuzzyMatch,
    scoreMatch: scoreMatch,
    filterCommands: filterCommands,
    formatResult: formatResult,
  };

  if (typeof module !== "undefined" && module.exports) {
    module.exports = api;
  }
  global.AppState = api;
})(typeof window !== "undefined" ? window : globalThis);
