/* UI components over the pure state module (frontend/state.js).

   Rebuilds the reference SPA surface (reference frontend/src/components/*:
   ChatView, ActivityLog, CommandPalette, ProfileRail, ToolsPanel,
   CollapsibleResult, SkipLink; state fold = useAppState.ts:444-531) as
   no-build vanilla JS — this image has no npm registry. All state
   transitions route through window.AppState so they stay unit-tested
   (frontend/tests.html, tests/test_frontend_state.py). */

import { api, streamSessionChat, ApiError, NetworkError } from "./api.js";

const S = window.AppState; // loaded by index.html before this module

const ui = {
  profiles: [],
  activeProfile: "general",
  sessions: [],
  activeSession: null,
  tools: [],
  state: S.initialState(), // messages/activity/generating/error
  activityCollapsed: false,
  rightTab: "activity", // activity | tools
  paletteRecents: loadRecents(),
};

const $ = (id) => document.getElementById(id);
const el = (tag, cls, text) => {
  const node = document.createElement(tag);
  if (cls) node.className = cls;
  if (text !== undefined) node.textContent = text;
  return node;
};

function setState(next) {
  ui.state = next;
  renderChat();
  renderActivity();
}

/* ---- ProfileRail (reference ProfileRail.tsx: color-coded profiles +
   per-profile session filter) ------------------------------------------- */

const PROFILE_COLORS = {
  general: "var(--accent-blue)",
  mirror: "var(--accent-red)",
  code_runner: "var(--accent-yellow)",
};

function renderProfiles() {
  const root = $("profiles");
  root.replaceChildren();
  for (const p of ui.profiles) {
    const active = p.name === ui.activeProfile;
    const btn = el("button", "chip" + (active ? " active" : ""), p.name);
    btn.setAttribute("role", "radio");
    btn.setAttribute("aria-checked", String(active));
    btn.style.setProperty("--chip-color", PROFILE_COLORS[p.name] || "var(--accent-blue)");
    btn.title = p.description || p.name;
    btn.onclick = () => {
      ui.activeProfile = p.name;
      renderProfiles();
      renderSessions();
    };
    root.append(btn);
  }
}

function renderSessions() {
  const root = $("sessions");
  root.replaceChildren();
  const visible = ui.sessions.filter(
    (s) => !s.profile || s.profile === ui.activeProfile
  );
  for (const s of visible) {
    const row = el("button", "session" + (ui.activeSession === s.id ? " active" : ""));
    row.append(el("span", "title", s.title || "(untitled)"));
    row.append(el("span", "muted", `${s.profile} · ${s.message_count}`));
    row.onclick = () => openSession(s.id);
    const del = el("button", "x", "×");
    del.title = "delete session";
    del.setAttribute("aria-label", `delete session ${s.title || s.id}`);
    del.onclick = async (e) => {
      e.stopPropagation();
      await api.deleteSession(s.id);
      if (ui.activeSession === s.id) {
        ui.activeSession = null;
        setState(S.initialState());
      }
      await refreshSessions();
    };
    row.append(del);
    root.append(row);
  }
}

/* ---- ChatView + CollapsibleResult (reference CollapsibleResult.tsx:
   preview/expand fold per tool result) ----------------------------------- */

function collapsibleResult(toolResult) {
  const { preview, full } = S.formatResult(toolResult.preview, 60);
  const wrap = el("div", "collapsible-result");
  const btn = el("button", "collapsible-toggle");
  btn.setAttribute("aria-expanded", "false");
  const label = toolResult.latencyMs != null
    ? `${toolResult.name} · ${Math.round(toolResult.latencyMs)}ms`
    : toolResult.name;
  btn.append(el("span", "tool-name", label));
  const prev = el("span", "collapsible-preview", preview);
  btn.append(prev);
  const mark = el("span", "collapsible-mark", "+");
  btn.append(mark);
  const body = el("pre", "collapsible-body", full);
  body.hidden = true;
  btn.onclick = () => {
    const open = body.hidden;
    body.hidden = !open;
    prev.hidden = open;
    mark.textContent = open ? "−" : "+";
    btn.setAttribute("aria-expanded", String(open));
  };
  wrap.append(btn, body);
  return wrap;
}

function renderChat() {
  const root = $("chat");
  root.replaceChildren();
  for (const m of ui.state.messages) {
    const bubble = el("div", `msg ${m.role}`);
    bubble.append(el("div", "content", m.content));
    for (const tr of m.toolResults || []) {
      bubble.append(collapsibleResult(tr));
    }
    root.append(bubble);
  }
  if (ui.state.error) {
    root.append(el("div", "msg error", ui.state.error));
  }
  root.scrollTop = root.scrollHeight;
}

/* ---- ActivityLog (reference ActivityLog.tsx: status header, fold-all,
   per-event expandable details with timestamps) -------------------------- */

const EVENT_ICONS = {
  generating: "◌", thinking: "…", tool_call: "⚙", tool_result: "✓",
  response: "▸", complete: "●", error: "✕",
};

function renderActivity() {
  const root = $("activity");
  const act = ui.state.activity;
  const visible = act.events.length > 0 || ui.state.generating;
  root.hidden = !visible && ui.rightTab !== "activity";

  const header = $("activity-header");
  const statusIcon = ui.state.generating
    ? (act.status === "tool" ? "⚙" : "◌") : "●";
  $("activity-status").textContent = `${statusIcon} ${S.activityStatusText(act)}`;
  header.setAttribute("aria-expanded", String(!ui.activityCollapsed));

  const list = $("activity-events");
  list.hidden = ui.activityCollapsed;
  list.replaceChildren();
  for (const ev of act.events) {
    const row = el("div", `event ${ev.type}`);
    const head = el("button", "event-head");
    head.append(el("span", "kind", EVENT_ICONS[ev.type] || "·"));
    head.append(el("span", "text", `${ev.type}${ev.round != null ? ` r${ev.round}` : ""} — ${ev.text}`));
    if (ev.ts) {
      const d = new Date(ev.ts);
      head.append(el("span", "ts muted",
        `${String(d.getHours()).padStart(2, "0")}:${String(d.getMinutes()).padStart(2, "0")}:${String(d.getSeconds()).padStart(2, "0")}`));
    }
    row.append(head);
    if (ev.detail != null) {
      head.setAttribute("aria-expanded", "false");
      const detail = el("pre", "event-detail",
        typeof ev.detail === "string" ? ev.detail : JSON.stringify(ev.detail, null, 2));
      detail.hidden = true;
      head.onclick = () => {
        detail.hidden = !detail.hidden;
        head.setAttribute("aria-expanded", String(!detail.hidden));
      };
      row.append(detail);
    }
    list.append(row);
  }
  list.scrollTop = list.scrollHeight;
}

/* ---- ToolsPanel (reference ToolsPanel.tsx: expandable specs + invoke) --- */

function renderTools(filter = "") {
  const root = $("tools");
  root.replaceChildren();
  const visible = ui.tools.filter((t) => S.fuzzyMatch(filter, t.name));
  $("tool-count").textContent = `${visible.length}/${ui.tools.length}`;
  for (const t of visible) {
    const d = el("details", "tool");
    d.append(el("summary", "", t.name));
    d.append(el("p", "muted", t.description || ""));
    const params = t.parameters?.properties;
    if (params) {
      const ul = el("ul", "tool-params");
      for (const [name, spec] of Object.entries(params)) {
        ul.append(el("li", "", `${name}: ${spec.type || "any"}${spec.description ? " — " + spec.description : ""}`));
      }
      d.append(ul);
    }
    const invoke = el("button", "btn small", "invoke…");
    invoke.onclick = () => invokeToolInteractive(t.name);
    d.append(invoke);
    root.append(d);
  }
}

async function invokeToolInteractive(name) {
  const raw = prompt(`arguments for ${name} (JSON object)`, "{}");
  if (raw == null) return;
  let args;
  try {
    args = JSON.parse(raw);
  } catch {
    alert("invalid JSON");
    return;
  }
  const pushDirect = (type, text, detail) => {
    // direct invocations log to the activity panel only (no chat bubble)
    ui.state = {
      ...ui.state,
      activity: {
        ...ui.state.activity,
        events: [...ui.state.activity.events,
                 { type, round: null, text, detail, ts: Date.now() }],
      },
    };
    switchTab("activity");
    renderActivity();
  };
  try {
    const res = await api.invokeTool(name, args);
    const result = typeof res.result === "string"
      ? res.result : JSON.stringify(res.result);
    pushDirect("tool_result",
      `${name}${res.latency_ms != null ? ` · ${Math.round(res.latency_ms)}ms` : ""}`,
      result.slice(0, 2000));
  } catch (e) {
    pushDirect("error", String(e), null);
  }
}

/* ---- actions ------------------------------------------------------------ */

async function refreshSessions() {
  ui.sessions = (await api.sessions()).sessions;
  renderSessions();
}

async function openSession(id) {
  const s = await api.getSession(id);
  ui.activeSession = id;
  const st = S.initialState();
  st.messages = s.messages.map((m) => ({
    role: m.role, content: m.content,
    toolResults: (m.tool_results || []).map((tr) => ({
      name: tr.name, latencyMs: tr.latency_ms ?? null,
      preview: tr.result_preview ?? tr.result ?? "",
    })),
  }));
  ui.state = st;
  renderSessions();
  renderChat();
  renderActivity();
}

async function send(message) {
  if (!message.trim() || ui.state.generating) return;
  if (!ui.activeSession) {
    const s = await api.createSession(ui.activeProfile);
    ui.activeSession = s.id;
    await refreshSessions();
  }
  setState(S.beginGeneration(ui.state, message, Date.now()));
  try {
    await streamSessionChat(ui.activeSession, message, (ev) => {
      setState(S.foldEvent(ui.state, ev, Date.now()));
      if (ev.event === "complete") refreshSessions();
    });
  } catch (e) {
    const detail = e instanceof ApiError ? `API ${e.status}: ${e.detail}`
      : e instanceof NetworkError ? "network error — is the daemon running?"
      : String(e);
    setState(S.foldEvent(ui.state, { event: "error", detail }, Date.now()));
  } finally {
    setState(S.finishGeneration(ui.state));
  }
}

/* ---- CommandPalette (reference CommandPalette.tsx: ⌘K, fuzzy + score
   ordering, recents-first, arrow-key nav, focus trap via <dialog>) ------- */

function loadRecents() {
  try {
    return JSON.parse(localStorage.getItem("palette_recents") || "[]");
  } catch {
    return [];
  }
}

function recordRecent(id) {
  ui.paletteRecents = [id, ...ui.paletteRecents.filter((x) => x !== id)].slice(0, 5);
  try {
    localStorage.setItem("palette_recents", JSON.stringify(ui.paletteRecents));
  } catch {}
}

function paletteCommands() {
  return [
    { id: "new-session", label: "new session",
      run: () => $("new-session").click() },
    { id: "focus-composer", label: "focus message input",
      run: () => $("composer").focus() },
    { id: "clear-activity", label: "clear activity log",
      run: () => { ui.state = { ...ui.state, activity: { ...ui.state.activity, events: [] } }; renderActivity(); } },
    { id: "toggle-tab", label: "toggle activity/tools panel",
      run: () => switchTab(ui.rightTab === "activity" ? "tools" : "activity") },
    ...ui.profiles.map((p) => ({
      id: `profile:${p.name}`, label: `profile: ${p.name}`,
      run: () => { ui.activeProfile = p.name; renderProfiles(); renderSessions(); },
    })),
    ...ui.sessions.map((s) => ({
      id: `session:${s.id}`, label: `session: ${s.title || s.id}`,
      run: () => openSession(s.id),
    })),
    ...ui.tools.map((t) => ({
      id: `tool:${t.name}`, label: `tool: ${t.name}`,
      run: () => { switchTab("tools"); $("tool-filter").value = t.name; renderTools(t.name); },
    })),
  ];
}

function setupPalette() {
  const dialog = $("palette");
  const input = $("palette-input");
  const results = $("palette-results");
  let selected = 0;
  let current = [];

  const refresh = () => {
    current = S.filterCommands(paletteCommands(), input.value, ui.paletteRecents, 12);
    selected = Math.min(selected, Math.max(current.length - 1, 0));
    results.replaceChildren();
    current.forEach((entry, i) => {
      const row = el("button", "palette-row" + (i === selected ? " selected" : ""), entry.label);
      row.setAttribute("role", "option");
      row.setAttribute("aria-selected", String(i === selected));
      row.onclick = () => execute(entry);
      results.append(row);
    });
  };

  const execute = (entry) => {
    recordRecent(entry.id);
    dialog.close();
    entry.run();
  };

  input.oninput = () => { selected = 0; refresh(); };
  input.onkeydown = (e) => {
    if (e.key === "ArrowDown") {
      e.preventDefault();
      selected = Math.min(selected + 1, current.length - 1);
      refresh();
    } else if (e.key === "ArrowUp") {
      e.preventDefault();
      selected = Math.max(selected - 1, 0);
      refresh();
    } else if (e.key === "Enter") {
      e.preventDefault();
      if (current[selected]) execute(current[selected]);
    }
  };
  document.addEventListener("keydown", (e) => {
    if ((e.metaKey || e.ctrlKey) && e.key === "k") {
      e.preventDefault();
      input.value = "";
      selected = 0;
      refresh();
      dialog.showModal(); // <dialog> modal = native focus trap
      input.focus();
    }
    if (e.key === "Escape" && dialog.open) dialog.close();
  });
  $("palette-open").onclick = () => {
    input.value = "";
    selected = 0;
    refresh();
    dialog.showModal();
    input.focus();
  };
}

/* ---- right panel tabs --------------------------------------------------- */

function switchTab(tab) {
  ui.rightTab = tab;
  $("tab-activity").setAttribute("aria-selected", String(tab === "activity"));
  $("tab-tools").setAttribute("aria-selected", String(tab === "tools"));
  $("activity").hidden = tab !== "activity";
  $("tools-body").hidden = tab !== "tools";
  if (tab === "activity") renderActivity();
}

/* ---- bootstrap ----------------------------------------------------------- */

async function bootstrap() {
  $("composer-form").onsubmit = (e) => {
    e.preventDefault();
    const box = $("composer");
    const text = box.value;
    box.value = "";
    send(text);
  };
  $("composer").addEventListener("keydown", (e) => {
    if (e.key === "Enter" && !e.shiftKey) {
      e.preventDefault();
      $("composer-form").requestSubmit();
    }
  });
  $("new-session").onclick = async () => {
    const s = await api.createSession(ui.activeProfile);
    ui.activeSession = s.id;
    setState(S.initialState());
    await refreshSessions();
  };
  $("tool-filter").oninput = (e) => renderTools(e.target.value);
  $("tab-activity").onclick = () => switchTab("activity");
  $("tab-tools").onclick = () => switchTab("tools");
  $("activity-header").onclick = () => {
    ui.activityCollapsed = !ui.activityCollapsed;
    renderActivity();
  };
  $("activity-clear").onclick = (e) => {
    e.stopPropagation();
    ui.state = { ...ui.state, activity: { ...ui.state.activity, events: [] } };
    renderActivity();
  };
  setupPalette();
  switchTab("activity");

  try {
    const [health, profiles, tools] = await Promise.all([
      api.health(), api.profiles(), api.tools(),
    ]);
    ui.profiles = profiles.profiles;
    ui.tools = tools.tools;
    $("health-dot").classList.add("ok");
    $("health-text").textContent =
      `${health.tools_count} tools · ${health.model_loaded ? "model loaded" : "model lazy"}`;
    renderProfiles();
    renderTools();
    await refreshSessions();
  } catch (e) {
    $("health-text").textContent = "daemon unreachable";
    $("health-dot").classList.add("bad");
  }
}

bootstrap();
