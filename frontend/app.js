/* App state + components (reference frontend/src/hooks/useAppState.ts — the
   792-LoC mega-hook: sessions, profiles, generation activity, SSE event
   fold at :444-531 — plus ChatView/ActivityLog/CommandPalette/ProfileRail/
   ToolsPanel/CollapsibleResult components, as plain DOM functions). */

import { api, streamSessionChat, ApiError, NetworkError } from "./api.js";

const state = {
  profiles: [],
  activeProfile: "general",
  sessions: [],
  activeSession: null,
  messages: [],
  activity: [],
  tools: [],
  generating: false,
};

const $ = (id) => document.getElementById(id);
const el = (tag, cls, text) => {
  const node = document.createElement(tag);
  if (cls) node.className = cls;
  if (text !== undefined) node.textContent = text;
  return node;
};

/* ---- ProfileRail ---- */
function renderProfiles() {
  const root = $("profiles");
  root.replaceChildren();
  for (const p of state.profiles) {
    const btn = el("button", "chip" + (p.name === state.activeProfile ? " active" : ""), p.name);
    btn.setAttribute("role", "radio");
    btn.setAttribute("aria-checked", String(p.name === state.activeProfile));
    btn.title = p.description;
    btn.onclick = () => { state.activeProfile = p.name; renderProfiles(); };
    root.append(btn);
  }
}

/* ---- Session list ---- */
function renderSessions() {
  const root = $("sessions");
  root.replaceChildren();
  for (const s of state.sessions) {
    const row = el("button", "session" + (state.activeSession === s.id ? " active" : ""));
    row.append(el("span", "title", s.title || "(untitled)"));
    row.append(el("span", "muted", `${s.profile} · ${s.message_count}`));
    row.onclick = () => openSession(s.id);
    const del = el("button", "x", "×");
    del.title = "delete session";
    del.onclick = async (e) => {
      e.stopPropagation();
      await api.deleteSession(s.id);
      if (state.activeSession === s.id) { state.activeSession = null; state.messages = []; renderChat(); }
      await refreshSessions();
    };
    row.append(del);
    root.append(row);
  }
}

/* ---- ChatView + CollapsibleResult ---- */
function renderChat() {
  const root = $("chat");
  root.replaceChildren();
  for (const m of state.messages) {
    const bubble = el("div", `msg ${m.role}`);
    bubble.append(el("div", "content", m.content));
    root.append(bubble);
  }
  root.scrollTop = root.scrollHeight;
}

function pushActivity(kind, text, detail) {
  const root = $("activity");
  root.hidden = false;
  const row = el("div", `event ${kind}`);
  row.append(el("span", "kind", kind));
  row.append(el("span", "text", text));
  if (detail) {
    const d = el("details", "collapsible");
    d.append(el("summary", "", "result"));
    d.append(el("pre", "", detail));
    row.append(d);
  }
  root.append(row);
  root.scrollTop = root.scrollHeight;
}

/* ---- ToolsPanel ---- */
function renderTools(filter = "") {
  const root = $("tools");
  root.replaceChildren();
  const visible = state.tools.filter((t) => t.name.includes(filter));
  $("tool-count").textContent = `${visible.length}/${state.tools.length}`;
  for (const t of visible) {
    const d = el("details", "tool");
    d.append(el("summary", "", t.name));
    d.append(el("p", "muted", t.description || ""));
    root.append(d);
  }
}

/* ---- actions ---- */
async function refreshSessions() {
  state.sessions = (await api.sessions()).sessions;
  renderSessions();
}

async function openSession(id) {
  const s = await api.getSession(id);
  state.activeSession = id;
  state.messages = s.messages.map((m) => ({ role: m.role, content: m.content }));
  renderSessions();
  renderChat();
}

async function send(message) {
  if (!message.trim() || state.generating) return;
  if (!state.activeSession) {
    const s = await api.createSession(state.activeProfile);
    state.activeSession = s.id;
    await refreshSessions();
  }
  state.messages.push({ role: "user", content: message });
  renderChat();
  state.generating = true;
  $("activity").replaceChildren();
  try {
    await streamSessionChat(state.activeSession, message, (ev) => {
      // SSE event fold (reference useAppState.ts:444-531)
      switch (ev.event) {
        case "generating": pushActivity("generating", `round ${ev.round}`); break;
        case "token": {
          // live text: grow a pending assistant bubble
          let last = state.messages[state.messages.length - 1];
          if (!last || last.role !== "assistant-pending") {
            last = { role: "assistant-pending", content: "" };
            state.messages.push(last);
          }
          last.content += ev.text;
          renderChat();
          break;
        }
        case "thinking": pushActivity("thinking", ev.content?.slice(0, 200) ?? ""); break;
        case "tool_call": pushActivity("tool", `${ev.name}(${JSON.stringify(ev.arguments)})`); break;
        case "tool_result":
          pushActivity("result", `${ev.name} · ${Math.round(ev.latency_ms)}ms`, ev.result_preview);
          break;
        case "response": {
          // replace the pending bubble with the final response
          const lastIdx = state.messages.length - 1;
          if (lastIdx >= 0 && state.messages[lastIdx].role === "assistant-pending") {
            state.messages.splice(lastIdx, 1);
          }
          state.messages.push({ role: "assistant", content: ev.content });
          renderChat();
          break;
        }
        case "complete": refreshSessions(); break;
        case "error": pushActivity("error", ev.detail ?? "unknown error"); break;
      }
    });
  } catch (e) {
    const text = e instanceof ApiError ? `API ${e.status}: ${e.detail}`
      : e instanceof NetworkError ? "network error — is the daemon running?"
      : String(e);
    pushActivity("error", text);
  } finally {
    state.generating = false;
  }
}

/* ---- CommandPalette ---- */
function paletteEntries() {
  return [
    ...state.sessions.map((s) => ({ label: `session: ${s.title || s.id}`, run: () => openSession(s.id) })),
    ...state.profiles.map((p) => ({ label: `profile: ${p.name}`, run: () => { state.activeProfile = p.name; renderProfiles(); } })),
    ...state.tools.map((t) => ({ label: `tool: ${t.name}`, run: () => { $("tool-filter").value = t.name; renderTools(t.name); } })),
  ];
}

function setupPalette() {
  const dialog = $("palette");
  const input = $("palette-input");
  const results = $("palette-results");
  const refresh = () => {
    const q = input.value.toLowerCase();
    results.replaceChildren();
    for (const entry of paletteEntries().filter((e) => e.label.toLowerCase().includes(q)).slice(0, 12)) {
      const row = el("button", "palette-row", entry.label);
      row.onclick = () => { entry.run(); dialog.close(); };
      results.append(row);
    }
  };
  input.oninput = refresh;
  document.addEventListener("keydown", (e) => {
    if ((e.metaKey || e.ctrlKey) && e.key === "k") {
      e.preventDefault();
      input.value = "";
      refresh();
      dialog.showModal();
      input.focus();
    }
    if (e.key === "Escape" && dialog.open) dialog.close();
  });
}

/* ---- bootstrap ---- */
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
    const s = await api.createSession(state.activeProfile);
    state.activeSession = s.id;
    state.messages = [];
    renderChat();
    await refreshSessions();
  };
  $("tool-filter").oninput = (e) => renderTools(e.target.value);
  setupPalette();

  try {
    const [health, profiles, tools] = await Promise.all([
      api.health(), api.profiles(), api.tools(),
    ]);
    state.profiles = profiles.profiles;
    state.tools = tools.tools;
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
