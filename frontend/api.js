/* Typed-ish API client (reference frontend/src/api/client.ts:99-320).
   Error taxonomy preserved: ApiError (HTTP status + detail) vs NetworkError. */

export class ApiError extends Error {
  constructor(status, detail) {
    super(`API error ${status}: ${detail}`);
    this.status = status;
    this.detail = detail;
  }
}
export class NetworkError extends Error {}

const BASE = "";

async function request(path, options = {}) {
  let resp;
  try {
    resp = await fetch(BASE + path, {
      headers: { "Content-Type": "application/json" },
      ...options,
    });
  } catch (e) {
    throw new NetworkError(String(e));
  }
  if (!resp.ok) {
    let detail = resp.statusText;
    try { detail = (await resp.json()).detail ?? detail; } catch {}
    throw new ApiError(resp.status, detail);
  }
  return resp.json();
}

export const api = {
  health: () => request("/health"),
  profiles: () => request("/v1/profiles"),
  tools: () => request("/v1/tools"),
  invokeTool: (name, args) =>
    request(`/v1/tools/${name}/invoke`, {
      method: "POST", body: JSON.stringify({ arguments: args }),
    }),
  sessions: () => request("/v1/sessions"),
  createSession: (profile) =>
    request("/v1/sessions", { method: "POST", body: JSON.stringify({ profile }) }),
  getSession: (id) => request(`/v1/sessions/${id}`),
  deleteSession: (id) => request(`/v1/sessions/${id}`, { method: "DELETE" }),
  generationStatus: () => request("/v1/generation/status"),
};

/* SSE consumer (reference frontend/src/api/client.ts:222+ streamSessionChat):
   POST + ReadableStream parse of `data: {...}` frames, onEvent per frame. */
export async function streamSessionChat(sessionId, message, onEvent) {
  let resp;
  try {
    resp = await fetch(`/v1/sessions/${sessionId}/chat/stream`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ message }),
    });
  } catch (e) {
    throw new NetworkError(String(e));
  }
  if (!resp.ok) {
    let detail = resp.statusText;
    try { detail = (await resp.json()).detail ?? detail; } catch {}
    throw new ApiError(resp.status, detail);
  }
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let buf = "";
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += decoder.decode(value, { stream: true });
    let idx;
    while ((idx = buf.indexOf("\n\n")) >= 0) {
      const frame = buf.slice(0, idx);
      buf = buf.slice(idx + 2);
      for (const line of frame.split("\n")) {
        if (line.startsWith("data: ")) {
          try { onEvent(JSON.parse(line.slice(6))); } catch {}
        }
      }
    }
  }
}
