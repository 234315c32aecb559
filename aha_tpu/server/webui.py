"""Built-in web console served at GET / (the aha-ui equivalent).

The reference ships a separate Tauri/React desktop app (aha-ui/) whose live
features are chat, model status, and usage display on top of the same HTTP
API.  Here the console is a single self-contained page served by the engine's
own server — no build step, no extra process; it drives exactly the public
endpoints (/health, /models, /v1/chat/completions SSE, /v1/audio/
transcriptions, /audio/speech, /images/remove_background).
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>aha console</title>
<style>
  :root {
    --bg: #0f1117; --panel: #181b24; --panel2: #1f2330; --text: #e6e8ee;
    --dim: #8b90a0; --accent: #6ea8fe; --ok: #4ade80; --err: #f87171;
    --think: #2a2f3f;
  }
  * { box-sizing: border-box; }
  body { margin: 0; background: var(--bg); color: var(--text);
         font: 14px/1.5 system-ui, sans-serif; height: 100vh;
         display: flex; flex-direction: column; }
  header { display: flex; align-items: center; gap: 12px;
           padding: 10px 16px; background: var(--panel);
           border-bottom: 1px solid #262b38; }
  header h1 { font-size: 15px; margin: 0; font-weight: 600; }
  #model-badge { color: var(--accent); font-family: ui-monospace, monospace;
                 font-size: 13px; }
  #health { margin-left: auto; font-size: 12px; color: var(--dim); }
  #health.ok::before { content: "● "; color: var(--ok); }
  #health.err::before { content: "● "; color: var(--err); }
  nav { display: flex; gap: 4px; padding: 8px 16px 0; background: var(--panel); }
  nav button { background: none; border: none; color: var(--dim);
               padding: 8px 14px; cursor: pointer; font-size: 13px;
               border-bottom: 2px solid transparent; }
  nav button.active { color: var(--text); border-color: var(--accent); }
  main { flex: 1; overflow: hidden; display: flex; }
  .tab { display: none; flex: 1; flex-direction: column; padding: 16px;
         overflow: hidden; }
  .tab.active { display: flex; }
  #chat-log { flex: 1; overflow-y: auto; display: flex;
              flex-direction: column; gap: 10px; padding-bottom: 10px; }
  .msg { max-width: 82%; padding: 10px 14px; border-radius: 12px;
         white-space: pre-wrap; word-break: break-word; }
  .msg.user { align-self: flex-end; background: #2b3a55; }
  .msg.assistant { align-self: flex-start; background: var(--panel2); }
  .msg .think { display: block; color: var(--dim); font-size: 12px;
                background: var(--think); border-radius: 8px;
                padding: 6px 10px; margin-bottom: 8px; }
  .msg .usage { display: block; color: var(--dim); font-size: 11px;
                margin-top: 8px; }
  form.bar { display: flex; gap: 8px; margin-top: 10px; }
  textarea, input[type=text] { flex: 1; background: var(--panel2);
    border: 1px solid #2c3242; color: var(--text); border-radius: 10px;
    padding: 10px 12px; font: inherit; resize: none; }
  button.send { background: var(--accent); color: #0c1220; border: none;
    border-radius: 10px; padding: 0 18px; font-weight: 600; cursor: pointer; }
  button.send:disabled { opacity: .5; cursor: default; }
  .pane { background: var(--panel); border-radius: 12px; padding: 16px;
          max-width: 680px; }
  .pane h2 { margin: 0 0 10px; font-size: 14px; }
  .pane .row { display: flex; gap: 8px; margin: 10px 0; align-items: center; }
  .out { margin-top: 12px; color: var(--dim); white-space: pre-wrap; }
  .out img { max-width: 100%; border-radius: 8px;
             background: repeating-conic-gradient(#333 0 25%, #444 0 50%)
                         0 0 / 20px 20px; }
  audio { width: 100%; margin-top: 8px; }
</style>
</head>
<body>
<header>
  <h1>aha</h1>
  <span id="model-badge">loading…</span>
  <span id="health">checking…</span>
</header>
<nav>
  <button data-tab="chat" class="active">Chat</button>
  <button data-tab="asr">Transcribe</button>
  <button data-tab="tts">Speech</button>
  <button data-tab="rmbg">Remove background</button>
</nav>
<main>
  <section id="tab-chat" class="tab active">
    <div id="chat-log"></div>
    <form class="bar" id="chat-form">
      <textarea id="chat-input" rows="2"
        placeholder="Message the model…  (Enter to send, Shift+Enter for newline)"></textarea>
      <button class="send" id="chat-send">Send</button>
    </form>
  </section>
  <section id="tab-asr" class="tab">
    <div class="pane">
      <h2>Audio transcription — POST /v1/audio/transcriptions</h2>
      <div class="row"><input type="file" id="asr-file"
        accept=".wav,.mp3,.ogg,.flac,audio/*">
        <button class="send" id="asr-send">Transcribe</button></div>
      <div class="out" id="asr-out"></div>
    </div>
  </section>
  <section id="tab-tts" class="tab">
    <div class="pane">
      <h2>Text to speech — POST /audio/speech</h2>
      <div class="row"><input type="text" id="tts-text"
        placeholder="Text to speak…">
        <button class="send" id="tts-send">Speak</button></div>
      <div class="out" id="tts-out"></div>
    </div>
  </section>
  <section id="tab-rmbg" class="tab">
    <div class="pane">
      <h2>Background removal — POST /images/remove_background</h2>
      <div class="row"><input type="file" id="rmbg-file" accept="image/*">
        <button class="send" id="rmbg-send">Remove</button></div>
      <div class="out" id="rmbg-out"></div>
    </div>
  </section>
</main>
<script>
const $ = (id) => document.getElementById(id);
let modelId = "";
const history = [];

async function refreshStatus() {
  try {
    const h = await fetch("/health");
    $("health").textContent = h.ok ? "healthy" : "unhealthy";
    $("health").className = h.ok ? "ok" : "err";
    const m = await (await fetch("/models")).json();
    modelId = (m.data && m.data[0] && m.data[0].id) || "";
    $("model-badge").textContent = modelId || "no model";
  } catch (e) {
    $("health").textContent = "unreachable"; $("health").className = "err";
  }
}
refreshStatus(); setInterval(refreshStatus, 10000);

document.querySelectorAll("nav button").forEach(b => b.onclick = () => {
  document.querySelectorAll("nav button").forEach(x =>
    x.classList.toggle("active", x === b));
  document.querySelectorAll(".tab").forEach(t =>
    t.classList.toggle("active", t.id === "tab-" + b.dataset.tab));
});

function addMsg(role) {
  const div = document.createElement("div");
  div.className = "msg " + role;
  $("chat-log").appendChild(div);
  $("chat-log").scrollTop = 1e9;
  return div;
}

async function sendChat(ev) {
  ev.preventDefault();
  const text = $("chat-input").value.trim();
  if (!text) return;
  $("chat-input").value = "";
  $("chat-send").disabled = true;
  addMsg("user").textContent = text;
  history.push({role: "user", content: text});
  const out = addMsg("assistant");
  const think = document.createElement("span"); think.className = "think";
  const body = document.createElement("span");
  let content = "", reasoning = "";
  try {
    const r = await fetch("/v1/chat/completions", {
      method: "POST", headers: {"Content-Type": "application/json"},
      body: JSON.stringify({model: modelId, messages: history, stream: true}),
    });
    if (!r.ok) throw new Error(await r.text());
    const reader = r.body.getReader();
    const dec = new TextDecoder();
    let buf = "";
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let i;
      while ((i = buf.indexOf("\\n\\n")) >= 0) {
        const line = buf.slice(0, i).trim(); buf = buf.slice(i + 2);
        if (!line.startsWith("data:")) continue;
        const payload = line.slice(5).trim();
        if (payload === "[DONE]") continue;
        const chunk = JSON.parse(payload);
        const d = chunk.choices && chunk.choices[0] && chunk.choices[0].delta;
        if (d && d.reasoning_content) {
          reasoning += d.reasoning_content;
          if (!think.parentNode) out.appendChild(think);
          think.textContent = reasoning;
        }
        if (d && d.content) { content += d.content; }
        if (!body.parentNode) out.appendChild(body);
        body.textContent = content;
        if (chunk.usage) {
          const u = chunk.usage;
          const span = document.createElement("span");
          span.className = "usage";
          span.textContent = u.prompt_tokens + " prompt tok · "
            + u.completion_tokens + " completion tok · "
            + (u.completion_tps || 0).toFixed(1) + " tok/s";
          out.appendChild(span);
        }
        $("chat-log").scrollTop = 1e9;
      }
    }
    history.push({role: "assistant", content});
  } catch (e) {
    body.textContent = "error: " + e.message;
    if (!body.parentNode) out.appendChild(body);
  }
  $("chat-send").disabled = false;
}
$("chat-form").onsubmit = sendChat;
$("chat-input").addEventListener("keydown", (e) => {
  if (e.key === "Enter" && !e.shiftKey) sendChat(e);
});

$("asr-send").onclick = async () => {
  const f = $("asr-file").files[0];
  if (!f) return;
  $("asr-out").textContent = "transcribing…";
  const fd = new FormData();
  fd.append("file", f, f.name);
  try {
    const r = await fetch("/v1/audio/transcriptions", {method: "POST", body: fd});
    const t = await r.text();
    $("asr-out").textContent = r.ok ? (JSON.parse(t).text || t) : t;
  } catch (e) { $("asr-out").textContent = "error: " + e.message; }
};

$("tts-send").onclick = async () => {
  const text = $("tts-text").value.trim();
  if (!text) return;
  $("tts-out").textContent = "synthesizing…";
  try {
    const r = await fetch("/audio/speech", {
      method: "POST", headers: {"Content-Type": "application/json"},
      body: JSON.stringify({model: modelId, messages: [
        {role: "user", content: text}]}),
    });
    const t = await r.text();
    if (!r.ok) throw new Error(t);
    const resp = JSON.parse(t);
    const part = resp.choices[0].message.content;
    const b64 = Array.isArray(part)
      ? (part.find(p => p.type === "audio") || {}).audio_url.url
      : part;
    const src = b64.startsWith("data:") ? b64 : "data:audio/wav;base64," + b64;
    $("tts-out").innerHTML = "";
    const a = document.createElement("audio");
    a.controls = true; a.src = src;
    $("tts-out").appendChild(a);
  } catch (e) { $("tts-out").textContent = "error: " + e.message; }
};

$("rmbg-send").onclick = async () => {
  const f = $("rmbg-file").files[0];
  if (!f) return;
  $("rmbg-out").textContent = "processing…";
  const toB64 = (file) => new Promise((res, rej) => {
    const fr = new FileReader();
    fr.onload = () => res(fr.result); fr.onerror = rej;
    fr.readAsDataURL(file);
  });
  try {
    const dataUrl = await toB64(f);
    const r = await fetch("/images/remove_background", {
      method: "POST", headers: {"Content-Type": "application/json"},
      body: JSON.stringify({model: modelId, messages: [{role: "user",
        content: [{type: "image_url", image_url: {url: dataUrl}}]}]}),
    });
    const t = await r.text();
    if (!r.ok) throw new Error(t);
    const resp = JSON.parse(t);
    const parts = resp.choices[0].message.content;
    $("rmbg-out").innerHTML = "";
    (Array.isArray(parts) ? parts : [parts]).forEach(p => {
      const url = p.image_url ? p.image_url.url : p;
      const img = document.createElement("img");
      img.src = url.startsWith("data:") ? url : "data:image/png;base64," + url;
      $("rmbg-out").appendChild(img);
    });
  } catch (e) { $("rmbg-out").textContent = "error: " + e.message; }
};
</script>
</body>
</html>
"""
