"""Single-file web dashboard.

A dependency-free stand-in for the reference's Next.js frontend
(reference: frontend/ — dashboard + telemetry pages): mode/emotion
controls, push-to-talk, streaming toggle, live transcript feed and a
packet log with byte counts, all over the same ``/ws/janus`` socket and
REST endpoints the reference frontend uses. Served at ``GET /``.
"""

DASHBOARD_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8"/>
<title>janus_tpu dashboard</title>
<style>
  body { font-family: ui-monospace, monospace; background:#0b1020; color:#dce3f3;
         margin:0; padding:1.5rem; }
  h1 { font-size:1.1rem; letter-spacing:.1em; color:#7aa2ff; }
  .row { display:flex; gap:1.5rem; flex-wrap:wrap; }
  .card { background:#141b33; border:1px solid #26304f; border-radius:10px;
          padding:1rem; min-width:260px; flex:1; }
  .card h2 { font-size:.8rem; text-transform:uppercase; color:#8fa3cc; margin:0 0 .6rem; }
  button, select { background:#1d2747; color:#dce3f3; border:1px solid #33406b;
          border-radius:6px; padding:.45rem .8rem; cursor:pointer; font:inherit; }
  button.active { background:#2b57d0; border-color:#2b57d0; }
  #ptt { width:100%; padding:1rem; font-size:1rem; }
  #ptt.held { background:#d03a3a; border-color:#d03a3a; }
  ul { list-style:none; padding:0; margin:0; max-height:300px; overflow:auto; }
  li { padding:.3rem 0; border-bottom:1px solid #1d2747; font-size:.85rem; }
  .dim { color:#69789f; }
  #status { float:right; font-size:.8rem; }
  .ok { color:#5ad07a; } .bad { color:#d05a5a; }
</style>
</head>
<body>
<h1>JANUS_TPU <span id="status" class="bad">disconnected</span></h1>
<div class="row">
  <div class="card">
    <h2>Controls</h2>
    <div>
      mode:
      <select id="mode">
        <option value="semantic">semantic</option>
        <option value="text_only">text_only</option>
        <option value="morse">morse</option>
      </select>
      emotion:
      <select id="emotion">
        <option value="auto">auto</option>
        <option value="relaxed">relaxed</option>
        <option value="panicked">panicked</option>
      </select>
    </div>
    <p><button id="stream">streaming: off</button></p>
    <p><button id="ptt">HOLD TO TALK (or Space)</button></p>
  </div>
  <div class="card">
    <h2>Transcripts</h2>
    <ul id="transcripts"></ul>
  </div>
  <div class="card">
    <h2>Packets <span class="dim" id="totals"></span></h2>
    <canvas id="chart" width="360" height="60"
            style="width:100%;height:60px;background:#0e1428;border-radius:6px"></canvas>
    <ul id="packets"></ul>
  </div>
</div>
<script>
const wsUrl = (location.protocol === "https:" ? "wss://" : "ws://") +
              location.host + "/ws/janus";
let ws = null, state = {is_streaming:false, is_recording:false};
let totalBytes = 0, totalPackets = 0;
const history = [];  // last 60 packet sizes (the telemetry step-line)
function drawChart() {
  const c = document.getElementById("chart");
  const ctx = c.getContext("2d");
  ctx.clearRect(0, 0, c.width, c.height);
  if (!history.length) return;
  const max = Math.max(...history, 1);
  const w = c.width / Math.max(history.length, 1);
  ctx.strokeStyle = "#7aa2ff"; ctx.lineWidth = 1.5;
  ctx.beginPath();
  history.forEach((b, i) => {
    const y = c.height - 4 - (b / max) * (c.height - 10);
    if (i === 0) ctx.moveTo(i * w, y);
    else { ctx.lineTo(i * w, y); }         // step-line like the reference
    ctx.lineTo((i + 1) * w, y);
  });
  ctx.stroke();
}

function connect() {
  ws = new WebSocket(wsUrl);
  ws.onopen = () => { document.getElementById("status").textContent = "connected";
                      document.getElementById("status").className = "ok"; };
  ws.onclose = () => { document.getElementById("status").textContent = "disconnected";
                       document.getElementById("status").className = "bad";
                       setTimeout(connect, 3000); };
  ws.onmessage = (ev) => {
    const m = JSON.parse(ev.data);
    if (m.type === "control_state") {
      state = m;
      document.getElementById("mode").value = m.mode;
      document.getElementById("emotion").value = m.emotion_override;
      document.getElementById("stream").textContent =
        "streaming: " + (m.is_streaming ? "on" : "off");
      document.getElementById("stream").className = m.is_streaming ? "active" : "";
    } else if (m.type === "transcript") {
      addItem("transcripts", `"${esc(m.text)}"` +
        (m.avg_pitch_hz ? ` <span class=dim>${m.avg_pitch_hz.toFixed(0)}Hz</span>` : ""));
    } else if (m.type === "packet_summary") {
      totalBytes += m.bytes; totalPackets += 1;
      history.push(Number(m.bytes)); if (history.length > 60) history.shift();
      drawChart();
      document.getElementById("totals").textContent =
        ` ${totalPackets} pkts / ${totalBytes} B`;
      addItem("packets", `${Number(m.bytes)}B [${esc(m.mode)}]` +
        (m.emotion ? ` ${esc(m.emotion)}` : "") +
        (m.snippet ? ` <span class=dim>${esc(m.snippet)}</span>` : ""));
    }
  };
}
function esc(s) {
  const d = document.createElement("span");
  d.textContent = String(s);
  return d.innerHTML;
}
function addItem(listId, html) {
  // callers escape remote strings with esc(); html here is trusted markup
  const li = document.createElement("li");
  li.innerHTML = html;
  const ul = document.getElementById(listId);
  ul.prepend(li);
  while (ul.children.length > 100) ul.removeChild(ul.lastChild);
}
function send(obj) {
  if (ws && ws.readyState === 1) ws.send(JSON.stringify({type:"control", ...obj}));
}
document.getElementById("mode").onchange = (e) => send({mode: e.target.value});
document.getElementById("emotion").onchange = (e) => send({emotion_override: e.target.value});
document.getElementById("stream").onclick = () => send({is_streaming: !state.is_streaming});
const ptt = document.getElementById("ptt");
function hold(h) { ptt.className = h ? "held" : ""; send({is_recording: h}); }
ptt.onmousedown = () => hold(true);
ptt.onmouseup = () => hold(false);
ptt.onmouseleave = () => { if (state.is_recording) hold(false); };
window.addEventListener("keydown", (e) => {
  if (e.code === "Space" && !e.repeat) { e.preventDefault(); hold(true); }
  if (e.key === "s") send({is_streaming: !state.is_streaming});
});
window.addEventListener("keyup", (e) => {
  if (e.code === "Space") { e.preventDefault(); hold(false); }
});
connect();
</script>
</body>
</html>
"""
