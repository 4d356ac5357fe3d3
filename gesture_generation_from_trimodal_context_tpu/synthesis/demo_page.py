"""Self-contained browser demo for the synthesis server (GET /).

One dependency-free HTML page (no external assets — works with zero
egress): type a sentence, pick a duration and speaker, and the page
POSTs to /synthesize_stream, parses the chunked NDJSON as it arrives,
and animates the streamed skeleton on a canvas at 15 fps — motion
starts after the FIRST window chunk, while later windows are still
being generated.  The skeleton edges mirror ops/skeleton.DIR_VEC_PAIRS
(the same bones the video writer draws)."""

from ..ops import skeleton

_PAGE = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>gesture synthesis — streaming demo</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; max-width: 720px; }
  h1 { font-size: 1.2rem; }
  label { display: inline-block; margin: .3rem 1rem .3rem 0; }
  input[type=text] { width: 100%%; box-sizing: border-box; }
  input[type=number] { width: 5rem; }
  button { margin: .5rem 0; padding: .4rem 1.2rem; }
  #status { color: #555; font-size: .9rem; min-height: 1.2em; }
  canvas { border: 1px solid #ccc; background: #fafafa; }
</style>
</head>
<body>
<h1>gesture synthesis — streaming demo (model: %(model)s)</h1>
<label>text<input type="text" id="text"
  value="together we can bring clean water to every village in the region"></label>
<label>duration (s)<input type="number" id="dur" value="8" min="1" max="60"></label>
<label>speaker vid<input type="number" id="vid" value="1" min="0"></label>
<button id="go">Generate (stream)</button>
<div id="status">idle</div>
<canvas id="cv" width="480" height="360"></canvas>
<script>
const EDGES = %(edges)s;
const FPS = 15;
let frames = [];      // (10,3) joint positions, streamed in
let playing = false;
let streamDone = false;
let playIdx = 0;
const cv = document.getElementById('cv');
const ctx = cv.getContext('2d');
const status = document.getElementById('status');

function draw(pose) {
  ctx.clearRect(0, 0, cv.width, cv.height);
  const s = 300, cx = cv.width / 2, cy = cv.height * 0.35;
  ctx.lineWidth = 5;
  ctx.lineCap = 'round';
  EDGES.forEach(function (e, i) {
    const a = pose[e[0]], b = pose[e[1]];
    ctx.strokeStyle = 'hsl(' + (i * 36) + ',60%%,45%%)';
    ctx.beginPath();
    // front view: x right, y down on screen (the y axis of the pose
    // points down, matching the inverted ylim of the video writer)
    ctx.moveTo(cx + a[0] * s, cy + a[1] * s);
    ctx.lineTo(cx + b[0] * s, cy + b[1] * s);
    ctx.stroke();
  });
  ctx.fillStyle = '#333';
  ctx.fillText('frame ' + (playIdx + 1) + ' / ' + frames.length, 8, 14);
}

function tick() {
  if (!playing) return;
  if (playIdx < frames.length) {
    draw(frames[playIdx]);
    playIdx++;
    setTimeout(tick, 1000 / FPS);
  } else if (streamDone) {
    playing = false;
  } else {
    // buffer underrun: poll for more frames
    setTimeout(tick, 100);
  }
}

async function go() {
  const words = document.getElementById('text').value.trim().split(/\\s+/);
  const dur = parseFloat(document.getElementById('dur').value);
  const vid = parseInt(document.getElementById('vid').value);
  const slot = dur / (words.length + 1);
  const timed = words.map(function (w, i) {
    return [w, slot * (i + 0.5), slot * (i + 1.2)];
  });
  frames = []; playIdx = 0; playing = true; streamDone = false;
  status.textContent = 'requesting…';
  const t0 = performance.now();
  const resp = await fetch('/synthesize_stream', {
    method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({silence_s: dur, words: timed, vid: vid}),
  });
  if (!resp.ok) {
    status.textContent = 'error: ' + (await resp.text());
    playing = false;
    return;
  }
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = '';
  let chunks = 0;
  tick();
  for (;;) {
    const r = await reader.read();
    if (r.done) break;
    buf += dec.decode(r.value, {stream: true});
    let nl;
    while ((nl = buf.indexOf('\\n')) >= 0) {
      const line = buf.slice(0, nl); buf = buf.slice(nl + 1);
      if (!line.trim()) continue;
      const d = JSON.parse(line);
      d.out_poses.forEach(function (p) { frames.push(p); });
      chunks++;
      status.textContent = 'chunk ' + chunks + ': ' + frames.length +
        ' frames buffered, first motion ' +
        ((performance.now() - t0) / 1000).toFixed(2) + 's';
    }
  }
  streamDone = true;
  status.textContent += ' — stream complete (' + frames.length + ' frames)';
}
document.getElementById('go').addEventListener('click', go);
</script>
</body>
</html>
"""


def demo_html(model_name):
    edges = [[p, c] for p, c, _ in skeleton.DIR_VEC_PAIRS]
    return _PAGE % {"model": model_name, "edges": edges}
