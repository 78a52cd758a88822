"""Self-contained HTML visualization sinks — dependency-free stand-ins
for the reference's pyvis / wordcloud renders (reference:
textgraphs/vis.py:94-163 ``render_lemma_graph``, vis.py:237-271
``generate_wordcloud``). pyvis, networkx-drawing, and the wordcloud
package are deliberately NOT dependencies (SURVEY §7.4): each sink emits
ONE standalone .html file — embedded node-link JSON plus a small
vanilla-JS canvas renderer — so the data contract (styles, sizes,
weights) matches the reference while the raster stack stays out of the
engine.

Styling parity with the reference (vis.py:39-66 NODE_STYLES,
vis.py:150-161 edge styles):

* node size tracks ``count``, tooltip carries lemma/kind/weight;
* per-kind node colors follow the reference's style table;
* DEP edges thin gray, INF edges ``hsl(289,17%,49%)`` width 3, SYN
  edges ``hsl(55,17%,49%)`` width 2, arrows per the reference.

Visualization is driver-side by nature (a human looks at it), so both
sinks COLLECT — bounded by ``max_nodes``/``max_terms`` with a loud
error rather than a silent OOM. Corpus-scale callers aggregate first
(communities, wordcloud_weights) and render the aggregate.
"""

from __future__ import annotations

import html as _html
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference NODE_STYLES (vis.py:39-66), kind -> color
_NODE_COLORS = {
    "ent": "hsl(65, 46%, 58%)",
    "lem": "hsla(72, 19%, 90%, 0.4)",
    "dep": "hsla(72, 19%, 90%, 0.2)",
    "chu": "hsla(72, 19%, 90%, 0.5)",
    "iri": "hsl(289, 17%, 49%)",
}
_EDGE_STYLES = {
    "dep": {"color": "lightgray", "width": 1, "arrows": "to"},
    "inf": {"color": "hsl(289, 17%, 49%)", "width": 3, "arrows": "to"},
    "syn": {"color": "hsl(55, 17%, 49%)", "width": 2, "arrows": "from"},
}

_GRAPH_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{margin:0;background:#222;color:#eee;font:12px sans-serif}}
#c{{display:block}}#tip{{position:fixed;pointer-events:none;background:#000a;
padding:4px 6px;border-radius:3px;display:none}}</style></head>
<body><canvas id="c"></canvas><div id="tip"></div>
<script>
const DATA = {payload};
const W = innerWidth, H = innerHeight, cv = document.getElementById('c');
cv.width = W; cv.height = H;
const ctx = cv.getContext('2d'), tip = document.getElementById('tip');
const N = DATA.nodes, E = DATA.links, idx = {{}};
N.forEach((n, i) => {{
  idx[n.id] = n;
  const a = 2 * Math.PI * i / N.length;        // deterministic seed layout
  n.x = W/2 + (W/3) * Math.cos(a); n.y = H/2 + (H/3) * Math.sin(a);
  n.vx = 0; n.vy = 0; n.r = 4 + 2 * Math.sqrt(n.count || 1);
}});
function step() {{                              // plain spring/charge layout
  for (const a of N) for (const b of N) {{
    if (a === b) continue;
    let dx = a.x-b.x, dy = a.y-b.y, d2 = dx*dx+dy*dy+0.01, f = 1200/d2;
    a.vx += f*dx; a.vy += f*dy;
  }}
  for (const e of E) {{
    const s = idx[e.source], t = idx[e.target];
    if (!s || !t) continue;
    let dx = t.x-s.x, dy = t.y-s.y;
    s.vx += 0.01*dx; s.vy += 0.01*dy; t.vx -= 0.01*dx; t.vy -= 0.01*dy;
  }}
  for (const n of N) {{
    n.x = Math.max(n.r, Math.min(W-n.r, n.x + 0.02*n.vx));
    n.y = Math.max(n.r, Math.min(H-n.r, n.y + 0.02*n.vy));
    n.vx *= 0.5; n.vy *= 0.5;
  }}
}}
function draw() {{
  ctx.clearRect(0, 0, W, H);
  for (const e of E) {{
    const s = idx[e.source], t = idx[e.target];
    if (!s || !t) continue;
    ctx.strokeStyle = e.color; ctx.lineWidth = e.width;
    ctx.beginPath(); ctx.moveTo(s.x, s.y); ctx.lineTo(t.x, t.y); ctx.stroke();
  }}
  for (const n of N) {{
    ctx.fillStyle = n.color;
    ctx.beginPath(); ctx.arc(n.x, n.y, n.r, 0, 7); ctx.fill();
    ctx.fillStyle = '#eee'; ctx.fillText(n.label || '', n.x + n.r + 2, n.y + 3);
  }}
}}
let ticks = 0;
(function loop() {{ step(); draw(); if (++ticks < 300) requestAnimationFrame(loop); }})();
cv.onmousemove = ev => {{
  const hit = N.find(n => (ev.x-n.x)**2 + (ev.y-n.y)**2 <= n.r*n.r);
  tip.style.display = hit ? 'block' : 'none';
  if (hit) {{ tip.style.left = (ev.x+10)+'px'; tip.style.top = (ev.y+10)+'px';
              tip.textContent = hit.title; }}
}};
</script></body></html>
"""

_CLOUD_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>wordcloud</title>
<style>body{{margin:20px;background:{background};color:#eee;
font-family:sans-serif;text-align:center}}
span{{display:inline-block;padding:2px 6px;line-height:1.1}}</style></head>
<body>{spans}</body></html>
"""


def write_graph_html(
    nodes: DataFrame, edges: DataFrame, path: str, *,
    title: str = "lemma graph", max_nodes: int = 2000,
) -> str:
    """Render corpus ``nodes``/``edges`` tables (operators.extract
    schema) as one standalone interactive HTML file; returns ``path``.

    Raises if the graph exceeds ``max_nodes`` — aggregate or filter
    first (the reference's pyvis render has the same practical bound).
    """
    n_nodes = nodes.count()
    if n_nodes > max_nodes:
        raise ValueError(
            f"{n_nodes} nodes > max_nodes={max_nodes}: render an aggregate "
            "(communities, top-k by weight), not the raw corpus graph"
        )
    # corpus tables (operators.extract) key by node_key/src_key/dst_key;
    # weight is optional (present after doc-level ranking, absent on the
    # raw aggregate)
    weight = (
        F.coalesce("weight", F.lit(0.0)) if "weight" in nodes.columns
        else F.lit(0.0)
    )
    node_rows = [
        {
            "id": r["node_key"],
            "label": r["surface"] or r["node_key"],
            "title": f"{r['node_key']} [{r['kind']}] w={r['weight']:.4f}",
            "kind": r["kind"],
            "count": r["count"],
            "color": _NODE_COLORS.get(r["kind"], "hsl(0, 0%, 70%)"),
        }
        for r in nodes.select(
            "node_key", "surface", "kind", "count", weight.alias("weight"),
        ).collect()
    ]
    edge_rows = []
    for r in edges.select("src_key", "dst_key", "kind", "rel").collect():
        style = _EDGE_STYLES.get(r["kind"], {"color": "gray", "width": 1, "arrows": "to"})
        edge_rows.append({
            "source": r["src_key"], "target": r["dst_key"],
            "title": r["rel"], **style,
        })
    # corpus-derived strings ride inside a <script> block: '</' would let a
    # crawled surface like '</script><script>...' terminate the block early,
    # so escape it inside the JSON payload ('<\/' is identical JSON text)
    payload = json.dumps(
        {"nodes": node_rows, "links": edge_rows}, sort_keys=True
    ).replace("</", "<\\/")
    html = _GRAPH_TEMPLATE.format(title=_html.escape(title), payload=payload)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path


def write_wordcloud_html(
    weights: DataFrame, path: str, *,
    term_col: str = "surface", weight_col: str = "weight",
    background: str = "black", max_terms: int = 1000,
) -> str:
    """Tag-cloud HTML from a (term, weight) table; returns ``path``.

    Frequency scaling reproduces the reference exactly
    (vis.py:262-266): ``round(weight / max_weight * 1000)`` with
    spaces replaced by underscores; font size maps that frequency to
    10-60 px. Positive-weight terms only, like the reference.
    """
    rows = (
        weights.filter(F.col(weight_col) > 0)
        .orderBy(F.desc(weight_col), term_col)
        .limit(max_terms + 1)
        .select(term_col, weight_col)
        .collect()
    )
    if len(rows) > max_terms:
        raise ValueError(
            f"more than max_terms={max_terms} positive-weight terms: "
            "pre-aggregate (e.g. top-k) before rendering"
        )
    freq: dict = {}
    if rows:
        max_w = max(r[weight_col] for r in rows)
        # key by the ORIGINAL term (space->underscore happens at render
        # time only) so distinct terms like 'a b' and 'a_b' cannot collide;
        # duplicate terms keep the max frequency
        for r in rows:
            f_ = round(r[weight_col] / max_w * 1000.0)
            t_ = r[term_col]
            if t_ not in freq or f_ > freq[t_]:
                freq[t_] = f_
    spans = "\n".join(
        f'<span style="font-size:{10 + f * 50 // 1000}px" title="{f}">'
        f'{_html.escape(t.replace(" ", "_"))}</span>'
        for t, f in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    )
    html = _CLOUD_TEMPLATE.format(background=background, spans=spans)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path
