"""Visualization sink — SURVEY §2.1 S12, the one reference operator
previously justified out of scope.

Reference behavior (GraphManager.py:138-219,
`prepare_visualization` + `visualize`): walk the RDF graph, keep
URIRef→URIRef edges only (literal objects are not drawn), label
nodes and edges with the extracted ids, spring-layout, save a PNG.
(Integrator.py:21,323 imports `src.utils.graph_visualizer`, a module
that does not ship — the reference's integrate phase crashes there;
per SURVEY §2.1 the bug is not replicated.)

Spark-first re-expression: the DRAW SELECTION is a DataFrame plan —
URI-edge filter, densest-neighborhood ranking (endpoint-degree sum),
deterministic order, bounded by `max_edges` — executed as a
distributed top-k (TakeOrderedAndProject), so the only driver-side
transfer is the bounded rows actually drawn. A picture is a
driver/human-scale artifact; the cap is the contract, and the number
of edges it dropped is AUDITED in the returned stats and the written
manifest (no silent caps). The sink emits dependency-free artifacts:
Graphviz DOT plus a self-contained HTML page (inline JSON + a tiny
canvas force layout — no matplotlib/networkx, which don't ship
here).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def viz_edges(edges: DataFrame, max_edges: int = 500) -> DataFrame:
    """The bounded, deterministic draw selection: URI→URI edges only
    (reference parity: literals are not drawn), ranked by combined
    endpoint degree so the densest neighborhood is what gets drawn,
    ties broken on (src_id, pred_id, dst_id) for byte-stable output.
    Returns (src_id, pred_id, dst_id, weight, deg_sum), ≤ max_edges
    rows. The orderBy+limit pair compiles to a distributed partial
    top-k — no corpus-scale sort materializes.

    Plan shape (round-5 rewrite): explode each edge into its two
    endpoint rows, attach the node degree with ONE window count over
    the node_id exchange, then fold the pair back with a full-row
    groupBy summing the two endpoint degrees — two edge-scale
    exchanges total, no join and no broadcast-size assumption on the
    node vocabulary (the round-4 form aggregated a degree table and
    shuffle-JOINED it back twice: three exchanges plus two sort-merge
    joins). Requires the edges contract (set-semantic rows: the
    builder aggregates weight=count per (src, pred, dst), §2.6), which
    makes the groupBy row-preserving."""
    uri_edges = edges.where(~F.col("is_literal")).select(
        "src_id", "pred_id", "dst_id", "weight"
    )
    long = uri_edges.select(
        "src_id", "pred_id", "dst_id", "weight",
        F.explode(F.array("src_id", "dst_id")).alias("_node"),
    )
    w = Window.partitionBy("_node")
    ranked = (
        long.withColumn("_deg", F.count(F.lit(1)).over(w))
        .groupBy("src_id", "pred_id", "dst_id", "weight")
        .agg(F.sum("_deg").cast("long").alias("deg_sum"))
    )
    return ranked.orderBy(
        F.col("deg_sum").desc(), "src_id", "pred_id", "dst_id"
    ).limit(max_edges)


def _q(s: str) -> str:
    """DOT-quote an identifier."""
    return '"' + str(s).replace("\\", "\\\\").replace('"', '\\"') + '"'


def to_dot(
    edges: DataFrame, max_edges: int = 500, title: str = "Knowledge Graph"
) -> tuple[str, dict]:
    """Edges table → (Graphviz DOT text, stats). Collects only the
    bounded draw selection; `stats` reports total vs drawn vs dropped
    so a capped picture is never mistaken for the whole graph."""
    total = edges.where(~F.col("is_literal")).count()
    rows = viz_edges(edges, max_edges).collect()
    return _dot_from_rows(rows, int(total), title)


def _dot_from_rows(rows, total: int, title: str) -> tuple[str, dict]:
    lines = [
        "digraph kg {",
        f"  label={_q(title)};",
        "  node [shape=ellipse, style=filled, fillcolor=lightblue];",
        "  edge [color=gray];",
    ]
    for r in rows:
        lines.append(
            f"  {_q(r.src_id)} -> {_q(r.dst_id)} "
            f"[label={_q(r.pred_id)}, weight={int(r.weight)}];"
        )
    lines.append("}")
    stats = {
        "edges_total": total,
        "edges_drawn": len(rows),
        "edges_dropped": total - len(rows),
        "nodes_drawn": len({r.src_id for r in rows} | {r.dst_id for r in rows}),
    }
    return "\n".join(lines) + "\n", stats


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>%(title)s</title></head>
<body style="margin:0;font-family:sans-serif">
<div style="padding:4px 8px">%(title)s — %(drawn)d of %(total)d edges
 (densest neighborhood; see viz_manifest.json)</div>
<canvas id="c" width="1200" height="800" style="display:block"></canvas>
<script>
const EDGES = %(edges_json)s;
const nodes = {};
EDGES.forEach(e => { nodes[e.s] = nodes[e.s] || {x: 0, y: 0};
                     nodes[e.d] = nodes[e.d] || {x: 0, y: 0}; });
const ids = Object.keys(nodes);
// deterministic initial layout: golden-angle spiral (no RNG)
ids.forEach((id, i) => {
  const a = i * 2.39996, r = 12 * Math.sqrt(i + 1);
  nodes[id].x = 600 + r * Math.cos(a); nodes[id].y = 400 + r * Math.sin(a);
});
for (let it = 0; it < 150; it++) {           // simple force relaxation
  ids.forEach(a => ids.forEach(b => {
    if (a >= b) return;
    const na = nodes[a], nb = nodes[b];
    let dx = nb.x - na.x, dy = nb.y - na.y;
    const d2 = dx * dx + dy * dy + 0.01, f = 900 / d2;
    na.x -= dx * f; na.y -= dy * f; nb.x += dx * f; nb.y += dy * f;
  }));
  EDGES.forEach(e => {
    const s = nodes[e.s], t = nodes[e.d];
    const dx = t.x - s.x, dy = t.y - s.y;
    s.x += dx * 0.02; s.y += dy * 0.02; t.x -= dx * 0.02; t.y -= dy * 0.02;
  });
}
const ctx = document.getElementById("c").getContext("2d");
ctx.strokeStyle = "#999"; ctx.fillStyle = "#222"; ctx.font = "9px sans-serif";
EDGES.forEach(e => {
  const s = nodes[e.s], t = nodes[e.d];
  ctx.beginPath(); ctx.moveTo(s.x, s.y); ctx.lineTo(t.x, t.y); ctx.stroke();
  ctx.fillText(e.p, (s.x + t.x) / 2, (s.y + t.y) / 2);
});
ids.forEach(id => {
  const n = nodes[id];
  ctx.beginPath(); ctx.arc(n.x, n.y, 4, 0, 6.3);
  ctx.fillStyle = "lightblue"; ctx.fill(); ctx.stroke();
  ctx.fillStyle = "#222"; ctx.fillText(id, n.x + 5, n.y - 5);
});
</script></body></html>
"""


def write_visualization(
    edges: DataFrame,
    out_dir: str,
    max_edges: int = 500,
    title: str = "Knowledge Graph Visualization",
) -> dict:
    """The sink: writes `graph.dot`, `graph.html` (self-contained),
    and `viz_manifest.json` (draw stats incl. the dropped-edge audit)
    into `out_dir`. Returns the stats. Deterministic: same edges table
    → byte-identical artifacts. The draw selection is collected ONCE
    and shared by the DOT and HTML writers."""
    total = edges.where(~F.col("is_literal")).count()
    rows = viz_edges(edges, max_edges).collect()
    dot, stats = _dot_from_rows(rows, int(total), title)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "graph.dot"), "w", encoding="utf-8") as f:
        f.write(dot)
    html = _HTML_TEMPLATE % {
        "title": title,
        "drawn": stats["edges_drawn"],
        "total": stats["edges_total"],
        "edges_json": json.dumps(
            [{"s": r.src_id, "p": r.pred_id, "d": r.dst_id} for r in rows]
        ),
    }
    with open(os.path.join(out_dir, "graph.html"), "w", encoding="utf-8") as f:
        f.write(html)
    with open(
        os.path.join(out_dir, "viz_manifest.json"), "w", encoding="utf-8"
    ) as f:
        json.dump({**stats, "max_edges": max_edges, "title": title}, f, indent=1)
    return stats
