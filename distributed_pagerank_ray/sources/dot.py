"""DOT exporter (small graphs only).

Mirrors the reference's DOT serialization of all edges
(reference: pkg/graph/graph.go:168-176) and its refusal to render
large graphs (cmd/client/main.go:122-123 caps at 60 ranks; report §IV
says >50 nodes). We guard on edge count instead of silently OOMing.
"""

from __future__ import annotations

import ray.data


def to_dot(edges: "ray.data.Dataset", max_edges: int = 10_000) -> str:
    n = edges.count()
    if n > max_edges:
        raise ValueError(f"graph too large to render as DOT ({n} > {max_edges} edges)")
    rows = edges.take_all()
    body = "".join(f"  {r['src']} -> {r['dst']};\n" for r in rows)
    return "digraph {\n" + body + "}\n"
