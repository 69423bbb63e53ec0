"""Pure-numpy conformance oracle for the reference PageRank semantics.

Reimplements exactly what lioia/distributed-pagerank computes
(SURVEY.md §5.1), with the unseeded-random E vector lifted to an
explicit input so engine and oracle can be compared deterministically:

- every id appearing as src or dst is a vertex (reference:
  pkg/graph/graph.go:66-76)
- duplicate edges collapse to one in-link (graph.go:77) but
  line-count out-degree counts every line (graph.go:78)
- initial rank = 1/|V| (graph.go:80)
- Jacobi update with stale ranks:
  new[u] = c * sum_{v in B(u)} rank[v]/out(v) + (1-c) * E[u]
  (pkg/node/worker.go:95-111; stale-rank refresh pkg/node/master.go:153-157)
- dangling vertices contribute nothing (no redistribution); mass leaks
  and is repaired only by the final normalization
  (pkg/graph/pagerank.go:14-19,38-45)
- stop when L1 residual <= threshold or iteration >= 100
  (pkg/node/master.go:158; cap pkg/graph/pagerank.go:12)
- single final normalization rank /= sum(rank)
  (pkg/node/master.go:160-167)

This module is the source of truth for every golden fixture; it is
intentionally simple (dense numpy) and only run on small graphs.
"""

from __future__ import annotations

import numpy as np


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    outdegree_mode: str = "line_count",
    dedup_in_links: bool = True,
):
    """Return (n, edges_src, edges_dst, out_deg) under reference load rules.

    Vertex ids are assumed dense 0..n-1 (mint before calling).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if len(src) else 0
    pairs = np.stack([src, dst], axis=1)
    uniq = np.unique(pairs, axis=0) if len(pairs) else pairs
    if outdegree_mode == "line_count":
        out_deg = np.bincount(src, minlength=n).astype(np.int64)
    elif outdegree_mode == "distinct":
        out_deg = np.bincount(uniq[:, 0], minlength=n).astype(np.int64)
    else:
        raise ValueError(outdegree_mode)
    if dedup_in_links:
        es, ed = uniq[:, 0], uniq[:, 1]
    else:
        es, ed = src, dst
    return n, es, ed, out_deg


def pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    c: float = 0.85,
    threshold: float = 1e-6,
    max_iters: int = 100,
    e_vector: np.ndarray | None = None,
    outdegree_mode: str = "line_count",
    dedup_in_links: bool = True,
    dangling: str = "none",
    normalize: bool = True,
    n_vertices: int | None = None,
):
    """Return (ranks, iterations, converged, residual)."""
    n, es, ed, out_deg = build_graph(src, dst, outdegree_mode, dedup_in_links)
    if n_vertices is not None:
        n = max(n, int(n_vertices))
        out_deg = np.pad(out_deg, (0, n - len(out_deg)))
    if n == 0:
        return np.zeros(0), 0, True, 0.0
    e = np.full(n, 1.0 / n) if e_vector is None else np.asarray(e_vector, dtype=np.float64)
    rank = np.full(n, 1.0 / n)
    inv_out = np.zeros(n)
    nz = out_deg > 0
    inv_out[nz] = 1.0 / out_deg[nz]
    dangling_mask = ~nz
    converged = False
    it = 0
    residual = np.inf
    while it < max_iters:
        contrib = np.zeros(n)
        np.add.at(contrib, ed, rank[es] * inv_out[es])
        if dangling == "redistribute":
            contrib = contrib + rank[dangling_mask].sum() / n
        new = c * contrib + (1.0 - c) * e
        residual = float(np.abs(new - rank).sum())
        rank = new
        it += 1
        if residual <= threshold:  # `<=` matches distributed path master.go:158
            converged = True
            break
    if normalize:
        s = rank.sum()
        if s > 0:
            rank = rank / s
    return rank, it, converged, residual
