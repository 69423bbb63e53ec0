"""k-core peeling over an undirected edge set.

A vertex is in the k-core if it survives repeated removal of vertices
with degree < k. ``kcore_peel`` runs a FIXED number of peel rounds
(callers wanting the true core loop until the kill set is empty —
``rounds=None``); the fixed-round variant exists so the driver gate
can hash-match an unrolled-CTE DuckDB oracle (same trick as the
3-iteration PageRank query).

Scale shape per round: degrees via the per-shard count BSP
(util.count_i64_keys — no row-level groupby), the KILL set (vertices
below k) gathered and broadcast into a vectorized NOT-IN edge filter
(kill sets shrink geometrically; the surviving edge set is never
gathered). Edges are re-materialized per round so the next round's
count scans the filtered set, not the original lineage.

Reference parity: no such operator in lioia/distributed-pagerank
(PageRank only) — new-engine scope, SURVEY §2.5 graph family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import count_i64_keys, semi_join_filter

_I64 = pa.int64()


def _sym_degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    both = edges.map_batches(
        lambda t: pa.table({"v": t.column("a")}), batch_format="pyarrow"
    ).union(edges.map_batches(lambda t: pa.table({"v": t.column("b")}), batch_format="pyarrow"))
    return count_i64_keys(both, "v", count_col="deg")


def kcore_peel(
    edges: "ray.data.Dataset", k: int, rounds: int | None = None
) -> "ray.data.Dataset":
    """Peel ``rounds`` times (or until fixpoint when ``rounds`` is
    None). ``edges`` must be distinct undirected pairs (a < b).
    Returns the surviving vertex set as (v, deg) — degrees as of the
    surviving edge set."""
    edges = edges.materialize()
    r = 0
    while rounds is None or r < rounds:
        r += 1
        deg = _sym_degrees(edges)
        kill_parts = []
        for b in deg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            kill_parts.append(
                b.column("v").filter(pc.less(b.column("deg"), k)).to_numpy(zero_copy_only=False)
            )
        kill = np.concatenate(kill_parts) if kill_parts else np.zeros(0, dtype=np.int64)
        if len(kill) == 0:
            # fixpoint: further rounds are identical no-ops, fixed-round
            # oracle parity is preserved by stopping here
            break
        edges = semi_join_filter(
            semi_join_filter(edges, "a", kill, keep=False), "b", kill, keep=False
        ).materialize()
    return _sym_degrees(edges)
