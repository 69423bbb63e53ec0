"""Harmonic (closeness-family) centrality via batched landmark BFS.

harmonic(v) = Σ_{u ≠ v} 1 / d(u, v)  (unreached pairs contribute 0).

The exact computation needs all-pairs shortest paths; the standard
scale-out treatment (Eppstein & Wang 2004; Boldi & Vigna's HyperBall
uses sketches for the same quantity) is LANDMARK SAMPLING: pick K
source vertices, run a multi-landmark BFS that carries a (vertices ×
K) distance MATRIX instead of one distance vector, and estimate
harmonic(v) as (n / K) · Σ_{landmarks} 1/d. With landmarks = ALL
vertices the result is exact — that is what the oracle-gated query
does on the small org graph; at web scale K is a sample and the
estimate concentrates (documented approximation, same contract as the
sketch aggregates).

Engine shape = the per-shard BSP combine of pagerank/CC/BFS
(pipelines/pagerank.py docstring), with matrix payloads:

- state: one (shard_rows × K) float64 distance matrix per shard, held
  in the object store (refs on the driver, like ShardedVector);
- gather per edge block: D[src, :] + 1 → per-dst column-wise mins,
  routed per shard with ``num_returns=S``;
- reduce per shard: elementwise min with the shard's own matrix
  (distances are monotone non-increasing — BFS relaxation);
- stop when no element changed (fixpoint = exact hop distances).

Landmarks are processed in batches of ``batch_k`` (bounds the matrix
width so a batch × edge-block product stays in a worker's heap; at
10^9 vertices pick K ≈ thousands and batch_k ≈ 128-512). Each batch
is independent and its contribution is pure addition, so a failed run
re-executes only un-summed batches — the resumable unit is the batch,
not the iteration (these runs are seconds-per-batch; per-iteration
parquet checkpointing like pagerank's would cost more than it saves).

Reference scope: lioia/distributed-pagerank implements PageRank only
(pkg/graph/pagerank.go); centrality is part of the engine's wider
graph surface (SURVEY §2.5 additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.shards import n_shards
from .components import symmetrize_edges
from .graphbuild import GraphTables


@ray.remote
def _lm_init_shard(s: int, n: int, shard_rows: int, landmarks: np.ndarray):
    """(size × K) distance matrix for shard s: 0 on the landmark's own
    row/column, +inf elsewhere."""
    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    d = np.full((size, len(landmarks)), np.inf)
    here = (landmarks >= lo) & (landmarks < lo + size)
    d[landmarks[here] - lo, np.nonzero(here)[0]] = 0.0
    return d


@ray.remote
def _lm_gather(block, dist_refs: list, n: int, shard_rows: int, S: int, K: int):
    """Per-block min(D[src]+1) partials per dst shard (matrix variant of
    components._cc_gather_block)."""
    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(src) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(src.min()), int(src.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    D = (
        np.concatenate([ray.get(r) for r in dist_refs[s0 : s1 + 1]])
        if s1 > s0
        else ray.get(dist_refs[s0])
    )
    vals = D[src - s0 * shard_rows] + 1.0  # (e, K)
    uniq, inv = np.unique(dst, return_inverse=True)
    mins = np.full((len(uniq), K), np.inf)
    np.minimum.at(mins, inv, vals)
    shard_of = uniq // shard_rows
    header = np.array([K], dtype=np.int64).tobytes()
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        out[int(s)] = (
            header
            + (uniq[a:b] - s * shard_rows).astype(np.int64).tobytes()
            + mins[a:b].tobytes()
        )
    return tuple(out) if S > 1 else out[0]


def _lm_payload(payload: bytes):
    """Parse a (K-header, idx, k×K matrix) payload."""
    K = int(np.frombuffer(payload[:8], dtype=np.int64)[0])
    body = payload[8:]
    k = len(body) // (8 + 8 * K)
    idx = np.frombuffer(body[: k * 8], dtype=np.int64)
    mat = np.frombuffer(body[k * 8 :], dtype=np.float64).reshape(k, K)
    return K, idx, mat


@ray.remote
def _lm_combine(*payloads):
    """Tree-combine node: min-merge matrix payloads (min is associative
    — tree path equals flat path, same contract as _cc_combine)."""
    K, idxs, mats = None, [], []
    for p in payloads:
        if p is None:
            continue
        K, i, m = _lm_payload(p)
        idxs.append(i)
        mats.append(m)
    if not idxs:
        return None
    idx = np.concatenate(idxs)
    mat = np.concatenate(mats)
    uniq, inv = np.unique(idx, return_inverse=True)
    mins = np.full((len(uniq), K), np.inf)
    np.minimum.at(mins, inv, mat)
    return np.array([K], dtype=np.int64).tobytes() + uniq.tobytes() + mins.tobytes()


@ray.remote(num_returns=2)
def _lm_reduce(old: np.ndarray, *payloads):
    acc = old.copy()  # own distance always a candidate
    for p in payloads:
        if p is None:
            continue
        _, idx, mat = _lm_payload(p)
        np.minimum.at(acc, idx, mat)
    return int((acc != old).sum()), acc


@ray.remote
def _lm_harmonic(acc_prev, D: np.ndarray):
    """Row-wise Σ 1/d over this landmark batch, excluding self (d=0)
    and unreached (inf); added to the running per-shard accumulator."""
    with np.errstate(divide="ignore"):
        inv = 1.0 / D
    inv[~np.isfinite(inv)] = 0.0  # d=0 → inf → self; d=inf → 0 → unreached
    out = inv.sum(axis=1)
    return out if acc_prev is None else acc_prev + out


def harmonic_centrality(
    graph: GraphTables,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 256,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
) -> "ray.data.Dataset":
    """(id, harmonic) for every vertex. ``landmarks=None`` uses ALL
    vertices (exact — small graphs / oracle gates); otherwise the
    landmark-sample estimate is scaled by n/K."""
    n, shard_rows = graph.n, graph.shard_rows
    if landmarks is None:
        landmarks = np.arange(n, dtype=np.int64)
    else:
        landmarks = np.asarray(sorted(int(v) for v in landmarks), dtype=np.int64)
        if len(landmarks) == 0 or landmarks[0] < 0 or landmarks[-1] >= n:
            raise ValueError(f"landmarks must be non-empty, within [0, {n})")
    scale = n / len(landmarks)

    if directed:
        edge_src = graph.edges()
    else:
        edge_src = ray.data.read_parquet(
            symmetrize_edges(graph), columns=["src", "dst"]
        )
    S = n_shards(n, shard_rows)
    edges_mat = edge_src.materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    target_blocks = max(S, min(4 * ncpu, max(1, edges_mat.count() // 65536)))
    blocks = edges_mat.repartition(target_blocks).materialize().to_arrow_refs()

    harm_refs: list = [None] * S
    for b0 in range(0, len(landmarks), batch_k):
        lms = landmarks[b0 : b0 + batch_k]
        K = len(lms)
        dist_refs = [_lm_init_shard.remote(s, n, shard_rows, lms) for s in range(S)]
        for _ in range(max_iters):
            gathers = [
                _lm_gather.options(num_returns=S).remote(
                    b, dist_refs, n, shard_rows, S, K
                )
                for b in blocks
            ]
            cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
            if combine_fanin > 0:
                from ..util import tree_combine_refs

                cols = [
                    tree_combine_refs(cols[s], _lm_combine, combine_fanin)
                    for s in range(S)
                ]
            outs = [_lm_reduce.remote(dist_refs[s], *cols[s]) for s in range(S)]
            changed = int(sum(ray.get([o[0] for o in outs])))
            dist_refs = [o[1] for o in outs]
            if changed == 0:
                break
        harm_refs = [
            _lm_harmonic.remote(harm_refs[s], dist_refs[s]) for s in range(S)
        ]

    @ray.remote
    def to_table(s: int, harm):
        lo = s * shard_rows
        vals = np.zeros(min(shard_rows, n - lo)) if harm is None else harm
        return pa.table(
            {
                "id": pa.array(np.arange(lo, lo + len(vals), dtype=np.int64)),
                "harmonic": pa.array(np.round(vals * scale, 6)),
            }
        )

    return ray.data.from_arrow_refs([to_table.remote(s, harm_refs[s]) for s in range(S)])


@ray.remote
def _lm_dist_fold(acc_prev, D: np.ndarray):
    """(max, sum, count) over finite non-self distances in this
    landmark batch's shard matrix, merged into the running triple."""
    finite = np.isfinite(D) & (D > 0)
    mx = float(D[finite].max()) if finite.any() else 0.0
    sm = float(D[finite].sum())
    ct = int(finite.sum())
    if acc_prev is None:
        return (mx, sm, ct)
    return (max(acc_prev[0], mx), acc_prev[1] + sm, acc_prev[2] + ct)


def distance_summary(
    graph: GraphTables,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 256,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
) -> "ray.data.Dataset":
    """One row (diameter, n_pairs, avg_path_len 6dp) over ordered
    reachable vertex pairs (s ≠ t): the graph-connectivity health
    summary (effective diameter / mean shortest path) — EXACT with
    ``landmarks=None``; with a landmark sample it summarizes the
    sampled source rows only (estimate; n_pairs reflects the sample).

    Same batched landmark matrix-BFS shape as ``harmonic_centrality``
    (K-column distance matrices through the per-shard BSP combine);
    only the per-batch fold differs — (max, Σ, count) scalars per
    shard instead of Σ 1/d, so the additive-resume contract is
    identical."""
    n, shard_rows = graph.n, graph.shard_rows
    if landmarks is None:
        landmarks = np.arange(n, dtype=np.int64)
    else:
        landmarks = np.asarray(sorted(int(v) for v in landmarks), dtype=np.int64)
        if len(landmarks) == 0 or landmarks[0] < 0 or landmarks[-1] >= n:
            raise ValueError(f"landmarks must be non-empty, within [0, {n})")

    if directed:
        edge_src = graph.edges()
    else:
        edge_src = ray.data.read_parquet(
            symmetrize_edges(graph), columns=["src", "dst"]
        )
    S = n_shards(n, shard_rows)
    edges_mat = edge_src.materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    target_blocks = max(S, min(4 * ncpu, max(1, edges_mat.count() // 65536)))
    blocks = edges_mat.repartition(target_blocks).materialize().to_arrow_refs()

    acc_refs: list = [None] * S
    for b0 in range(0, len(landmarks), batch_k):
        lms = landmarks[b0 : b0 + batch_k]
        K = len(lms)
        dist_refs = [_lm_init_shard.remote(s, n, shard_rows, lms) for s in range(S)]
        for _ in range(max_iters):
            gathers = [
                _lm_gather.options(num_returns=S).remote(
                    b, dist_refs, n, shard_rows, S, K
                )
                for b in blocks
            ]
            cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
            if combine_fanin > 0:
                from ..util import tree_combine_refs

                cols = [
                    tree_combine_refs(cols[s], _lm_combine, combine_fanin)
                    for s in range(S)
                ]
            outs = [_lm_reduce.remote(dist_refs[s], *cols[s]) for s in range(S)]
            changed = int(sum(ray.get([o[0] for o in outs])))
            dist_refs = [o[1] for o in outs]
            if changed == 0:
                break
        acc_refs = [_lm_dist_fold.remote(acc_refs[s], dist_refs[s]) for s in range(S)]

    triples = [t for t in ray.get(acc_refs) if t is not None]
    if not triples:
        return ray.data.from_items([{"diameter": 0, "n_pairs": 0, "avg_path_len": 0.0}])
    mx = max(t[0] for t in triples)
    sm = sum(t[1] for t in triples)
    ct = sum(t[2] for t in triples)
    return ray.data.from_items(
        [
            {
                "diameter": int(mx),
                "n_pairs": int(ct),
                "avg_path_len": round(sm / ct, 6) if ct else 0.0,
            }
        ]
    )
