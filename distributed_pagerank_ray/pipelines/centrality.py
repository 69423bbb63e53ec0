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


def _normalize_landmarks(n: int, landmarks) -> np.ndarray:
    if landmarks is None:
        return np.arange(n, dtype=np.int64)
    landmarks = np.asarray(sorted(int(v) for v in landmarks), dtype=np.int64)
    if len(landmarks) == 0 or landmarks[0] < 0 or landmarks[-1] >= n:
        raise ValueError(f"landmarks must be non-empty, within [0, {n})")
    return landmarks


def _landmark_bfs_fold(
    graph: GraphTables,
    landmarks: np.ndarray,
    batch_k: int,
    max_iters: int,
    directed: bool,
    combine_fanin: int,
    fold_remote,
    fold_extra: tuple = (),
) -> tuple[list, int]:
    """THE shared landmark matrix-BFS driver: run the batched K-column
    BFS to its hop-distance fixpoint and fold each batch's final
    per-shard distance matrix into a running accumulator via
    ``fold_remote(acc_prev, D, *fold_extra)`` — harmonic / closeness /
    eccentricity / distance-summary / effective-diameter differ ONLY
    in that fold (every fold is additive or idempotent, so the
    landmark batch stays the resume unit). Returns (acc_refs, S)."""
    n, shard_rows = graph.n, graph.shard_rows
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
        acc_refs = [
            fold_remote.remote(acc_refs[s], dist_refs[s], *fold_extra)
            for s in range(S)
        ]
    return acc_refs, S


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
    landmarks = _normalize_landmarks(n, landmarks)
    scale = n / len(landmarks)
    harm_refs, S = _landmark_bfs_fold(
        graph, landmarks, batch_k, max_iters, directed, combine_fanin, _lm_harmonic
    )

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
    landmarks = _normalize_landmarks(n, landmarks)
    acc_refs, S = _landmark_bfs_fold(
        graph, landmarks, batch_k, max_iters, directed, combine_fanin, _lm_dist_fold
    )

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


@ray.remote
def _lm_close_fold(acc_prev, D: np.ndarray):
    """Row-wise (Σd, count) over finite non-self distances in this
    landmark batch's shard matrix, added to the running per-shard
    (sum, count) pair — the closeness sibling of ``_lm_harmonic``
    (exact int64 sums: BFS distances are small ints in float cells)."""
    finite = np.isfinite(D) & (D > 0)
    sm = np.where(finite, D, 0.0).sum(axis=1).astype(np.int64)
    ct = finite.sum(axis=1).astype(np.int64)
    if acc_prev is None:
        return (sm, ct)
    return (acc_prev[0] + sm, acc_prev[1] + ct)


def closeness_centrality(
    graph: GraphTables,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 256,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
) -> "ray.data.Dataset":
    """(id, n_reach, sum_dist, closeness) for every vertex, closeness =
    n_reach / Σ dist over the source set (6 dp) — the reciprocal-mean
    sibling of ``harmonic_centrality`` (harmonic sums 1/d and handles
    disconnection gracefully; closeness reports the raw component-local
    ratio, 0.0 for isolated vertices). ``landmarks=None`` is EXACT (all
    sources); with a landmark sample the sums cover the sampled sources
    only (reported raw — the estimator is the caller's choice, unlike
    harmonic's n/K linear scaling, because a ratio of sums doesn't
    scale linearly).

    Same batched landmark matrix-BFS shape as harmonic_centrality —
    only the per-batch fold differs ((Σd, count) int64 pairs per shard,
    additive across batches = the resume unit)."""
    n, shard_rows = graph.n, graph.shard_rows
    landmarks = _normalize_landmarks(n, landmarks)
    acc_refs, S = _landmark_bfs_fold(
        graph, landmarks, batch_k, max_iters, directed, combine_fanin, _lm_close_fold
    )

    @ray.remote
    def to_table(s: int, acc):
        lo = s * shard_rows
        rows = min(shard_rows, n - lo)
        if acc is None:
            sm = np.zeros(rows, np.int64)
            ct = np.zeros(rows, np.int64)
        else:
            sm, ct = acc
        with np.errstate(divide="ignore", invalid="ignore"):
            cl = np.where(sm > 0, ct / np.maximum(sm, 1), 0.0)
        return pa.table(
            {
                "id": pa.array(np.arange(lo, lo + rows, dtype=np.int64)),
                "n_reach": pa.array(ct),
                "sum_dist": pa.array(sm),
                "closeness": pa.array(np.round(cl, 6)),
            }
        )

    return ray.data.from_arrow_refs([to_table.remote(s, acc_refs[s]) for s in range(S)])


@ray.remote
def _lm_ecc_fold(acc_prev, D: np.ndarray):
    """Row-wise max over finite distances in this landmark batch's
    shard matrix, max-merged into the running per-shard vector — the
    eccentricity fold (self-distance 0 participates harmlessly)."""
    Df = np.where(np.isfinite(D), D, 0.0)
    mx = Df.max(axis=1).astype(np.int64) if D.shape[1] else np.zeros(len(D), np.int64)
    return mx if acc_prev is None else np.maximum(acc_prev, mx)


def eccentricity(
    graph: GraphTables,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 256,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
) -> "ray.data.Dataset":
    """(id, ecc) for every vertex: eccentricity = max shortest-path
    distance to any REACHABLE source (unreached pairs are ignored, the
    component-local convention; isolated vertices get 0). EXACT with
    ``landmarks=None``; a landmark sample lower-bounds the true value
    (the standard 2-sweep/iFUB building block). Max over sources of
    dist(s, v) equals max over targets on an undirected graph; on a
    directed one this is IN-eccentricity (distance FROM sources).

    Same batched landmark matrix-BFS as harmonic_centrality; only the
    fold differs (running per-shard max, idempotent = the resume
    unit)."""
    n, shard_rows = graph.n, graph.shard_rows
    landmarks = _normalize_landmarks(n, landmarks)
    acc_refs, S = _landmark_bfs_fold(
        graph, landmarks, batch_k, max_iters, directed, combine_fanin, _lm_ecc_fold
    )

    @ray.remote
    def to_table(s: int, acc):
        lo = s * shard_rows
        rows = min(shard_rows, n - lo)
        ecc = np.zeros(rows, np.int64) if acc is None else acc
        return pa.table(
            {
                "id": pa.array(np.arange(lo, lo + rows, dtype=np.int64)),
                "ecc": pa.array(ecc),
            }
        )

    return ray.data.from_arrow_refs([to_table.remote(s, acc_refs[s]) for s in range(S)])


@ray.remote
def _lm_hist_fold(acc_prev, D: np.ndarray, max_d: int):
    """Histogram of finite non-self distances in this landmark batch's
    shard matrix (integer BFS distances → bincount), summed into the
    running per-shard histogram. Distances above ``max_d`` clamp into
    the last bin (reported; a web graph's tail is tiny)."""
    finite = np.isfinite(D) & (D > 0)
    d = D[finite].astype(np.int64)
    if len(d) == 0:
        h = np.zeros(max_d + 1, np.int64)
    else:
        h = np.bincount(np.minimum(d, max_d), minlength=max_d + 1)
    return h if acc_prev is None else acc_prev + h


def effective_diameter(
    graph: GraphTables,
    q: float = 0.9,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 256,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
    max_d: int = 512,
) -> "ray.data.Dataset":
    """One row (n_pairs, eff_diameter, mean_dist 6dp): the q-quantile
    of the reachable-pair shortest-path distribution — THE standard
    web-graph connectivity number ("90% of reachable pairs are within
    d hops"; Leskovec et al. densification papers). eff_diameter is
    the smallest integer d with cum(d) ≥ q·n_pairs (the discrete
    convention — no interpolation, so the gate is integer-exact).
    EXACT with ``landmarks=None``; a landmark sample summarizes the
    sampled source rows. Same batched landmark matrix-BFS as
    harmonic_centrality; the fold is a per-shard integer histogram
    (distances are small ints — O(max_d) driver state)."""
    n, shard_rows = graph.n, graph.shard_rows
    if not (0 < q <= 1):
        raise ValueError("q must be in (0, 1]")
    landmarks = _normalize_landmarks(n, landmarks)
    acc_refs, S = _landmark_bfs_fold(
        graph,
        landmarks,
        batch_k,
        max_iters,
        directed,
        combine_fanin,
        _lm_hist_fold,
        fold_extra=(max_d,),
    )

    hists = [h for h in ray.get(acc_refs) if h is not None]
    if not hists:
        return ray.data.from_items(
            [{"n_pairs": 0, "eff_diameter": 0, "mean_dist": 0.0}]
        )
    h = np.sum(hists, axis=0)
    n_pairs = int(h.sum())
    cum = np.cumsum(h)
    # integer-exact threshold: float q*n_pairs overshoots exact
    # boundaries (0.9*40 = 36.000000000000004); Fraction(str(q))
    # recovers the DECIMAL the caller wrote, and ceil(q·n) in exact
    # integer arithmetic implements "smallest d with cum(d) >= q·n"
    from fractions import Fraction

    fq = Fraction(str(q))
    target = -((-fq.numerator * n_pairs) // fq.denominator)  # ceil
    eff = int(np.searchsorted(cum, target, side="left"))
    mean = float((h * np.arange(len(h))).sum()) / n_pairs if n_pairs else 0.0
    return ray.data.from_items(
        [
            {
                "n_pairs": n_pairs,
                "eff_diameter": eff,
                "mean_dist": round(mean, 6),
            }
        ]
    )


# ------------------------------------------------------- betweenness (Brandes)
#
# bc(v) = Σ_{s≠v≠t} σ_st(v) / σ_st over ORDERED (s, t) pairs (the
# directed-sum convention; on a symmetrized graph every unordered pair
# contributes twice). Exact with landmarks=None; a landmark sample is
# the standard Brandes source-sampling estimator scaled by n/K
# (Brandes 2001; Bader et al. 2007 sampling).
#
# Engine shape: the same per-shard BSP matrix exchanges as the
# landmark BFS above, three phases per landmark batch —
#  1. FUSED forward sweep: one (dist, sigma) payload per exchange.
#     Synchronous unit-weight relaxation reaches level-t vertices in
#     round t with ALL their shortest-path counts in that same round
#     (in-neighbors at t-1 are final by induction), so the reduce
#     accepts sigma only on a STRICT distance improvement — later
#     rounds re-deliver equal-distance duplicates, which are rejected.
#     O(diameter) exchanges, no separate sigma pass.
#  2. Backward dependency sweep, one level per exchange from the
#     deepest level down: along reversed edges w→v, partial sums of
#     (1+δ_w)/σ_w masked to d_w == lev are routed to v's shard, where
#     δ_v += σ_v · P only on rows with d_v == lev-1 (non-tree edges
#     contribute nothing). O(diameter) exchanges.
#  3. bc_v += Σ_k δ[v, k] with each landmark's own row zeroed
#     (v ≠ s, t by definition). Additive per batch — the resumable
#     unit is the landmark batch, as in harmonic_centrality.


@ray.remote
def _bc_init_shard(s: int, n: int, shard_rows: int, landmarks: np.ndarray):
    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    d = np.full((size, len(landmarks)), np.inf)
    sg = np.zeros((size, len(landmarks)))
    here = (landmarks >= lo) & (landmarks < lo + size)
    d[landmarks[here] - lo, np.nonzero(here)[0]] = 0.0
    sg[landmarks[here] - lo, np.nonzero(here)[0]] = 1.0
    return d, sg


def _bc_payload(payload: bytes):
    K = int(np.frombuffer(payload[:8], dtype=np.int64)[0])
    body = payload[8:]
    k = len(body) // (8 + 16 * K)
    idx = np.frombuffer(body[: k * 8], dtype=np.int64)
    mats = np.frombuffer(body[k * 8 :], dtype=np.float64)
    return K, idx, mats[: k * K].reshape(k, K), mats[k * K :].reshape(k, K)


def _bc_merge(K, idx, dmat, smat):
    """(min dist, Σ sigma over min-achievers) per (vertex, landmark)."""
    uniq, inv = np.unique(idx, return_inverse=True)
    dmin = np.full((len(uniq), K), np.inf)
    np.minimum.at(dmin, inv, dmat)
    contrib = np.where(dmat == dmin[inv], smat, 0.0)
    ssum = np.zeros((len(uniq), K))
    np.add.at(ssum, inv, contrib)
    return uniq, dmin, ssum


def _bc_pack(K, idx, dmat, smat) -> bytes:
    return (
        np.array([K], dtype=np.int64).tobytes()
        + idx.astype(np.int64).tobytes()
        + dmat.tobytes()
        + smat.tobytes()
    )


@ray.remote
def _bc_gather(block, state_refs: list, n: int, shard_rows: int, S: int, K: int):
    """Per-block (d[src]+1, sigma[src]) candidates, min/sum-merged per
    dst and routed per shard."""
    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(src) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(src.min()), int(src.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    parts = ray.get(state_refs[s0 : s1 + 1])
    D = np.concatenate([p[0] for p in parts]) if s1 > s0 else parts[0][0]
    SG = np.concatenate([p[1] for p in parts]) if s1 > s0 else parts[0][1]
    rel = src - s0 * shard_rows
    # only finite-distance sources can relax anything this round
    cand_d = D[rel] + 1.0
    cand_s = SG[rel]
    uniq, dmin, ssum = _bc_merge(K, dst, cand_d, cand_s)
    shard_of = uniq // shard_rows
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        out[int(s)] = _bc_pack(
            K, uniq[a:b] - s * shard_rows, dmin[a:b], ssum[a:b]
        )
    return tuple(out) if S > 1 else out[0]


@ray.remote
def _bc_combine(*payloads):
    K, idxs, ds, ss = None, [], [], []
    for p in payloads:
        if p is None:
            continue
        K, i, d, s = _bc_payload(p)
        idxs.append(i)
        ds.append(d)
        ss.append(s)
    if not idxs:
        return None
    uniq, dmin, ssum = _bc_merge(
        K, np.concatenate(idxs), np.concatenate(ds), np.concatenate(ss)
    )
    return _bc_pack(K, uniq, dmin, ssum)


@ray.remote(num_returns=2)
def _bc_reduce(state, *payloads):
    """Strict-improvement acceptance: a (vertex, landmark) cell takes
    the merged candidate ONLY when its distance is strictly better —
    equal-distance re-deliveries from later rounds are duplicates of
    sigma already counted and are rejected (see phase-1 note above)."""
    acc_d, acc_s = state[0].copy(), state[1].copy()
    K, idxs, ds, ss = None, [], [], []
    for p in payloads:
        if p is None:
            continue
        K, i, d, s = _bc_payload(p)
        idxs.append(i)
        ds.append(d)
        ss.append(s)
    if not idxs:
        return 0, (acc_d, acc_s)
    uniq, dmin, ssum = _bc_merge(
        K, np.concatenate(idxs), np.concatenate(ds), np.concatenate(ss)
    )
    D = acc_d[uniq]
    SG = acc_s[uniq]
    take = dmin < D
    D[take] = dmin[take]
    SG[take] = ssum[take]
    acc_d[uniq] = D
    acc_s[uniq] = SG
    return int(take.sum()), (acc_d, acc_s)


@ray.remote
def _bc_back_gather(
    block, state_refs: list, dep_refs: list, lev: int, n: int, shard_rows: int, S: int, K: int
):
    """One backward level over REVERSED edge blocks (src column = w,
    dst column = v): Σ (1+δ_w)/σ_w masked to d_w == lev, per-dst
    summed and routed to v's shard."""
    w = block.column("src").to_numpy(zero_copy_only=False)
    v = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(w) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(w.min()), int(w.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    parts = ray.get(state_refs[s0 : s1 + 1])
    D = np.concatenate([p[0] for p in parts]) if s1 > s0 else parts[0][0]
    SG = np.concatenate([p[1] for p in parts]) if s1 > s0 else parts[0][1]
    deps = ray.get(dep_refs[s0 : s1 + 1])
    DL = np.concatenate(deps) if s1 > s0 else deps[0]
    rel = w - s0 * shard_rows
    mask = D[rel] == float(lev)  # (e, K) — only level-`lev` w rows emit
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(mask & (SG[rel] > 0), (1.0 + DL[rel]) / SG[rel], 0.0)
    uniq, inv = np.unique(v, return_inverse=True)
    sums = np.zeros((len(uniq), K))
    np.add.at(sums, inv, c)
    shard_of = uniq // shard_rows
    header = np.array([K], dtype=np.int64).tobytes()
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        out[int(s)] = (
            header
            + (uniq[a:b] - s * shard_rows).astype(np.int64).tobytes()
            + sums[a:b].tobytes()
        )
    return tuple(out) if S > 1 else out[0]


@ray.remote
def _bc_sum_combine(*payloads):
    """Tree-combine node for the BACKWARD sweep: payloads are partial
    SUMS, so the merge is addition (associative — tree == flat), not
    the min-merge of the distance sweeps."""
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
    sums = np.zeros((len(uniq), K))
    np.add.at(sums, inv, mat)
    return np.array([K], dtype=np.int64).tobytes() + uniq.tobytes() + sums.tobytes()


@ray.remote
def _bc_back_reduce(state, dep, lev: int, *payloads):
    """δ_v += σ_v · P on rows with d_v == lev-1 (others discard — a
    routed sum along a non-tree edge must not contribute)."""
    acc = dep.copy()
    D, SG = state
    for p in payloads:
        if p is None:
            continue
        K, idx, mat = _lm_payload(p)
        upd = np.where(D[idx] == float(lev - 1), SG[idx] * mat, 0.0)
        acc[idx] += upd
    return acc


@ray.remote
def _bc_fold(acc_prev, dep: np.ndarray, s: int, shard_rows: int, landmarks: np.ndarray):
    """bc_v += Σ_k δ[v, k], zeroing each landmark's own row first."""
    d = dep.copy()
    lo = s * shard_rows
    here = (landmarks >= lo) & (landmarks < lo + len(d))
    d[landmarks[here] - lo, np.nonzero(here)[0]] = 0.0
    out = d.sum(axis=1)
    return out if acc_prev is None else acc_prev + out


def betweenness_centrality(
    graph: GraphTables,
    landmarks: "np.ndarray | list[int] | None" = None,
    batch_k: int = 64,
    max_iters: int = 100,
    directed: bool = False,
    combine_fanin: int = 0,
) -> "ray.data.Dataset":
    """(id, betweenness) for every vertex — Brandes over ordered
    (source, target) pairs. ``landmarks=None`` uses ALL vertices
    (exact — small graphs / oracle gates); otherwise the
    source-sampled estimate scaled by n/K. Cost per landmark batch:
    O(diameter) forward exchanges (fused dist+sigma) + O(diameter)
    backward exchanges, each a full edge sweep through the per-shard
    BSP combine — the same scale contract as harmonic_centrality."""
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
    blocks_ds = edges_mat.repartition(target_blocks).materialize()
    blocks = blocks_ds.to_arrow_refs()
    # reversed blocks for the backward sweep (src column = w)
    rblocks = (
        blocks_ds.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")})
            if len(t)
            else pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
        .to_arrow_refs()
    )

    from ..util import tree_combine_refs

    bc_refs: list = [None] * S
    for b0 in range(0, len(landmarks), batch_k):
        lms = landmarks[b0 : b0 + batch_k]
        K = len(lms)
        state_refs = [_bc_init_shard.remote(s, n, shard_rows, lms) for s in range(S)]
        # ---- fused forward sweep: dist + sigma in one exchange stream
        rounds = 0
        for _ in range(max_iters):
            gathers = [
                _bc_gather.options(num_returns=S).remote(
                    b, state_refs, n, shard_rows, S, K
                )
                for b in blocks
            ]
            cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
            if combine_fanin > 0:
                cols = [
                    tree_combine_refs(cols[s], _bc_combine, combine_fanin)
                    for s in range(S)
                ]
            outs = [_bc_reduce.remote(state_refs[s], *cols[s]) for s in range(S)]
            changed = int(sum(ray.get([o[0] for o in outs])))
            state_refs = [o[1] for o in outs]
            rounds += 1
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"betweenness forward sweep did not converge in {max_iters} rounds"
            )
        # ---- backward dependency sweep, deepest level first
        max_lev = rounds - 1  # last round changed nothing → levels < rounds
        dep_refs = [
            ray.put(np.zeros_like(ray.get(state_refs[s])[0])) for s in range(S)
        ]
        for lev in range(max_lev, 0, -1):
            gathers = [
                _bc_back_gather.options(num_returns=S).remote(
                    b, state_refs, dep_refs, lev, n, shard_rows, S, K
                )
                for b in rblocks
            ]
            cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
            if combine_fanin > 0:
                cols = [
                    tree_combine_refs(cols[s], _bc_sum_combine, combine_fanin)
                    for s in range(S)
                ]
            dep_refs = [
                _bc_back_reduce.remote(state_refs[s], dep_refs[s], lev, *cols[s])
                for s in range(S)
            ]
        bc_refs = [
            _bc_fold.remote(bc_refs[s], dep_refs[s], s, shard_rows, lms)
            for s in range(S)
        ]

    @ray.remote
    def to_table(s: int, bc):
        lo = s * shard_rows
        vals = np.zeros(min(shard_rows, n - lo)) if bc is None else bc
        return pa.table(
            {
                "id": pa.array(np.arange(lo, lo + len(vals), dtype=np.int64)),
                "betweenness": pa.array(np.round(vals * scale, 6)),
            }
        )

    return ray.data.from_arrow_refs([to_table.remote(s, bc_refs[s]) for s in range(S)])
