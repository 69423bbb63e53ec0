"""Connected components via iterative min-label propagation.

A capability the reference lacks entirely (SURVEY §2.5 —
lioia/distributed-pagerank implements only PageRank) but the north
rule mandates. Same execution shape as PageRank: per iteration a
gather stage streams the symmetrized src-sorted edge table, pulls the
1-2 label shards overlapping each batch's src range, pre-aggregates
``min(label[src])`` per dst within the batch, then one
``groupby('id').min()`` shuffle combines across batches with a
self-label branch (every vertex keeps its own label as a candidate).
Stops when no label changed (exact fixpoint; labels are integers) or
at ``max_iters``.

Label = min vertex id reachable in the undirected graph. Convergence
needs O(diameter) rounds; the web-style corpus (Zipf links + chain)
has small diameter. For pathological long-chain graphs a
pointer-jumping variant would be needed — documented limitation.

Checkpoint layout mirrors PageRank (iter_k/labels + manifest) so a
killed CC run resumes.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..config import RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from .graphbuild import GraphTables

_OWN_SENTINEL = float(1 << 62)


@ray.remote
def _cc_gather_block(block, label_refs: list, n: int, shard_rows: int, S: int, inc: float = 0.0):
    """Per-block min-label partials per dst shard (num_returns=S routes
    each straight to its reduce task — same shape as PageRank gather).
    ``inc`` is added to every gathered value before the min: 0 gives
    min-label propagation (CC), 1 gives hop-distance relaxation (BFS —
    pipelines/bfs.py reuses this kernel)."""
    import numpy as np

    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(src) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(src.min()), int(src.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    labels = (
        np.concatenate([ray.get(r) for r in label_refs[s0 : s1 + 1]])
        if s1 > s0
        else ray.get(label_refs[s0])
    )
    vals = labels[src - s0 * shard_rows]
    if inc:
        vals = vals + inc
    uniq, inv = np.unique(dst, return_inverse=True)
    mins = np.full(len(uniq), np.inf)
    np.minimum.at(mins, inv, vals)
    shard_of = uniq // shard_rows
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        out[int(s)] = (
            (uniq[a:b] - s * shard_rows).astype(np.int64).tobytes()
            + mins[a:b].tobytes()
        )
    return tuple(out) if S > 1 else out[0]


@ray.remote
def _cc_combine(*payloads):
    """Intermediate tree-combine node (combine_fanin > 0): min-merge a
    group of (local-idx, min-label) byte payloads into one — min is
    associative, so the tree path is EXACTLY the flat path."""
    locs, vals = [], []
    for payload in payloads:
        if payload is None:
            continue
        k = len(payload) // 16
        locs.append(np.frombuffer(payload[: k * 8], dtype=np.int64))
        vals.append(np.frombuffer(payload[k * 8 :], dtype=np.float64))
    if not locs:
        return None
    loc = np.concatenate(locs)
    val = np.concatenate(vals)
    uniq, inv = np.unique(loc, return_inverse=True)
    mins = np.full(len(uniq), np.inf)
    np.minimum.at(mins, inv, val)
    return uniq.tobytes() + mins.tobytes()


@ray.remote(num_returns=2)
def _cc_reduce_shard(s: int, old: "np.ndarray", n: int, shard_rows: int, out_dir: str, *payloads):
    """Min-combine partials with the shard's own labels, write checkpoint,
    return (changed_count, new_label_array)."""
    import numpy as np
    import pyarrow.parquet as pq

    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    acc = old.copy()  # own label always a candidate
    for payload in payloads:
        if payload is None:
            continue
        k = len(payload) // 16
        local = np.frombuffer(payload[: k * 8], dtype=np.int64)
        np.minimum.at(acc, local, np.frombuffer(payload[k * 8 :], dtype=np.float64))
    changed = acc != old
    shard_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
    os.makedirs(shard_dir, exist_ok=True)
    t = pa.table(
        {
            "id": pa.array(np.arange(lo, lo + size, dtype=np.int64)),
            "label": pa.array(acc),
            "changed": pa.array(changed.astype(np.float64)),
        }
    )
    tmp = os.path.join(shard_dir, "part.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(shard_dir, "part.parquet"))
    return int(changed.sum()), acc


def symmetrize_edges(graph: GraphTables) -> str:
    """Write (cached) the undirected edge table sorted by src; return path.

    union(edges, reversed(edges)) → distinct — one shuffle, done once.
    """
    out = os.path.join(graph.run_dir, "cc", "edges_sym")
    done = out + "_DONE"
    if os.path.exists(done):
        return out
    import pyarrow.compute as pc

    # drop self-loops: they are meaningless undirected (and would make a
    # vertex its own LPA neighbor)
    edges = graph.edges().map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst")))),
        batch_format="pyarrow",
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    sym = (
        edges.union(edges.map_batches(rev, batch_format="pyarrow"))
        .groupby(["src", "dst"])
        .aggregate(Min("dst", alias_name="_d"))
        .select_columns(["src", "dst"])
        .sort("src")
    )
    sym.write_parquet(out)
    with open(done, "w") as fh:
        fh.write("ok")
    return out


@dataclass
class CCResult:
    run_dir: str
    n: int
    iterations: int
    converged: bool
    n_components: int
    shard_rows: int = 1 << 19  # layout the checkpoints were written with

    @property
    def labels_path(self) -> str:
        return os.path.join(self.run_dir, "cc", "final", "labels")

    def labels(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.labels_path, columns=["id", "label"])

    def labels_numpy(self, shard_rows: int | None = None) -> np.ndarray:
        vec = ShardedVector.from_parquet(
            self.labels_path, self.n, shard_rows or self.shard_rows, "id", "label"
        )
        return vec.to_numpy().astype(np.int64)


def connected_components(
    graph: GraphTables, run_cfg: RunConfig | None = None, max_iters: int = 100
) -> CCResult:
    run_cfg = run_cfg or RunConfig()
    n, shard_rows = graph.n, graph.shard_rows
    cc_dir = os.path.join(graph.run_dir, "cc")
    os.makedirs(cc_dir, exist_ok=True)
    sym_path = symmetrize_edges(graph)
    fingerprint = f"cc|{graph.fingerprint()}"

    start_k = ckpt.latest_complete_iter(cc_dir, fingerprint)
    manifest = {"fingerprint": fingerprint, "n": n, "shard_rows": shard_rows}
    if start_k is None:
        tmp = ckpt.begin_iter(cc_dir, 0)

        def _init(batch: pa.Table) -> pa.Table:
            ids = batch.column("id")
            t = pa.table(
                {
                    "id": ids,
                    "label": ids.cast(pa.float64()),
                    "changed": pa.array(np.zeros(len(batch))),
                }
            )
            return add_shard_column(t, "id", shard_rows)

        graph.vertices(columns=["id"]).map_batches(_init, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "labels"), partition_cols=[SHARD_COL]
        )
        ckpt.commit_iter(cc_dir, 0, {"iteration": 0, "changed": n}, manifest)
        start_k = 0

    k = start_k
    label_vec = ShardedVector.from_parquet(
        os.path.join(ckpt.iter_dir(cc_dir, k), "labels"), n, shard_rows, "id", "label"
    )
    m = ckpt.read_manifest(cc_dir) or {}
    changed = int(m.get("last_changed", n))
    converged = changed == 0

    # Loop-invariant inputs materialized once; iterations run as raw-task
    # BSP over the Dataset-prepared blocks (same shape as the PageRank
    # combine — per-shard min partials routed straight to reducers).
    from ..state.shards import n_shards

    S = n_shards(n, shard_rows)
    if not converged:
        sym_mat = ray.data.read_parquet(sym_path, columns=["src", "dst"]).materialize()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        target_blocks = max(S, min(4 * ncpu, max(1, sym_mat.count() // 65536)))
        blocks = sym_mat.repartition(target_blocks).materialize().to_arrow_refs()

    while not converged and k < max_iters:
        t0 = time.time()
        k += 1
        tmp = ckpt.begin_iter(cc_dir, k)
        labels_out = os.path.join(tmp, "labels")
        os.makedirs(labels_out, exist_ok=True)
        gathers = [
            _cc_gather_block.options(num_returns=S).remote(b, label_vec.refs, n, shard_rows, S)
            for b in blocks
        ]
        cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
        if run_cfg.combine_fanin > 0:
            from ..util import tree_combine_refs

            cols = [
                tree_combine_refs(cols[s], _cc_combine, run_cfg.combine_fanin)
                for s in range(S)
            ]
            del gathers
        outs = [
            _cc_reduce_shard.remote(s, label_vec.refs[s], n, shard_rows, labels_out, *cols[s])
            for s in range(S)
        ]
        changed = int(sum(ray.get([o[0] for o in outs])))
        label_vec = ShardedVector(refs=[o[1] for o in outs], n=n, shard_rows=shard_rows)
        ckpt.commit_iter(
            cc_dir, k, {"iteration": k, "changed": changed, "wall_sec": time.time() - t0}, manifest
        )
        converged = changed == 0

    # publish final labels (int64)
    final = os.path.join(cc_dir, "final", "labels")
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    last = os.path.join(ckpt.iter_dir(cc_dir, k), "labels")

    def _to_int(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "id": batch.column("id"),
                "label": batch.column("label").cast(pa.int64()),
            }
        )
        return add_shard_column(t, "id", shard_rows)

    ray.data.read_parquet(last, columns=["id", "label"]).map_batches(
        _to_int, batch_format="pyarrow"
    ).write_parquet(final, partition_cols=[SHARD_COL])
    # distinct-count as an aggregate: groupby shrinks to one row per
    # label, .count() reads row-count metadata — no driver-side list
    n_components = (
        ray.data.read_parquet(final, columns=["label"])
        .groupby("label")
        .aggregate(Count(alias_name="_n"))
        .count()
    )
    ckpt.write_metrics_parquet(cc_dir)
    return CCResult(
        run_dir=graph.run_dir,
        n=n,
        iterations=k,
        converged=converged,
        n_components=int(n_components),
        shard_rows=shard_rows,
    )
