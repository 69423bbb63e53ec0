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
from ray.data.aggregate import Min

from ..config import RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from .graphbuild import GraphTables

_OWN_SENTINEL = float(1 << 62)


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

    while not converged and k < max_iters:
        t0 = time.time()
        lv = label_vec

        def gather(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.int64()),
                        "lbl": pa.array([], pa.float64()),
                        "own": pa.array([], pa.float64()),
                    }
                )
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            off, labels = lv.gather_range(int(src.min()), int(src.max()))
            vals = labels[src - off]
            uniq, inv = np.unique(dst, return_inverse=True)
            mins = np.full(len(uniq), np.inf)
            np.minimum.at(mins, inv, vals)
            return pa.table(
                {
                    "id": pa.array(uniq),
                    "lbl": pa.array(mins),
                    "own": pa.array(np.full(len(uniq), _OWN_SENTINEL)),
                }
            )

        def self_branch(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            off, labels = lv.gather_range(int(ids.min()), int(ids.max()))
            own = labels[ids - off]
            return pa.table(
                {"id": batch.column("id"), "lbl": pa.array(own), "own": pa.array(own)}
            )

        neighbor_mins = ray.data.read_parquet(sym_path, columns=["src", "dst"]).map_batches(
            gather, batch_format="pyarrow", batch_size=run_cfg.batch_size
        )
        own_labels = graph.vertices(columns=["id"]).map_batches(
            self_branch, batch_format="pyarrow"
        )
        combined = neighbor_mins.union(own_labels).groupby("id").aggregate(
            Min("lbl", alias_name="lbl"), Min("own", alias_name="own")
        )

        def _update(batch: pa.Table) -> pa.Table:
            new = batch.column("lbl").to_numpy(zero_copy_only=False)
            old = batch.column("own").to_numpy(zero_copy_only=False)
            t = pa.table(
                {
                    "id": batch.column("id"),
                    "label": pa.array(new),
                    "changed": pa.array((new != old).astype(np.float64)),
                }
            )
            return add_shard_column(t, "id", shard_rows)

        k += 1
        tmp = ckpt.begin_iter(cc_dir, k)
        combined.map_batches(_update, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "labels"), partition_cols=[SHARD_COL]
        )
        label_vec, changed_f = ShardedVector.from_parquet_with_sum(
            os.path.join(tmp, "labels"), n, shard_rows, "id", "label", 0.0, "changed"
        )
        changed = int(changed_f)
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
    n_components = ray.data.read_parquet(final, columns=["label"]).unique("label")
    return CCResult(
        run_dir=graph.run_dir,
        n=n,
        iterations=k,
        converged=converged,
        n_components=len(n_components),
        shard_rows=shard_rows,
    )
