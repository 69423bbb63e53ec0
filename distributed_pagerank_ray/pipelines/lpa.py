"""Community detection via synchronous label propagation (LPA).

Reference has no community detection (SURVEY §2.5); mandated by the
north rule. Deterministic variant: every vertex adopts the most
frequent label among its undirected neighbors; ties break to the
smallest label; a vertex with no neighbors keeps its own label.
Synchronous LPA can oscillate, so the loop caps at ``max_iters``
(default 20) in addition to the no-change fixpoint.

Execution per iteration:
1. gather stage over the symmetrized src-sorted edges: pull label
   shards for the batch's src range, pre-aggregate counts per
   (dst, label) within the batch (combiner),
2. ``groupby(['id','lbl']).sum('cnt')`` shuffle — global counts,
3. ``groupby('id').map_groups`` — argmax with deterministic
   tie-break; the vertex's own label rides along as a zero-count row
   flagged ``own=1`` (so "keep own label when isolated" and changed
   detection need no extra join).

NOTE on the combined-count key: per-batch pre-aggregation uses
``np.unique`` over a packed (dst, label) int64 key — valid while
``n < 2**31``; beyond that, pack into two lexsorted columns instead
(documented scale path).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from .components import symmetrize_edges
from .graphbuild import GraphTables


@dataclass
class LPAResult:
    run_dir: str
    n: int
    iterations: int
    converged: bool
    shard_rows: int = 1 << 19  # layout the checkpoints were written with

    @property
    def labels_path(self) -> str:
        return os.path.join(self.run_dir, "lpa", "final", "labels")

    def labels(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.labels_path, columns=["id", "label"])

    def labels_numpy(self, shard_rows: int | None = None) -> np.ndarray:
        vec = ShardedVector.from_parquet(
            self.labels_path, self.n, shard_rows or self.shard_rows, "id", "label"
        )
        return vec.to_numpy().astype(np.int64)


def label_propagation(
    graph: GraphTables, run_cfg: RunConfig | None = None, max_iters: int = 20
) -> LPAResult:
    run_cfg = run_cfg or RunConfig()
    n, shard_rows = graph.n, graph.shard_rows
    if n >= (1 << 31):
        raise NotImplementedError("packed (dst,label) key needs n < 2**31; see module docstring")
    lpa_dir = os.path.join(graph.run_dir, "lpa")
    os.makedirs(lpa_dir, exist_ok=True)
    sym_path = symmetrize_edges(graph)
    fingerprint = f"lpa|{graph.fingerprint()}"

    start_k = ckpt.latest_complete_iter(lpa_dir, fingerprint)
    manifest = {"fingerprint": fingerprint, "n": n, "shard_rows": shard_rows}
    if start_k is None:
        tmp = ckpt.begin_iter(lpa_dir, 0)

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
        ckpt.commit_iter(lpa_dir, 0, {"iteration": 0, "changed": n}, manifest)
        start_k = 0

    k = start_k
    label_vec = ShardedVector.from_parquet(
        os.path.join(ckpt.iter_dir(lpa_dir, k), "labels"), n, shard_rows, "id", "label"
    )
    m = ckpt.read_manifest(lpa_dir) or {}
    changed = int(m.get("last_changed", n))
    converged = changed == 0

    while not converged and k < max_iters:
        t0 = time.time()
        lv = label_vec
        pack = np.int64(n) + 1

        def gather(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.int64()),
                        "lbl": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.float64()),
                        "own": pa.array([], pa.float64()),
                    }
                )
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            off, labels = lv.gather_range(int(src.min()), int(src.max()))
            lbl = labels[src - off].astype(np.int64)
            key = dst * pack + lbl  # safe: n < 2**31
            uniq, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
            return pa.table(
                {
                    "id": pa.array(uniq // pack),
                    "lbl": pa.array(uniq % pack),
                    "cnt": pa.array(cnt),
                    "own": pa.array(np.zeros(len(uniq))),
                }
            )

        def self_branch(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            off, labels = lv.gather_range(int(ids.min()), int(ids.max()))
            own = labels[ids - off].astype(np.int64)
            z = np.zeros(len(ids))
            return pa.table(
                {
                    "id": batch.column("id"),
                    "lbl": pa.array(own),
                    "cnt": pa.array(z),
                    "own": pa.array(np.ones(len(ids))),
                }
            )

        counts = (
            ray.data.read_parquet(sym_path, columns=["src", "dst"])
            .map_batches(gather, batch_format="pyarrow", batch_size=run_cfg.batch_size)
            .union(graph.vertices(columns=["id"]).map_batches(self_branch, batch_format="pyarrow"))
            .groupby(["id", "lbl"])
            .aggregate(Sum("cnt", alias_name="cnt"), Sum("own", alias_name="own"))
        )

        def pick(group: pd.DataFrame) -> pd.DataFrame:
            # argmax count, tie -> smallest label (deterministic)
            g = group.sort_values(["cnt", "lbl"], ascending=[False, True])
            new = int(g.iloc[0]["lbl"])
            own_rows = group[group["own"] > 0]
            old = int(own_rows.iloc[0]["lbl"]) if len(own_rows) else new
            vid = int(group.iloc[0]["id"])
            return pd.DataFrame(
                {
                    "id": [vid],
                    "label": [float(new)],
                    "changed": [float(new != old)],
                    SHARD_COL: [vid // shard_rows],
                }
            )

        k += 1
        tmp = ckpt.begin_iter(lpa_dir, k)
        counts.groupby("id").map_groups(pick, batch_format="pandas").write_parquet(
            os.path.join(tmp, "labels"), partition_cols=[SHARD_COL]
        )
        label_vec, changed_f = ShardedVector.from_parquet_with_sum(
            os.path.join(tmp, "labels"), n, shard_rows, "id", "label", 0.0, "changed"
        )
        changed = int(changed_f)
        ckpt.commit_iter(
            lpa_dir, k, {"iteration": k, "changed": changed, "wall_sec": time.time() - t0}, manifest
        )
        converged = changed == 0

    final = os.path.join(lpa_dir, "final", "labels")
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    last = os.path.join(ckpt.iter_dir(lpa_dir, k), "labels")

    def _to_int(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"id": batch.column("id"), "label": batch.column("label").cast(pa.int64())}
        )
        return add_shard_column(t, "id", shard_rows)

    ray.data.read_parquet(last, columns=["id", "label"]).map_batches(
        _to_int, batch_format="pyarrow"
    ).write_parquet(final, partition_cols=[SHARD_COL])
    return LPAResult(
        run_dir=graph.run_dir, n=n, iterations=k, converged=converged, shard_rows=shard_rows
    )
