"""Iterative PageRank as a Ray Data pipeline with checkpointed state.

Per iteration (the reference's Map → Collect → Reduce → Convergence
FSM, reference: pkg/node/master.go:21-55, collapsed into one lazy
Dataset plan consumed by a checkpoint write):

1. **Gather/Map** (reference workerMap, pkg/node/worker.go:95-103):
   stream the src-sorted edge table; each batch pulls only the 1-2
   rank/weight shards overlapping its src range from the object store,
   computes ``rank[src] * 1/out[src]`` vectorized, and pre-aggregates
   per dst within the batch (the combiner the reference lacks).
2. **Combine** (reference masterCollect, pkg/node/master.go:106-140):
   one ``groupby('id').sum()`` shuffle over the pre-aggregated
   contribution rows unioned with a vertices branch (id, e) and a
   previous-ranks branch (id, old) — a join expressed as
   union + aggregate, so the update step is shuffle-local with no
   lookups.
3. **Reduce/update** (reference workerReduce, pkg/node/worker.go:105-111):
   ``new = c*contrib [+ c*dangling_mass/n] + (1-c)*e``; ``delta =
   |new - old|`` computed in the same batch.
4. **Checkpoint + convergence** (reference masterConvergence,
   pkg/node/master.go:142-189): write ranks (shard-partitioned
   Parquet) + metrics atomically, then L1 residual = ``sum(delta)``;
   stop when residual <= threshold (master.go:158) or the
   100-iteration cap (pkg/graph/pagerank.go:12).

Final normalization once at the end (pkg/node/master.go:160-167).
Dangling vertices contribute nothing unless
``semantics.dangling='redistribute'`` (reference leaks that mass,
pkg/graph/pagerank.go:14-19).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import PageRankConfig, RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from .graphbuild import GraphTables


def _empty_update_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([], pa.int64()),
            "contrib": pa.array([], pa.float64()),
            "ec": pa.array([], pa.float64()),
            "old": pa.array([], pa.float64()),
        }
    )


def make_gather_fn(rank_vec: ShardedVector, weight_vec: ShardedVector):
    """Contribution stage: (src,dst) batch → pre-aggregated (id, contrib).

    Object refs are captured by closure; each task ray.gets only the
    shards overlapping its batch's src range (zero-copy from the local
    object store; cross-node pulls on a real cluster)."""

    def gather(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_update_table()
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        lo, hi = int(src.min()), int(src.max())
        off_r, ranks = rank_vec.gather_range(lo, hi)
        off_w, w = weight_vec.gather_range(lo, hi)
        vals = ranks[src - off_r] * w[src - off_w]
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=vals, minlength=len(uniq))
        z = np.zeros(len(uniq))
        return pa.table(
            {"id": pa.array(uniq), "contrib": pa.array(sums), "ec": pa.array(z), "old": pa.array(z)}
        )

    return gather


def _vertices_branch(graph: GraphTables, e_vec: ShardedVector | None):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        if e_vec is None:
            e = batch.column("e").to_numpy(zero_copy_only=False)
        else:
            lo, hi = int(ids.min()), int(ids.max())
            off, ev = e_vec.gather_range(lo, hi)
            e = ev[ids - off]
        z = np.zeros(len(ids))
        return pa.table(
            {"id": batch.column("id"), "contrib": pa.array(z), "ec": pa.array(e), "old": pa.array(z)}
        )

    return graph.vertices(columns=["id", "e"]).map_batches(fn, batch_format="pyarrow")


def _prev_branch(ranks_path: str):
    def fn(batch: pa.Table) -> pa.Table:
        z = np.zeros(len(batch))
        return pa.table(
            {
                "id": batch.column("id"),
                "contrib": pa.array(z),
                "ec": pa.array(z),
                "old": batch.column("rank"),
            }
        )

    return ray.data.read_parquet(ranks_path, columns=["id", "rank"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _dangling_mass(rank_vec: ShardedVector, dang_vec: ShardedVector) -> float:
    @ray.remote
    def dot(a: np.ndarray, b: np.ndarray) -> float:
        return float(np.dot(a, b))

    return float(sum(ray.get([dot.remote(r, d) for r, d in zip(rank_vec.refs, dang_vec.refs)])))


@dataclass
class PageRankResult:
    run_dir: str
    n: int
    m: int
    iterations: int
    converged: bool
    residual: float
    shard_rows: int = 1 << 19  # layout the checkpoints were written with
    residual_history: list = field(default_factory=list)

    @property
    def final_ranks_path(self) -> str:
        return os.path.join(self.run_dir, "final", "ranks")

    def ranks(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.final_ranks_path, columns=["id", "rank"])

    def ranks_numpy(self, shard_rows: int | None = None) -> np.ndarray:
        vec = ShardedVector.from_parquet(
            self.final_ranks_path, self.n, shard_rows or self.shard_rows, "id", "rank"
        )
        return vec.to_numpy()


def pagerank(
    graph: GraphTables,
    cfg: PageRankConfig | None = None,
    run_cfg: RunConfig | None = None,
) -> PageRankResult:
    cfg = cfg or PageRankConfig()
    run_cfg = run_cfg or RunConfig()
    run_dir = graph.run_dir
    n, shard_rows = graph.n, graph.shard_rows
    if n == 0:
        raise ValueError("empty graph")

    e_vec = (
        ShardedVector.from_numpy(np.asarray(cfg.e_vector, dtype=np.float64), shard_rows)
        if cfg.e_vector is not None
        else None
    )
    e_sig = "" if cfg.e_vector is None else str(float(np.asarray(cfg.e_vector).sum()))
    # NB: max_iters deliberately NOT in the fingerprint — resuming a
    # partial run with a higher cap is the normal resume path.
    fingerprint = (
        f"{graph.fingerprint()}|c={cfg.c}|tol={cfg.threshold}"
        f"|dang={cfg.semantics.dangling}|e={e_sig}"
    )

    weight_vec = graph.weight_shards()
    dang_vec = graph.dangling_shards() if cfg.semantics.dangling == "redistribute" else None

    # ---- bootstrap or resume -------------------------------------------------
    start_k = ckpt.latest_complete_iter(run_dir, fingerprint)
    history: list[float] = []
    manifest = {"fingerprint": fingerprint, "n": n, "m": graph.m, "shard_rows": shard_rows}
    if start_k is None:
        tmp = ckpt.begin_iter(run_dir, 0)
        init = 1.0 / n

        def _init(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "id": batch.column("id"),
                    "rank": pa.array(np.full(len(batch), init)),
                    "delta": pa.array(np.zeros(len(batch))),
                }
            )
            return add_shard_column(t, "id", shard_rows)

        graph.vertices(columns=["id"]).map_batches(_init, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "ranks"), partition_cols=[SHARD_COL]
        )
        ckpt.commit_iter(run_dir, 0, {"residual": float("inf"), "iteration": 0}, manifest)
        start_k = 0
    else:
        m = ckpt.read_manifest(run_dir) or {}
        if "last_residual" in m:
            history.append(float(m["last_residual"]))

    converged = False
    residual = float("inf")
    k = start_k
    if history and history[-1] <= cfg.threshold:
        converged = True

    # ---- iterate -------------------------------------------------------------
    prev_ranks_path = os.path.join(ckpt.iter_dir(run_dir, k), "ranks")
    rank_vec = ShardedVector.from_parquet(prev_ranks_path, n, shard_rows, "id", "rank")
    while not converged and k < cfg.max_iters:
        t0 = time.time()
        dm = _dangling_mass(rank_vec, dang_vec) if dang_vec is not None else 0.0

        contribs = graph.edges().map_batches(
            make_gather_fn(rank_vec, weight_vec),
            batch_format="pyarrow",
            batch_size=run_cfg.batch_size,
        )
        combined = (
            contribs.union(_vertices_branch(graph, e_vec), _prev_branch(prev_ranks_path))
            .groupby("id")
            .aggregate(
                Sum("contrib", alias_name="contrib"),
                Sum("ec", alias_name="ec"),
                Sum("old", alias_name="old"),
            )
        )

        c = cfg.c
        dm_share = dm / n

        def _update(batch: pa.Table) -> pa.Table:
            contrib = batch.column("contrib").to_numpy(zero_copy_only=False)
            e = batch.column("ec").to_numpy(zero_copy_only=False)
            old = batch.column("old").to_numpy(zero_copy_only=False)
            new = c * (contrib + dm_share) + (1.0 - c) * e
            t = pa.table(
                {
                    "id": batch.column("id"),
                    "rank": pa.array(new),
                    "delta": pa.array(np.abs(new - old)),
                }
            )
            return add_shard_column(t, "id", shard_rows)

        k += 1
        tmp = ckpt.begin_iter(run_dir, k)
        combined.map_batches(_update, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "ranks"), partition_cols=[SHARD_COL]
        )
        # one checkpoint read refreshes next iteration's rank shards AND
        # piggy-backs the L1 residual (the per-iteration driver barrier is
        # this single scalar)
        rank_vec, residual = ShardedVector.from_parquet_with_sum(
            os.path.join(tmp, "ranks"), n, shard_rows, "id", "rank", 0.0, "delta"
        )
        prev_ranks_path = os.path.join(ckpt.iter_dir(run_dir, k), "ranks")
        metrics = {
            "iteration": k,
            "residual": residual,
            "dangling_mass": dm,
            "wall_sec": time.time() - t0,
            "edges": graph.m,
        }
        ckpt.commit_iter(run_dir, k, metrics, manifest)
        history.append(residual)
        if residual <= cfg.threshold:  # `<=` matches master.go:158
            converged = True

    # ---- final normalization (master.go:160-167) -----------------------------
    last_ranks = os.path.join(ckpt.iter_dir(run_dir, k), "ranks")
    final_dir = os.path.join(graph.run_dir, "final")
    os.makedirs(final_dir, exist_ok=True)
    ds = ray.data.read_parquet(last_ranks, columns=["id", "rank"])
    if cfg.normalize:
        total = float(ds.sum("rank"))

        def _norm(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy(zero_copy_only=False) / total
            t = pa.table({"id": batch.column("id"), "rank": pa.array(r)})
            return add_shard_column(t, "id", shard_rows)

        ds = ds.map_batches(_norm, batch_format="pyarrow")
    out = os.path.join(final_dir, "ranks")
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    ds.write_parquet(out, partition_cols=[SHARD_COL])
    return PageRankResult(
        run_dir=run_dir,
        n=n,
        m=graph.m,
        iterations=k,
        converged=converged,
        residual=residual,
        shard_rows=shard_rows,
        residual_history=history,
    )
