"""Multi-source BFS hop distance via iterative min-plus relaxation.

A graph capability beyond the reference's scope (lioia/
distributed-pagerank, pkg/graph/pagerank.go, implements only PageRank)
built on the SAME sharded BSP engine as connected components: per
iteration a gather stage streams the src-sorted edge table, pulls the
1-2 distance shards overlapping each batch's src range, pre-aggregates
``min(dist[src] + 1)`` per dst within the batch (``_cc_gather_block``
with ``inc=1``), and per-shard reduce tasks min-combine the partials
with each vertex's own distance (distances are monotone
non-increasing, so "own value is always a candidate" is exactly the
BFS relaxation rule). Stops when no distance changed — at that
fixpoint every reachable vertex holds its true hop distance — or at
``max_iters`` (convergence needs eccentricity(seeds) rounds).

Seeds are driver-provided vertex ids; the seed SET is assumed small
enough to broadcast into the init map (thousands–millions — it rides
the task closure as one int64 array). For a giant seed frontier,
initialize via a join against a seeds Dataset instead.

Unreached vertices publish distance -1 (the loop carries +inf; the
final cast maps non-finite → -1 so the published table is pure int64).

Checkpoint layout mirrors CC/PageRank (``bfs/iter_k/dists`` +
manifest keyed by a fingerprint covering the seed set and
directedness) so a killed run resumes.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column, n_shards
from .components import _cc_combine, _cc_gather_block, _cc_reduce_shard, symmetrize_edges
from .graphbuild import GraphTables


@dataclass
class BFSResult:
    run_dir: str
    n: int
    iterations: int
    converged: bool
    n_reached: int
    shard_rows: int = 1 << 19

    @property
    def dists_path(self) -> str:
        return os.path.join(self.run_dir, "bfs", "final", "dists")

    def dists(self) -> "ray.data.Dataset":
        """(id, dist) over ALL vertices; dist = -1 where unreached."""
        return ray.data.read_parquet(self.dists_path, columns=["id", "dist"])


def bfs_hops(
    graph: GraphTables,
    seeds: "np.ndarray | list[int]",
    run_cfg: RunConfig | None = None,
    max_iters: int = 100,
    directed: bool = False,
) -> BFSResult:
    """Hop distance from ``seeds`` to every vertex of ``graph``.

    ``directed=False`` (default) walks the symmetrized edge table (the
    cached one CC builds); ``directed=True`` follows src→dst arcs only.
    """
    run_cfg = run_cfg or RunConfig()
    n, shard_rows = graph.n, graph.shard_rows
    seeds = np.asarray(sorted(int(s) for s in seeds), dtype=np.int64)
    if len(seeds) == 0:
        raise ValueError("bfs_hops needs at least one seed vertex")
    if seeds[0] < 0 or seeds[-1] >= n:
        raise ValueError(f"seed out of range [0, {n})")

    bfs_dir = os.path.join(graph.run_dir, "bfs")
    os.makedirs(bfs_dir, exist_ok=True)
    seed_tag = hashlib.md5(seeds.tobytes()).hexdigest()[:12]
    fingerprint = f"bfs|{graph.fingerprint()}|seeds={seed_tag}|directed={directed}"

    if directed:
        edge_src = graph.edges()
    else:
        edge_src = ray.data.read_parquet(symmetrize_edges(graph), columns=["src", "dst"])

    start_k = ckpt.latest_complete_iter(bfs_dir, fingerprint)
    manifest = {"fingerprint": fingerprint, "n": n, "shard_rows": shard_rows}
    if start_k is None:
        tmp = ckpt.begin_iter(bfs_dir, 0)

        def _init(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            d = np.where(np.isin(ids, seeds), 0.0, np.inf)
            t = pa.table(
                {
                    "id": batch.column("id"),
                    "label": pa.array(d),
                    "changed": pa.array(np.zeros(len(batch))),
                }
            )
            return add_shard_column(t, "id", shard_rows)

        graph.vertices(columns=["id"]).map_batches(_init, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "dists"), partition_cols=[SHARD_COL]
        )
        ckpt.commit_iter(bfs_dir, 0, {"iteration": 0, "changed": n}, manifest)
        start_k = 0

    k = start_k
    dist_vec = ShardedVector.from_parquet(
        os.path.join(ckpt.iter_dir(bfs_dir, k), "dists"), n, shard_rows, "id", "label"
    )
    m = ckpt.read_manifest(bfs_dir) or {}
    changed = int(m.get("last_changed", n))
    converged = changed == 0

    S = n_shards(n, shard_rows)
    if not converged:
        edges_mat = edge_src.materialize()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        target_blocks = max(S, min(4 * ncpu, max(1, edges_mat.count() // 65536)))
        blocks = edges_mat.repartition(target_blocks).materialize().to_arrow_refs()

    while not converged and k < max_iters:
        t0 = time.time()
        k += 1
        tmp = ckpt.begin_iter(bfs_dir, k)
        dists_out = os.path.join(tmp, "dists")
        os.makedirs(dists_out, exist_ok=True)
        gathers = [
            _cc_gather_block.options(num_returns=S).remote(
                b, dist_vec.refs, n, shard_rows, S, 1.0
            )
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
            _cc_reduce_shard.remote(s, dist_vec.refs[s], n, shard_rows, dists_out, *cols[s])
            for s in range(S)
        ]
        changed = int(sum(ray.get([o[0] for o in outs])))
        dist_vec = ShardedVector(refs=[o[1] for o in outs], n=n, shard_rows=shard_rows)
        ckpt.commit_iter(
            bfs_dir, k, {"iteration": k, "changed": changed, "wall_sec": time.time() - t0}, manifest
        )
        converged = changed == 0

    final = os.path.join(bfs_dir, "final", "dists")
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    last = os.path.join(ckpt.iter_dir(bfs_dir, k), "dists")

    def _to_int(batch: pa.Table) -> pa.Table:
        d = batch.column("label").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "id": batch.column("id"),
                "dist": pa.array(np.where(np.isfinite(d), d, -1.0).astype(np.int64)),
            }
        )
        return add_shard_column(t, "id", shard_rows)

    ray.data.read_parquet(last, columns=["id", "label"]).map_batches(
        _to_int, batch_format="pyarrow"
    ).write_parquet(final, partition_cols=[SHARD_COL])
    n_reached = (
        ray.data.read_parquet(final, columns=["dist"])
        .map_batches(
            lambda t: pa.table(
                {"r": pa.array([int((t.column("dist").to_numpy(zero_copy_only=False) >= 0).sum())])}
            ),
            batch_format="pyarrow",
        )
        .sum("r")
    )
    ckpt.write_metrics_parquet(bfs_dir)
    return BFSResult(
        run_dir=graph.run_dir,
        n=n,
        iterations=k,
        converged=converged,
        n_reached=int(n_reached),
        shard_rows=shard_rows,
    )
