"""Community detection via synchronous label propagation (LPA).

Reference has no community detection (SURVEY §2.5); mandated by the
north rule. Deterministic variant: every vertex adopts the most
frequent label among its undirected neighbors; ties break to the
smallest label; a vertex with no neighbors keeps its own label.
Synchronous LPA can oscillate, so the loop caps at ``max_iters``
(default 20) in addition to the no-change fixpoint.

Execution per iteration (same per-shard BSP as PageRank/CC):
1. gather tasks over the symmetrized src-sorted edge blocks pull the
   label shards for their src range and pre-aggregate (dst, label)
   counts per destination shard (the combiner),
2. ``num_returns=S`` routes each shard's partials straight to that
   shard's reduce task — no AllToAll operator,
3. the reducer merges counts (packed-key np.unique) and picks each
   vertex's winner by (count desc, label asc) with one lexsort;
   vertices with no neighbors keep their own label; the shard's
   checkpoint is written in place and changed-counts return as
   scalars.

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
import pyarrow as pa

import ray
import ray.data

from ..config import RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from .components import symmetrize_edges
from .graphbuild import GraphTables


@ray.remote
def _lpa_gather_block(block, label_refs: list, n: int, shard_rows: int, S: int):
    """Per-block (dst, neighbor-label) counts, pre-aggregated and split
    per dst shard; payload = concat of (local_dst, label, count) int64
    arrays. Packed (dst,label) keys require n < 2**31 (module note)."""
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
    lbl = labels[src - s0 * shard_rows].astype(np.int64)
    pack = np.int64(n) + 1
    key = dst * pack + lbl
    uniq, counts = np.unique(key, return_counts=True)
    u_dst = uniq // pack
    u_lbl = uniq % pack
    shard_of = u_dst // shard_rows
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        local = (u_dst[a:b] - s * shard_rows).astype(np.int64)
        out[int(s)] = (
            local.tobytes() + u_lbl[a:b].astype(np.int64).tobytes() + counts[a:b].astype(np.int64).tobytes()
        )
    return tuple(out) if S > 1 else out[0]


@ray.remote
def _lpa_combine(pack: int, *payloads):
    """Intermediate tree-combine node (combine_fanin > 0): sum a group
    of (local, label, count) payloads per (local, label) key — integer
    count addition is associative, so the tree path is EXACTLY the
    flat path."""
    locs, labs, cnts = [], [], []
    for payload in payloads:
        if payload is None:
            continue
        k = len(payload) // 24
        locs.append(np.frombuffer(payload[: k * 8], dtype=np.int64))
        labs.append(np.frombuffer(payload[k * 8 : 2 * k * 8], dtype=np.int64))
        cnts.append(np.frombuffer(payload[2 * k * 8 :], dtype=np.int64))
    if not locs:
        return None
    key = np.concatenate(locs) * np.int64(pack) + np.concatenate(labs)
    cnt = np.concatenate(cnts)
    uniq, inv = np.unique(key, return_inverse=True)
    tot = np.bincount(inv, weights=cnt.astype(np.float64), minlength=len(uniq)).astype(np.int64)
    return (
        (uniq // pack).astype(np.int64).tobytes()
        + (uniq % pack).astype(np.int64).tobytes()
        + tot.tobytes()
    )


@ray.remote(num_returns=2)
def _lpa_reduce_shard(s: int, old: "np.ndarray", n: int, shard_rows: int, out_dir: str, *payloads):
    """Merge (local, label, count) partials; per vertex adopt the most
    frequent neighbor label (ties → smallest label); no neighbors →
    keep own label. Writes the shard checkpoint, returns
    (changed_count, new_label_array)."""
    import pyarrow.parquet as pq

    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    locals_list, lbls_list, cnts_list = [], [], []
    for payload in payloads:
        if payload is None:
            continue
        k = len(payload) // 24
        locals_list.append(np.frombuffer(payload[: k * 8], dtype=np.int64))
        lbls_list.append(np.frombuffer(payload[k * 8 : 2 * k * 8], dtype=np.int64))
        cnts_list.append(np.frombuffer(payload[2 * k * 8 :], dtype=np.int64))
    new = old.copy()
    if locals_list:
        loc = np.concatenate(locals_list)
        lab = np.concatenate(lbls_list)
        cnt = np.concatenate(cnts_list)
        pack = np.int64(n) + 1
        key = loc * pack + lab
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cnt.astype(np.float64), minlength=len(uniq)).astype(np.int64)
        u_loc = uniq // pack
        u_lab = uniq % pack
        # winner per local: sort by (local asc, count desc, label asc)
        order = np.lexsort((u_lab, -tot, u_loc))
        sl = u_loc[order]
        first = np.unique(sl, return_index=True)[1]
        win_loc = sl[first]
        win_lab = u_lab[order][first]
        new[win_loc] = win_lab.astype(np.float64)
    changed = new != old
    shard_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
    os.makedirs(shard_dir, exist_ok=True)
    t = pa.table(
        {
            "id": pa.array(np.arange(lo, lo + size, dtype=np.int64)),
            "label": pa.array(new),
            "changed": pa.array(changed.astype(np.float64)),
        }
    )
    tmp = os.path.join(shard_dir, "part.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(shard_dir, "part.parquet"))
    return int(changed.sum()), new


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

    # Same raw-task BSP shape as PageRank/CC (per-shard label-count
    # partials routed via num_returns); loop-invariants materialized once.
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
        tmp = ckpt.begin_iter(lpa_dir, k)
        labels_out = os.path.join(tmp, "labels")
        os.makedirs(labels_out, exist_ok=True)
        gathers = [
            _lpa_gather_block.options(num_returns=S).remote(b, label_vec.refs, n, shard_rows, S)
            for b in blocks
        ]
        cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
        if run_cfg.combine_fanin > 0:
            from ..util import tree_combine_refs

            cols = [
                tree_combine_refs(cols[s], _lpa_combine, run_cfg.combine_fanin, n + 1)
                for s in range(S)
            ]
            del gathers
        outs = [
            _lpa_reduce_shard.remote(s, label_vec.refs[s], n, shard_rows, labels_out, *cols[s])
            for s in range(S)
        ]
        changed = int(sum(ray.get([o[0] for o in outs])))
        label_vec = ShardedVector(refs=[o[1] for o in outs], n=n, shard_rows=shard_rows)
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
    ckpt.write_metrics_parquet(lpa_dir)
    return LPAResult(
        run_dir=graph.run_dir, n=n, iterations=k, converged=converged, shard_rows=shard_rows
    )
