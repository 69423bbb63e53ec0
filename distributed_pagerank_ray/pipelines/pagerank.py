"""Iterative PageRank as a Ray Data pipeline with checkpointed state.

Per iteration (the reference's Map → Collect → Reduce → Convergence
FSM, reference: pkg/node/master.go:21-55, collapsed into ONE lazy
Dataset plan consumed by a tiny driver-side barrier):

1. **Gather/Map** (reference workerMap, pkg/node/worker.go:95-103):
   stream the src-sorted edge table; each batch pulls only the 1-2
   rank/weight shards overlapping its src range from the object store,
   computes ``rank[src] * 1/out[src]`` vectorized, and pre-aggregates
   per destination *shard* into a partial vector — dense when the
   batch touches most of a shard, sparse (idx, val) otherwise.
2. **Combine** (reference masterCollect, pkg/node/master.go:106-140):
   ``groupby('shard')`` over the partial-vector rows. Because the
   gather stage already combined per (batch, shard), this shuffle
   moves O(batches x shards-touched) coarse blobs, NOT O(E) key rows —
   the two-stage aggregate the guide prescribes, taken to its limit.
   Hub destinations are just hot cells of a dense slice, so skew
   cannot concentrate rows on one reducer.
3. **Reduce/update** (reference workerReduce, pkg/node/worker.go:105-111):
   per shard: sum partials, ``new = c*(contrib + dangling_share) +
   (1-c)*e``, ``delta = |new - old|`` (old rank shard read from the
   object store), and the shard's checkpoint Parquet written in place
   (idempotent: fixed path per shard, tmp+rename) — per-partition
   lineage, exactly what resume needs.
4. **Checkpoint + convergence** (reference masterConvergence,
   pkg/node/master.go:142-189): the pipeline returns one row per
   shard (delta_sum, rank_sum); the driver's only barrier is summing
   S scalars. Stop when L1 residual <= threshold (master.go:158) or
   the 100-iteration cap (pkg/graph/pagerank.go:12).

Final normalization once at the end (pkg/node/master.go:160-167).
Dangling vertices contribute nothing unless
``semantics.dangling='redistribute'`` (reference leaks that mass,
pkg/graph/pagerank.go:14-19).

At 10^12 vertices the rank vector is sharded (8 TB total, a few MB per
shard); each gather task emits partials only for shards its batch
actually targets, and each reduce task touches exactly one shard.

Scale bound (tasks-mode BSP): with the default flat fan-in the driver
holds S × B object refs per iteration (S shards × B edge blocks) and
each reduce task takes B payload arguments. At the tested scales
(S ≤ 16, B ≤ 128) that is thousands of refs; beyond ~10^9 vertices
S × B reaches millions — set ``RunConfig.combine_fanin`` (> 0) to
switch to the TREE combine: per shard, gather payloads merge through
intermediate ``_combine_payloads`` tasks in groups of ``fanin`` until
≤ fanin refs feed the shard reducer, bounding every task's arity and
letting the driver drop gather refs level by level (same accumulate
math; util.tree_combine_refs, shared with CC/LPA). Keep S bounded by
raising ``shard_rows`` with n (shards are a few MB up to tens of MB;
the layout, not the algorithm, is the knob).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import PageRankConfig, RunConfig
from ..state import checkpoint as ckpt
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column, n_shards
from .graphbuild import GraphTables

_BLOB_SCHEMA = pa.schema(
    [("shard", pa.int64()), ("kind", pa.int8()), ("payload", pa.binary())]
)
KIND_DENSE, KIND_SPARSE, KIND_SEED = 0, 1, 2


def _empty_blob_table() -> pa.Table:
    return pa.table(
        {
            "shard": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int8()),
            "payload": pa.array([], pa.binary()),
        }
    )


def make_gather_fn(rank_vec: ShardedVector, weight_vec: ShardedVector, n: int, shard_rows: int):
    """Contribution stage: (src,dst) batch → per-shard partial vectors.

    Object refs are captured by closure; each task ray.gets only the
    rank/weight shards overlapping its batch's src range (zero-copy
    from the local object store; cross-node pulls on a real cluster).
    """

    def gather(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_blob_table()
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        lo, hi = int(src.min()), int(src.max())
        off_r, ranks = rank_vec.gather_range(lo, hi)
        off_w, w = weight_vec.gather_range(lo, hi)
        vals = ranks[src - off_r] * w[src - off_w]
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=vals, minlength=len(uniq))
        shard_of = uniq // shard_rows
        touched = np.unique(shard_of)
        shards: list[int] = []
        kinds: list[int] = []
        payloads: list[bytes] = []
        for s in touched:
            a, b = np.searchsorted(shard_of, [s, s + 1])
            local = uniq[a:b] - s * shard_rows
            v = sums[a:b]
            size = min(shard_rows, n - s * shard_rows)
            shards.append(int(s))
            if len(local) * 2 > size:
                dense = np.zeros(size)
                dense[local] = v
                kinds.append(KIND_DENSE)
                payloads.append(dense.tobytes())
            else:
                kinds.append(KIND_SPARSE)
                payloads.append(local.astype(np.int64).tobytes() + v.tobytes())
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "kind": pa.array(kinds, pa.int8()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return gather


def _seed_rows(S: int) -> "ray.data.Dataset":
    """One empty row per shard so every shard reaches the reduce stage
    (a shard no edge targets still needs its (1-c)*e update)."""
    return ray.data.range(S).map_batches(
        lambda t: pa.table(
            {
                "shard": t.column("id"),
                "kind": pa.array(np.full(len(t), KIND_SEED, dtype=np.int8)),
                "payload": pa.array([b""] * len(t), pa.binary()),
            }
        ),
        batch_format="pyarrow",
    )


def make_shard_update_fn(
    rank_vec: ShardedVector,
    e_vec: ShardedVector | None,
    e_scalar: float,
    c: float,
    dm_share: float,
    n: int,
    shard_rows: int,
    out_dir: str,
):
    """Reduce stage (map_groups over shard): combine partials, apply the
    rank update, write this shard's checkpoint file, return scalars."""

    def update(group: pa.Table) -> pa.Table:
        s = int(group.column("shard")[0].as_py())
        lo = s * shard_rows
        size = min(shard_rows, n - lo)
        acc = np.zeros(size)
        kinds = group.column("kind").to_numpy(zero_copy_only=False)
        payloads = group.column("payload").to_pylist()
        for kind, payload in zip(kinds, payloads):
            if kind == KIND_DENSE:
                acc += np.frombuffer(payload, dtype=np.float64)
            elif kind == KIND_SPARSE:
                k = len(payload) // 16
                local = np.frombuffer(payload[: k * 8], dtype=np.int64)
                acc[local] += np.frombuffer(payload[k * 8 :], dtype=np.float64)
        old = ray.get(rank_vec.refs[s])
        e = ray.get(e_vec.refs[s]) if e_vec is not None else e_scalar
        new = c * (acc + dm_share) + (1.0 - c) * e
        delta = np.abs(new - old)
        _write_rank_shard(s, lo, new, delta, out_dir)
        return pa.table(
            {
                "shard": pa.array([s]),
                "delta_sum": pa.array([float(delta.sum())]),
                "rank_sum": pa.array([float(new.sum())]),
            }
        )

    return update


@ray.remote
def _gather_block(
    block: pa.Table, rank_refs: list, weight_refs: list, n: int, shard_rows: int, S: int
):
    """Raw-task gather over one Arrow edge block → S per-shard partials.

    With ``num_returns=S`` Ray routes each shard's partial straight to
    that shard's reduce task — the shuffle is the object store's ref
    routing, with no AllToAll operator startup. Payloads are
    (kind, bytes) like the Dataset path; None for untouched shards
    (at 10^12 scale a src-range block targets a sparse set of shards).
    """
    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(src) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(src.min()), int(src.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    ranks = np.concatenate([ray.get(r) for r in rank_refs[s0 : s1 + 1]]) if s1 > s0 else ray.get(rank_refs[s0])
    w = np.concatenate([ray.get(r) for r in weight_refs[s0 : s1 + 1]]) if s1 > s0 else ray.get(weight_refs[s0])
    off = s0 * shard_rows
    vals = ranks[src - off] * w[src - off]
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=vals, minlength=len(uniq))
    shard_of = uniq // shard_rows
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        local = uniq[a:b] - s * shard_rows
        v = sums[a:b]
        size = min(shard_rows, n - s * shard_rows)
        if len(local) * 2 > size:
            dense = np.zeros(size)
            dense[local] = v
            out[int(s)] = (KIND_DENSE, dense.tobytes())
        else:
            out[int(s)] = (KIND_SPARSE, local.astype(np.int64).tobytes() + v.tobytes())
    return tuple(out) if S > 1 else out[0]


@ray.remote
def _combine_payloads(size: int, *payloads):
    """Intermediate tree-combine node (combine_fanin > 0): sum a group
    of (kind, bytes) rank partials into ONE payload — the same
    accumulate `_reduce_shard` runs, so the tree path differs from the
    flat path only in FP summation order. All-None groups stay None
    (a src-range block group that never targeted this shard)."""
    acc = None
    for payload in payloads:
        if payload is None:
            continue
        if acc is None:
            acc = np.zeros(size)
        kind, data = payload
        if kind == KIND_DENSE:
            acc += np.frombuffer(data, dtype=np.float64)
        else:
            k = len(data) // 16
            local = np.frombuffer(data[: k * 8], dtype=np.int64)
            acc[local] += np.frombuffer(data[k * 8 :], dtype=np.float64)
    if acc is None:
        return None
    nz = np.nonzero(acc)[0]
    if len(nz) * 2 > size:
        return (KIND_DENSE, acc.tobytes())
    return (KIND_SPARSE, nz.astype(np.int64).tobytes() + acc[nz].tobytes())


def _write_rank_shard(s: int, lo: int, new: np.ndarray, delta: np.ndarray, out_dir: str) -> None:
    """tmp+rename shard part write — URI-aware via the ckpt fs helpers
    (local paths take the plain-os atomic-rename fast path)."""
    shard_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
    ckpt.makedirs(shard_dir)
    t = pa.table(
        {
            "id": pa.array(np.arange(lo, lo + len(new), dtype=np.int64)),
            "rank": pa.array(new),
            "delta": pa.array(delta),
        }
    )
    tmpf = os.path.join(shard_dir, "part.parquet.tmp")
    fsys, inner = ckpt.fs_path(tmpf)
    pq.write_table(t, inner, filesystem=fsys)
    ckpt.replace(tmpf, os.path.join(shard_dir, "part.parquet"))  # idempotent on retry


@ray.remote(num_returns=3)
def _reduce_shard(
    s: int,
    old: np.ndarray,
    e,  # np.ndarray shard or float scalar
    c: float,
    dm_share: float,
    n: int,
    shard_rows: int,
    out_dir,  # str -> durable checkpoint written; None -> in-memory only
    *payloads,
):
    """Per-shard reduce: combine partials → update → (optionally) write
    the durable checkpoint shard.

    Returns (delta_sum, rank_sum, new_rank_array); the array return
    stays in the object store as next iteration's rank shard — no
    reload pass. ``out_dir=None`` skips the Parquet write (intermediate
    iterations under checkpoint_every > 1: at 10^12 vertices a full
    vector write per iteration is tens of TB — durability cadence is a
    knob)."""
    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    acc = np.zeros(size)
    for payload in payloads:
        if payload is None:
            continue
        kind, data = payload
        if kind == KIND_DENSE:
            acc += np.frombuffer(data, dtype=np.float64)
        else:
            k = len(data) // 16
            local = np.frombuffer(data[: k * 8], dtype=np.int64)
            acc[local] += np.frombuffer(data[k * 8 :], dtype=np.float64)
    new = c * (acc + dm_share) + (1.0 - c) * e
    delta = np.abs(new - old)
    if out_dir is not None:
        _write_rank_shard(s, lo, new, delta, out_dir)
    return float(delta.sum()), float(new.sum()), new


@ray.remote
def _flush_shard(s: int, shard_rows: int, arr: np.ndarray, out_dir: str) -> int:
    """Persist an in-memory rank shard (used when the loop ends on a
    non-durable iteration)."""
    _write_rank_shard(s, s * shard_rows, arr, np.zeros(len(arr)), out_dir)
    return len(arr)


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
    run_dir: str | None = None,
) -> PageRankResult:
    """``run_dir`` overrides the checkpoint/final target; it may be a
    ``scheme://`` URI (file:// exercised by tests) — all checkpoint I/O
    routes through the ckpt fs helpers (pyarrow.fs for URIs), so on a
    multi-node cluster checkpoints can land on shared object storage
    while the graph build output stays wherever it was built."""
    cfg = cfg or PageRankConfig()
    run_cfg = run_cfg or RunConfig()
    run_dir = run_dir or graph.run_dir
    n, shard_rows = graph.n, graph.shard_rows
    if n == 0:
        raise ValueError("empty graph")
    S = n_shards(n, shard_rows)

    e_vec = (
        ShardedVector.from_numpy(np.asarray(cfg.e_vector, dtype=np.float64), shard_rows)
        if cfg.e_vector is not None
        else None
    )
    e_scalar = 1.0 / n
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
    rank_vec = ShardedVector.from_parquet(
        os.path.join(ckpt.iter_dir(run_dir, k), "ranks"), n, shard_rows, "id", "rank"
    )
    # Materialize loop-invariant inputs ONCE: the edge table lives in the
    # object store across iterations (spilling to disk if oversized)
    # instead of being re-read and re-planned every iteration — the
    # Jacobi loop re-uses blocks the way the reference re-uses its
    # in-memory graph (master.go:153-157), but distributed. Skipped
    # entirely when resuming an already-converged run.
    use_tasks = run_cfg.combine_mode == "tasks"
    blocks = None
    seeds_mat = None
    if not converged and k < cfg.max_iters:
        edges_mat = ray.data.read_parquet(graph.edges_path, columns=["src", "dst"]).materialize()
        if use_tasks:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            target_blocks = max(S, min(4 * ncpu, max(1, graph.m // 65536)))
            blocks = edges_mat.repartition(target_blocks).materialize().to_arrow_refs()
        else:
            seeds_mat = _seed_rows(S).materialize()

    pending_residuals: list[float] = []
    while not converged and k < cfg.max_iters:
        t0 = time.time()
        dm = _dangling_mass(rank_vec, dang_vec) if dang_vec is not None else 0.0
        k += 1
        # durability cadence: intermediate iterations keep state only in
        # the object store; every checkpoint_every-th (and the groupby
        # path always) writes the durable Parquet + manifest
        durable = (not use_tasks) or (k % max(1, run_cfg.checkpoint_every) == 0)
        if durable:
            tmp = ckpt.begin_iter(run_dir, k)
            ranks_out = os.path.join(tmp, "ranks")
            ckpt.makedirs(ranks_out)
        else:
            ranks_out = None

        if use_tasks:
            gathers = [
                _gather_block.options(num_returns=S).remote(
                    b, rank_vec.refs, weight_vec.refs, n, shard_rows, S
                )
                for b in blocks
            ]
            cols = [gathers] if S == 1 else [list(col) for col in zip(*gathers)]
            if run_cfg.combine_fanin > 0:
                from ..util import tree_combine_refs

                cols = [
                    tree_combine_refs(
                        cols[s],
                        _combine_payloads,
                        run_cfg.combine_fanin,
                        min(shard_rows, n - s * shard_rows),
                    )
                    for s in range(S)
                ]
                del gathers  # release gather refs as combiner levels drain
            outs = [
                _reduce_shard.remote(
                    s,
                    rank_vec.refs[s],
                    e_vec.refs[s] if e_vec is not None else e_scalar,
                    cfg.c,
                    dm / n,
                    n,
                    shard_rows,
                    ranks_out,
                    *cols[s],
                )
                for s in range(S)
            ]
            deltas = ray.get([o[0] for o in outs])  # the per-iteration barrier
            residual = float(sum(deltas))
            new_refs = [o[2] for o in outs]
        else:
            gather = make_gather_fn(rank_vec, weight_vec, n, shard_rows)
            update = make_shard_update_fn(
                rank_vec, e_vec, e_scalar, cfg.c, dm / n, n, shard_rows, ranks_out
            )
            partials = edges_mat.map_batches(
                gather, batch_format="pyarrow", batch_size=run_cfg.batch_size
            )
            result_rows = (
                partials.union(seeds_mat)
                .groupby("shard")
                .map_groups(update, batch_format="pyarrow")
                .take_all()
            )  # S tiny rows — the per-iteration driver barrier
            residual = float(sum(r["delta_sum"] for r in result_rows))
            new_refs = None
        pending_residuals.append(residual)
        if durable:
            metrics = {
                "iteration": k,
                "residual": residual,
                "dangling_mass": dm,
                "wall_sec": time.time() - t0,
                "edges": graph.m,
                "shards": S,
                "combine_mode": run_cfg.combine_mode,
                "residuals_since_prev_ckpt": pending_residuals,
            }
            ckpt.commit_iter(run_dir, k, metrics, manifest)
            pending_residuals = []
        if new_refs is not None:
            # reduce tasks' array returns ARE the next rank shards
            rank_vec = ShardedVector(refs=new_refs, n=n, shard_rows=shard_rows)
        else:
            rank_vec = ShardedVector.from_parquet(
                os.path.join(ckpt.iter_dir(run_dir, k), "ranks"), n, shard_rows, "id", "rank"
            )
        history.append(residual)
        if residual <= cfg.threshold:  # `<=` matches master.go:158
            converged = True

    # flush: if the loop ended on a non-durable iteration, persist the
    # in-memory shards so the final stage (and any resume) has iter k
    if not ckpt.isdir(os.path.join(ckpt.iter_dir(run_dir, k), "ranks")):
        tmp = ckpt.begin_iter(run_dir, k)
        ranks_out = os.path.join(tmp, "ranks")
        ckpt.makedirs(ranks_out)
        ray.get(
            [
                _flush_shard.remote(s, shard_rows, rank_vec.refs[s], ranks_out)
                for s in range(S)
            ]
        )
        ckpt.commit_iter(
            run_dir,
            k,
            {
                "iteration": k,
                "residual": residual,
                "flushed": True,
                "residuals_since_prev_ckpt": pending_residuals,
            },
            manifest,
        )

    # ---- final normalization (master.go:160-167) -----------------------------
    last_ranks = os.path.join(ckpt.iter_dir(run_dir, k), "ranks")
    final_dir = os.path.join(run_dir, "final")
    ckpt.makedirs(final_dir)
    ds = ray.data.read_parquet(last_ranks, columns=["id", "rank"])
    total = float(ds.sum("rank")) if cfg.normalize else 1.0

    def _norm(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False) / total
        t = pa.table({"id": batch.column("id"), "rank": pa.array(r)})
        return add_shard_column(t, "id", shard_rows)

    ds = ray.data.read_parquet(last_ranks, columns=["id", "rank"]).map_batches(
        _norm, batch_format="pyarrow"
    )
    out = os.path.join(final_dir, "ranks")
    if ckpt.exists(out):
        ckpt.rmtree(out)
    ds.write_parquet(out, partition_cols=[SHARD_COL])
    ckpt.write_metrics_parquet(run_dir)
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
