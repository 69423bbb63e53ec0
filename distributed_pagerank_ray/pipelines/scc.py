"""Strongly connected components — FW-BW-MIN partition refinement.

Engine extension beyond the reference's PageRank-only scope
(lioia/distributed-pagerank has no graph algorithms beyond PageRank;
SURVEY §2.5): SCC labels for a directed edge table, the canonical
directed-graph decomposition (link farms / crawl traps show up as
non-trivial SCCs in a web graph).

Algorithm (the standard BSP/Pregel SCC, "FW-BW-MIN with partition
refinement"): repeat until no active vertices —

1. restrict edges to pairs whose endpoints are BOTH active and share
   the current partition id (edges crossing partitions can never be
   intra-SCC, so each round's restriction shrinks the problem);
2. F(v) = min active vertex that reaches v FORWARD within the
   partition (min-label propagation to fixpoint);
3. B(v) = same BACKWARD (reversed edges);
4. v is settled iff F(v) == B(v): the min vertex m of v's SCC has
   F(m)=B(m)=m, and F(v)=B(v)=m implies m →* v and v →* m — so the
   settled set of one round is exactly the union of the SCCs of those
   roots; scc(v) = F(v);
5. unsettled vertices re-partition by the (F, B) pair (packed into
   one int64) and loop.

The partition refinement is what makes DAG chains converge in a few
rounds instead of O(n): after one round every (F, B) class on a chain
is a singleton, all edges cross classes, and round 2 settles
everything. Inner fixpoints are O(partition diameter) sync steps —
the documented cost of BSP SCC; rounds are O(log) on typical graphs.

Scale shape per inner iteration: ONE hash join (restricted edges ⋈
labels on src) + the per-shard BSP argmin (``util.min_i64_by_key``)
+ one compare join for the changed count — no per-vertex grouping
anywhere. The per-round restriction is two label joins (the
modularity shape). Vertex ids must fit [0, 2^31) (the packed (F, B)
partition key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema, min_i64_by_key

_I64 = pa.int64()
_SHIFT = np.int64(1) << 31


def _project(ds, mapping: dict[str, str]):
    """Rename/select columns with empty-block tolerance."""
    out_cols = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out_cols[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out_cols})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out_cols})

    return ds.map_batches(fn, batch_format="pyarrow")


def _min_prop_fixpoint(redges, labels, num_partitions, num_shards, max_iters):
    """Min-label propagation to fixpoint over a (src, dst) edge table:
    labels (v, lab) -> fixpoint labels. Every iteration: one hash join
    of edges to labels on src, BSP argmin per dst merged with the
    current labels, one compare join for the changed count."""
    P, S = num_partitions, num_shards
    labels = labels.materialize()
    if redges.count() == 0:
        return labels  # no intra-partition edges: labels already final
    for _ in range(max_iters):
        msg = compact_for_join(redges, P).join(
            compact_for_join(_project(labels, {"v2": "v", "lab2": "lab"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("v2",),
        )
        cand = _project(msg, {"v": "dst", "lab": "lab2"})
        merged = min_i64_by_key(
            labels.union(cand), "v", "lab", num_shards=S
        ).materialize()
        # changed count: one join back to the previous labels
        cmpj = compact_for_join(merged, P).join(
            compact_for_join(_project(labels, {"v3": "v", "old": "lab"}), P),
            join_type="inner",
            num_partitions=P,
            on=("v",),
            right_on=("v3",),
        )

        def ndiff(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "lab" not in t.column_names:
                return pa.table({"n": pa.array([], _I64)})
            a = t.column("lab").to_numpy(zero_copy_only=False)
            b = t.column("old").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int((a != b).sum())])})

        changed = cmpj.map_batches(ndiff, batch_format="pyarrow").sum("n")
        labels = merged
        if not changed:
            break
    return labels


def strongly_connected_components(
    edges: "ray.data.Dataset",
    num_partitions: int = 4,
    num_shards: int = 4,
    max_rounds: int = 50,
    max_iters: int = 200,
) -> "ray.data.Dataset":
    """(id, scc) for every vertex of the directed edge table; scc =
    min vertex id of the component. Self-loops ignored; isolated
    endpoints of dropped edges keep singleton components."""
    e = _project(edges, {"src": "src", "dst": "dst"}).map_batches(
        lambda t: t.filter(
            pa.array(
                t.column("src").to_numpy(zero_copy_only=False)
                != t.column("dst").to_numpy(zero_copy_only=False)
            )
        )
        if len(t)
        else t,
        batch_format="pyarrow",
    )
    verts = count_i64_keys(
        _project(e, {"v": "src"}).union(_project(e, {"v": "dst"})),
        "v",
        num_shards=num_shards,
    ).map_batches(
        lambda t: pa.table({"v": t.column("v")})
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    # state: (v, part); settled rows accumulate in `done` (v, scc)
    active = verts.map_batches(
        lambda t: pa.table({"v": t.column("v"), "part": pa.array(np.zeros(len(t), dtype=np.int64))})
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64), "part": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()
    e = e.materialize()
    done_parts: list = []
    P, S = num_partitions, num_shards

    for _ in range(max_rounds):
        if active.count() == 0:
            break
        # restrict edges to same-partition active endpoint pairs
        j = compact_for_join(e, P).join(
            compact_for_join(_project(active, {"sv": "v", "sp": "part"}), P),
            join_type="inner",
            num_partitions=P,
            on=("src",),
            right_on=("sv",),
        )
        # pin the schema between the two joins (the first join can emit
        # empty blocks with EMPTY schema) and short-circuit when a
        # round leaves no candidate edges at all — a fully-empty
        # Dataset cannot be made join-safe (one 0-row block minimum)
        j = _project(j, {"src": "src", "dst": "dst", "sp": "sp"}).materialize()
        _EMPTY_E = pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        if j.count() == 0:
            redges = ray.data.from_arrow(_EMPTY_E)
        else:
            j = compact_for_join(j, P).join(
                compact_for_join(_project(active, {"dv": "v", "dp": "part"}), P),
                join_type="inner",
                num_partitions=P,
                on=("dst",),
                right_on=("dv",),
            )

            def same_part(t: pa.Table) -> pa.Table:
                if len(t) == 0 or "src" not in t.column_names:
                    return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
                m = (
                    t.column("sp").to_numpy(zero_copy_only=False)
                    == t.column("dp").to_numpy(zero_copy_only=False)
                )
                return pa.table(
                    {"src": t.column("src").filter(pa.array(m)), "dst": t.column("dst").filter(pa.array(m))}
                )

            redges = j.map_batches(same_part, batch_format="pyarrow").materialize()
        rev = _project(redges, {"src": "dst", "dst": "src"}).materialize()

        init = _project(active, {"v": "v"}).map_batches(
            lambda t: pa.table({"v": t.column("v"), "lab": t.column("v")})
            if "v" in t.column_names
            else pa.table({"v": pa.array([], _I64), "lab": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        F = _min_prop_fixpoint(redges, init, P, S, max_iters)
        B = _min_prop_fixpoint(rev, init, P, S, max_iters)

        fb = compact_for_join(F, P).join(
            compact_for_join(_project(B, {"vb": "v", "blab": "lab"}), P),
            join_type="inner",
            num_partitions=P,
            on=("v",),
            right_on=("vb",),
        ).materialize()

        def settled(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "lab" not in t.column_names:
                return pa.table({"id": pa.array([], _I64), "scc": pa.array([], _I64)})
            f = t.column("lab").to_numpy(zero_copy_only=False)
            b = t.column("blab").to_numpy(zero_copy_only=False)
            m = f == b
            return pa.table(
                {
                    "id": t.column("v").filter(pa.array(m)),
                    "scc": pa.array(f[m]),
                }
            )

        def unsettled(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "lab" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "part": pa.array([], _I64)})
            f = t.column("lab").to_numpy(zero_copy_only=False)
            b = t.column("blab").to_numpy(zero_copy_only=False)
            m = f != b
            if f[m].size and (f[m].max() >= _SHIFT or b[m].max() >= _SHIFT):
                raise ValueError("scc needs vertex ids in [0, 2^31)")
            return pa.table(
                {
                    "v": t.column("v").filter(pa.array(m)),
                    "part": pa.array(f[m] * _SHIFT + b[m]),
                }
            )

        done_parts.append(fb.map_batches(settled, batch_format="pyarrow").materialize())
        active = fb.map_batches(unsettled, batch_format="pyarrow").materialize()

    if active.count() != 0:
        raise RuntimeError("scc did not converge within max_rounds")
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.union(p)
    return out.map_batches(ensure_schema({"id": _I64, "scc": _I64}), batch_format="pyarrow")
