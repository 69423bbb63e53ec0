"""Strongly connected components — FW-BW-MIN partition refinement,
with the forward and backward sweeps FUSED into one exchange stream.

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
   partition; B(v) = same BACKWARD — computed TOGETHER (see below);
3. v is settled iff F(v) == B(v): the min vertex m of v's SCC has
   F(m)=B(m)=m, and F(v)=B(v)=m implies m →* v and v →* m — so the
   settled set of one round is exactly the union of the SCCs of those
   roots; scc(v) = F(v);
4. unsettled vertices re-partition by the (F, B) pair (packed into
   one int64) and loop.

Fused F+B fixpoint (round-5 rework; VERDICT r4 #4 — the old shape ran
the forward fixpoint to completion, THEN the backward one, each
iteration costing a hash join + a BSP argmin + a compare join, i.e.
~6 synchronous exchanges per diameter step at a ~2-3 s fixed AllToAll
cost each):

- label state is keyed by k = 2·v + dir (dir 0 = forward, 1 =
  backward), so BOTH directions ride one table;
- the message edge table is doubled up front: edge (u, w) contributes
  (2u → 2w) for F and (2w+1 → 2u+1) for B;
- one iteration = ONE hash join (doubled edges ⋈ labels) + ONE BSP
  argmin (``util.min_i64_by_key`` over the packed key) — the two
  directions propagate CONCURRENTLY, so the iteration count is
  max(diam_F, diam_B), not their sum;
- convergence needs NO compare join: min-merge is monotone
  non-increasing per key, so the int64 SUM of all labels strictly
  decreases until fixpoint; comparing successive sums (one cheap
  aggregate over the already-materialized merge) detects fixpoint
  exactly. Wraparound-safe: a real change decreases the true sum by
  0 < d < 2^63, which can never be ≡ 0 (mod 2^64), so equality of the
  wrapped sums still implies "no change".
- the per-vertex (F, B) pair is then recovered WITHOUT a join: each
  label row contributes lab·2^31 (dir 0) or lab (dir 1) and one
  grouped-SUM BSP (``count_i64_keys(weight_col=...)``) packs
  enc(v) = F·2^31 + B — which doubles as the next round's partition
  id for unsettled vertices.

The partition refinement is what makes DAG chains converge in a few
rounds instead of O(n): after one round every (F, B) class on a chain
is a singleton, all edges cross classes, and round 2 settles
everything. Inner fixpoints are O(partition diameter) sync steps —
the documented cost of BSP SCC; rounds are O(log) on typical graphs.
An inner fixpoint that exhausts ``max_iters`` RAISES RuntimeError
(never silently returns non-fixpoint labels — a long crawl-trap cycle
would otherwise get wrong components with no error).

Vertex ids must fit [0, 2^31) (the packed keys); checked once up
front. ``LAST_STATS`` records rounds / inner iterations / inner joins
for the exchange-count regression test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..util import compact_for_join, count_i64_keys, ensure_schema, min_i64_by_key

_I64 = pa.int64()
_SHIFT = np.int64(1) << 31
_MASK = _SHIFT - 1

#: filled by strongly_connected_components for the exchange-count test:
#: {"rounds", "inner_iters", "inner_joins"} — the fused invariant is
#: inner_joins == inner_iters (ONE join per iteration for both sweeps).
LAST_STATS: dict = {}


def _project(ds, mapping: dict[str, str]):
    """Rename/select columns with empty-block tolerance."""
    out_cols = list(mapping.items())

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0 or out_cols[0][1] not in t.column_names:
            return pa.table({o: pa.array([], _I64) for o, _ in out_cols})
        return pa.table({o: t.column(i).cast(_I64) for o, i in out_cols})

    return ds.map_batches(fn, batch_format="pyarrow")


def _fused_fb_fixpoint(e2, labels, num_partitions, num_shards, max_iters, stats):
    """Min-label propagation to fixpoint over the DOUBLED edge table
    (src k → dst k, both directions packed): labels (k, lab) →
    fixpoint labels. One join + one BSP argmin per iteration; monotone
    label-sum convergence check (no compare join). Raises on
    ``max_iters`` exhaustion (ADVICE r4: never return a non-fixpoint)."""
    P, S = num_partitions, num_shards
    labels = labels.materialize()
    if e2.count() == 0:
        return labels  # no intra-partition edges: labels already final
    prev_sum = labels.sum("lab")
    for _ in range(max_iters):
        stats["inner_iters"] += 1
        stats["inner_joins"] += 1
        msg = compact_for_join(e2, P).join(
            compact_for_join(_project(labels, {"k2": "k", "lab2": "lab"}), P),
            join_type="inner",
            num_partitions=P,
            on=("srck",),
            right_on=("k2",),
        )
        cand = _project(msg, {"k": "dstk", "lab": "lab2"})
        merged = min_i64_by_key(
            labels.union(cand), "k", "lab", num_shards=S
        ).materialize()
        new_sum = merged.sum("lab")
        labels = merged
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"scc inner fixpoint did not converge within max_iters={max_iters} "
        "(partition diameter exceeds the cap; raise max_iters)"
    )


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
    global LAST_STATS
    stats = {"rounds": 0, "inner_iters": 0, "inner_joins": 0}
    LAST_STATS = stats
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
    ).materialize()
    vmax = verts.max("v")
    if vmax is not None and (vmax >= _SHIFT or verts.min("v") < 0):
        raise ValueError("scc needs vertex ids in [0, 2^31)")
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
        stats["rounds"] += 1
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
        _EMPTY_E2 = pa.table({"srck": pa.array([], _I64), "dstk": pa.array([], _I64)})
        if j.count() == 0:
            e2 = ray.data.from_arrow(_EMPTY_E2)
        else:
            j = compact_for_join(j, P).join(
                compact_for_join(_project(active, {"dv": "v", "dp": "part"}), P),
                join_type="inner",
                num_partitions=P,
                on=("dst",),
                right_on=("dv",),
            )

            def doubled(t: pa.Table) -> pa.Table:
                """Same-partition filter + the F/B edge doubling:
                (u, w) → (2u, 2w) forward and (2w+1, 2u+1) backward."""
                if len(t) == 0 or "src" not in t.column_names:
                    return _EMPTY_E2
                m = (
                    t.column("sp").to_numpy(zero_copy_only=False)
                    == t.column("dp").to_numpy(zero_copy_only=False)
                )
                u = t.column("src").to_numpy(zero_copy_only=False)[m]
                w = t.column("dst").to_numpy(zero_copy_only=False)[m]
                return pa.table(
                    {
                        "srck": pa.array(np.concatenate([2 * u, 2 * w + 1])),
                        "dstk": pa.array(np.concatenate([2 * w, 2 * u + 1])),
                    }
                )

            e2 = j.map_batches(doubled, batch_format="pyarrow").materialize()

        init = _project(active, {"v": "v"}).map_batches(
            lambda t: pa.table(
                {
                    "k": pa.array(
                        np.concatenate(
                            [
                                2 * t.column("v").to_numpy(zero_copy_only=False),
                                2 * t.column("v").to_numpy(zero_copy_only=False) + 1,
                            ]
                        )
                    ),
                    "lab": pa.array(
                        np.tile(t.column("v").to_numpy(zero_copy_only=False), 2)
                    ),
                }
            )
            if "v" in t.column_names and len(t)
            else pa.table({"k": pa.array([], _I64), "lab": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
        fixed = _fused_fb_fixpoint(e2, init, P, S, max_iters, stats)

        # pack (F, B) per vertex with ONE grouped-SUM BSP, no join:
        # even k contributes F·2^31, odd k contributes B.
        def contrib(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "k" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "w": pa.array([], _I64)})
            k = t.column("k").to_numpy(zero_copy_only=False)
            lab = t.column("lab").to_numpy(zero_copy_only=False)
            w = np.where(k % 2 == 0, lab * _SHIFT, lab)
            return pa.table({"v": pa.array(k // 2), "w": pa.array(w)})

        fb = count_i64_keys(
            fixed.map_batches(contrib, batch_format="pyarrow"),
            "v",
            num_shards=S,
            weight_col="w",
        ).materialize()

        def settled(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "v" not in t.column_names:
                return pa.table({"id": pa.array([], _I64), "scc": pa.array([], _I64)})
            enc = t.column("cnt").to_numpy(zero_copy_only=False)
            f, b = enc >> 31, enc & _MASK
            m = f == b
            return pa.table(
                {
                    "id": t.column("v").filter(pa.array(m)),
                    "scc": pa.array(f[m]),
                }
            )

        def unsettled(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64), "part": pa.array([], _I64)})
            enc = t.column("cnt").to_numpy(zero_copy_only=False)
            m = (enc >> 31) != (enc & _MASK)
            # enc IS the packed (F, B) pair — the next round's partition id
            return pa.table(
                {
                    "v": t.column("v").filter(pa.array(m)),
                    "part": pa.array(enc[m]),
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
