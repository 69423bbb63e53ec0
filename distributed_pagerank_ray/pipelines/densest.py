"""Densest subgraph via the batched greedy peel (Charikar's greedy in
the Bahmani-Kumar-Vassilvitskii MapReduce formulation).

Per round over the CURRENT subgraph: compute density rho = |E|/|V|,
snapshot it, then remove EVERY vertex with degree <= 2*(1+eps)*rho in
one pass. The min degree never exceeds the average degree 2*rho, so
at least one vertex dies per round and (for eps > 0) the loop takes
O(log(V)/eps) rounds; the best snapshot is a 2*(1+eps)-approximation
of the maximum-density subgraph (exact on graphs whose peel order is
forced, which is what the gate plants). eps=0 still terminates —
every vertex at min degree <= avg dies — but without the log-round
bound; it is the gate/default mode because it is integer-exact.

Scale shape (kcore's skeleton, deliberately): degrees via the
per-shard count BSP (util.count_i64_keys — no row-level groupby);
removal via ``kcore.filter_out_endpoints`` (packed-broadcast NOT-IN
under ``broadcast_kill_limit``, two driver-free ``left_anti`` joins
above it — round 0 on a web graph kills O(V) vertices and must not
pass through the driver). The best snapshot's MEMBERS are recovered
from the removal log — vertex v belongs to snapshot r* iff it was
removed at round >= r* (every vertex is eventually removed) — so
nothing re-runs and no per-round vertex set is gathered.

All density comparisons are EXACT: the kill test is the int64
cross-multiplication deg*V*eps_den <= 2*E*(eps_den+eps_num) (raises
if V is large enough to overflow it), and best-snapshot selection
cross-multiplies Python ints on the driver (two scalars per round).

Reference parity: no such operator in lioia/distributed-pagerank
(PageRank only) — new-engine scope, SURVEY §2.5 graph family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import count_i64_keys
from .kcore import filter_out_endpoints

_I64 = pa.int64()

#: driver-observable stats of the last densest_subgraph() call
#: (rounds, best_round, best_e, best_v) — the no-silent-caps surface.
LAST_STATS: dict = {}


def _sym_degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    both = edges.map_batches(
        lambda t: pa.table({"v": t.column("a")}), batch_format="pyarrow"
    ).union(edges.map_batches(lambda t: pa.table({"v": t.column("b")}), batch_format="pyarrow"))
    return count_i64_keys(both, "v", count_col="deg")


def densest_subgraph(
    edges: "ray.data.Dataset",
    eps: tuple[int, int] = (0, 1),
    broadcast_kill_limit: int = 1 << 20,
    num_partitions: int = 8,
    max_rounds: int = 10_000,
) -> tuple["ray.data.Dataset", dict]:
    """Greedy-peel densest subgraph over distinct undirected pairs
    (a < b). Returns ``(members, stats)``: members has one ``v`` row
    per vertex of the best-density snapshot; stats carries the EXACT
    density as integers (``best_e``, ``best_v``) plus ``best_round``
    and ``rounds``. ``eps`` is a non-negative rational (num, den);
    (0, 1) peels at exactly the average degree. Raises on
    ``max_rounds`` (no silent truncation) and on graphs big enough to
    overflow the int64 kill test (V > ~3e9: pass eps > 0 and shrink V
    first, e.g. by a k-core prefilter)."""
    from ..util import compact_for_join, ensure_schema

    eps_num, eps_den = eps
    if eps_num < 0 or eps_den <= 0:
        raise ValueError(f"eps must be a non-negative rational, got {eps}")
    edges = edges.materialize()
    removal_logs: list[ray.data.Dataset] = []
    best_e = best_v = 0  # density 0/0 loses to everything
    best_round = -1
    prev_verts: "ray.data.Dataset | None" = None
    r = 0
    while True:
        if r >= max_rounds:
            raise RuntimeError(f"densest_subgraph: no fixpoint in {max_rounds} rounds")
        deg = _sym_degrees(edges).materialize()
        n_v = deg.count()
        # a vertex leaves snapshot r-1 either by being KILLED or by
        # becoming ISOLATED (every neighbor killed) — the kill set
        # alone under-logs, so removed_{r-1} = V_{r-1} \ V_r via a
        # driver-free left_anti (the member-recovery log; total log
        # size across rounds is exactly |V|)
        if prev_verts is not None:
            if n_v == 0:
                removed = prev_verts
            else:
                removed = compact_for_join(prev_verts, num_partitions).join(
                    compact_for_join(deg.select_columns(["v"]), num_partitions),
                    join_type="left_anti",
                    num_partitions=num_partitions,
                    on=("v",),
                ).map_batches(ensure_schema({"v": _I64}), batch_format="pyarrow")
            removal_logs.append(
                removed.map_batches(
                    lambda t, rr=r - 1: pa.table(
                        {
                            "v": t.column("v"),
                            "r": pa.array(np.full(len(t), rr, np.int64)),
                        }
                    )
                    if "v" in t.column_names
                    else pa.table({"v": pa.array([], _I64), "r": pa.array([], _I64)}),
                    batch_format="pyarrow",
                ).materialize()
            )
        if n_v == 0:
            break
        n_e = edges.count()
        # int64 kill-test overflow guard: deg <= n_v, so the product is
        # bounded by n_v^2 * eps_den and 2 * n_e * (eps_den + eps_num)
        if n_v * n_v * eps_den >= 1 << 62 or 2 * n_e * (eps_den + eps_num) >= 1 << 62:
            raise RuntimeError(
                "densest_subgraph: graph too large for the exact int64 kill "
                "test — prefilter (e.g. kcore) or raise eps and rescale"
            )
        # exact fraction compare: n_e/n_v > best_e/best_v  (Python
        # ints); best_v == 0 is the "no snapshot yet" sentinel — the
        # cross-multiplication alone would make 0/0 unbeatable
        if best_v == 0 or n_e * best_v > best_e * n_v:
            best_e, best_v, best_round = n_e, n_v, r
        thr_rhs = 2 * n_e * (eps_den + eps_num)

        def kill_batch(t: pa.Table, n_v=n_v, thr_rhs=thr_rhs) -> pa.Table:
            if "v" not in t.column_names:
                return pa.table({"v": pa.array([], _I64)})
            d = t.column("deg").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            return pa.table({"v": pa.array(v[d * (n_v * eps_den) <= thr_rhs])})

        kill_ds = deg.map_batches(kill_batch, batch_format="pyarrow").materialize()
        n_kill = kill_ds.count()
        # min degree <= average degree = 2E/V <= threshold, so the kill
        # set can only be empty when the degree table itself is empty
        assert n_kill > 0, "peel invariant violated: nonempty graph, empty kill set"
        edges = filter_out_endpoints(
            edges.select_columns(["a", "b"]),
            kill_ds,
            n_kill,
            broadcast_kill_limit,
            num_partitions,
        )
        prev_verts = deg.select_columns(["v"]).materialize()
        r += 1

    LAST_STATS.clear()
    LAST_STATS.update(
        {"rounds": r, "best_round": best_round, "best_e": best_e, "best_v": best_v}
    )
    if not removal_logs:
        return (
            ray.data.from_arrow(pa.table({"v": pa.array([], _I64)})),
            dict(LAST_STATS),
        )
    log = removal_logs[0]
    for lv in removal_logs[1:]:
        log = log.union(lv)
    members = log.map_batches(
        lambda t, br=best_round: pa.table(
            {"v": t.column("v").filter(pc.greater_equal(t.column("r"), br))}
        )
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    return members, dict(LAST_STATS)
