"""Targeted-attack robustness: how much of the graph survives removing
its hubs (Albert/Jeong/Barabási 2000 — scale-free networks shatter
under degree-targeted attack long before random failure). The report a
web-graph health dashboard pairs with the power-law exponent: remove
every vertex with degree ≥ k, re-run connected components, compare
giant-component sizes.

Engine shape: undirected degrees via the count BSP; the hub set
broadcasts as ONE sorted int64 array (util.pack_sorted_keys — the
driver holds only the ref) and edges filter against it with two
searchsorted probes per batch; both the before- and after- graphs go
through the REAL build_graph → connected_components pipeline (minted
ids, per-iteration checkpoints) and component sizes fold through the
count BSP with a distributed max — the driver sees six scalars.

Reference scope: the reference computes PageRank only
(pkg/graph/pagerank.go); robustness analysis is part of the survey's
wider graph surface (§2.5).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import RunConfig
from ..util import count_i64_keys, ensure_schema, pack_sorted_keys
from .components import connected_components
from .graphbuild import build_graph

_I64 = pa.int64()


def _cc_summary(edges: "ray.data.Dataset", run_dir: str, run_cfg: RunConfig):
    """(n_vertices, n_components, giant_size) for one edge set via the
    real build+CC pipeline; component sizes stay distributed (count
    BSP on the final labels, distributed max over the counts)."""
    g = build_graph(
        edges,
        run_dir,
        src_col="src",
        dst_col="dst",
        mint=True,
        run_cfg=run_cfg,
    )
    cc = connected_components(g, run_cfg=run_cfg)
    sizes = count_i64_keys(
        cc.labels().map_batches(
            lambda t: pa.table({"label": t.column("label").cast(_I64)})
            if "label" in t.column_names
            else pa.table({"label": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "label",
        num_shards=max(2, run_cfg.num_partitions),
        count_col="sz",
    ).map_batches(
        ensure_schema({"label": _I64, "sz": _I64}), batch_format="pyarrow"
    )
    return g.n, sizes.count(), int(sizes.max("sz"))


def targeted_attack_report(
    edges: "ray.data.Dataset",
    deg_threshold: int,
    run_cfg: "RunConfig | None" = None,
    num_shards: int = 8,
    run_dir: "str | None" = None,
) -> "ray.data.Dataset":
    """One row: (deg_threshold, n_hubs_removed, n_before, n_after,
    comps_before, comps_after, giant_before, giant_after) where the
    attack removes every vertex of UNDIRECTED degree ≥ deg_threshold
    (and all incident edges); surviving vertices are those still
    touching an edge (the src∪dst vertex-set rule, the reference's own
    convention — graph.go:66-76)."""
    run_cfg = run_cfg or RunConfig()
    base = run_dir or tempfile.mkdtemp(prefix="dpr_attack_")

    e = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column("src").cast(_I64), "dst": t.column("dst").cast(_I64)}
        )
        if "src" in t.column_names
        else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
        batch_format="pyarrow",
    ).materialize()

    # undirected degrees over DISTINCT neighbors' lines (count both
    # directions of the raw stream — parallel edges count once per line,
    # the line-count posture; hubs are hubs either way)
    sym = e.union(
        e.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")})
            if "src" in t.column_names
            else pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)}),
            batch_format="pyarrow",
        )
    )
    deg = count_i64_keys(
        sym.map_batches(
            lambda t: pa.table({"v": t.column("src")})
            if "src" in t.column_names
            else pa.table({"v": pa.array([], _I64)}),
            batch_format="pyarrow",
        ),
        "v",
        num_shards=num_shards,
        count_col="deg",
    )
    hubs = deg.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("v").to_numpy(zero_copy_only=False)[
                    t.column("deg").to_numpy(zero_copy_only=False) >= deg_threshold
                ]
            }
        )
        if "v" in t.column_names
        else pa.table({"v": pa.array([], _I64)}),
        batch_format="pyarrow",
    )
    hub_ref = pack_sorted_keys(hubs, "v")
    n_hubs = hubs.count()

    def drop_hub_edges(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table({"src": pa.array([], _I64), "dst": pa.array([], _I64)})
        hk = ray.get(hub_ref)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = np.ones(len(s), bool)
        if len(hk):
            for col in (s, d):
                idx = np.searchsorted(hk, col)
                idx[idx >= len(hk)] = len(hk) - 1
                keep &= hk[idx] != col
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    survivors = e.map_batches(drop_hub_edges, batch_format="pyarrow").materialize()
    if survivors.count() == 0:
        raise ValueError(
            "attack removed every edge (deg_threshold too low for this graph)"
        )

    n_b, comps_b, giant_b = _cc_summary(e, f"{base}/before", run_cfg)
    n_a, comps_a, giant_a = _cc_summary(survivors, f"{base}/after", run_cfg)
    return ray.data.from_items(
        [
            {
                "deg_threshold": int(deg_threshold),
                "n_hubs_removed": int(n_hubs),
                "n_before": int(n_b),
                "n_after": int(n_a),
                "comps_before": int(comps_b),
                "comps_after": int(comps_a),
                "giant_before": int(giant_b),
                "giant_after": int(giant_a),
            }
        ]
    )
