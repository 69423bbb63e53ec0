"""Graph construction: url/id minting, edge table, degrees, vertices.

Replaces the reference's load-time preprocessing (reference:
pkg/graph/graph.go:51-99 — vertex map from src ∪ dst, in-link dedup,
line-counted out-degrees, rank/E init) with normalized Arrow tables:

    vertex_map(key, id)            key = url (or original int id)
    edges(src, dst)                int64 dense ids, sorted by src
    vertices(id, out_degree, e, dangling, shard)

All artifacts are written once under ``run_dir/graph/`` (Parquet,
shard-partitioned where a pipeline loads them as dense vectors) so an
interrupted build or a resumed PageRank run re-reads instead of
recomputing. Dense ids are minted by global sort + per-block offset
assignment — two passes over the *distinct* key set, never a
driver-side loop over rows.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from ..config import GraphSemantics, RunConfig
from ..state.shards import SHARD_COL, ShardedVector, add_shard_column
from ..util import compact_for_join


def _distinct(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    """Distinct values of one column, as a Dataset (shuffle; no driver rows)."""
    return ds.groupby(col).aggregate(Count(alias_name="_n")).select_columns([col])


def mint_dense_ids(
    ds: "ray.data.Dataset", col: str, key_out: str = "key"
) -> tuple["ray.data.Dataset", int]:
    """Distinct values of ``ds[col]`` → dense ids 0..n-1 by sorted rank.

    Returns (vertex_map Dataset with columns (key, id), n). Ids are
    deterministic (sorted order). Implementation: sort the distinct
    set, materialize, then (pass 1) emit each block's (first_key,
    count), compute prefix offsets on the driver — one tiny row per
    block — and (pass 2) assign ``offset + arange`` per block, keyed by
    the block's first value. Scales: only per-block metadata ever
    reaches the driver.
    """
    distinct = _distinct(ds, col).sort(col).materialize()

    def _block_meta(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first": pa.array([], ds.schema().field(col).type), "cnt": pa.array([], pa.int64())})
        return pa.table({"first": t.column(col).slice(0, 1), "cnt": pa.array([len(t)], pa.int64())})

    meta = distinct.map_batches(_block_meta, batch_size=None, batch_format="pyarrow").take_all()
    meta = [m for m in meta if m["cnt"] > 0]
    key = lambda v: v.encode() if isinstance(v, str) else v  # match Arrow utf8 binary sort order
    meta.sort(key=lambda m: key(m["first"]))
    offsets: dict = {}
    acc = 0
    for m in meta:
        offsets[m["first"]] = acc
        acc += m["cnt"]
    n = acc

    def _assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({key_out: t.column(col), "id": pa.array([], pa.int64())})
        off = offsets[t.column(col)[0].as_py()]
        return pa.table(
            {key_out: t.column(col), "id": pa.array(off + np.arange(len(t), dtype=np.int64))}
        )

    vmap = distinct.map_batches(_assign, batch_size=None, batch_format="pyarrow")
    return vmap, n


def _join_ids(
    ds: "ray.data.Dataset",
    key_col: str,
    vmap: "ray.data.Dataset",
    out_col: str,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Hash-join ``ds[key_col]`` against vertex_map; replace with int id."""
    joined = compact_for_join(ds, num_partitions).join(
        compact_for_join(vmap, num_partitions),
        join_type="inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=("key",),
    )
    cols = [c for c in joined.columns() if c not in (key_col, "key", "id")]

    def _fix(t: pa.Table) -> pa.Table:
        arrays = [t.column(c) for c in cols] + [t.column("id")]
        return pa.table(dict(zip(cols + [out_col], arrays)))

    return joined.map_batches(_fix, batch_format="pyarrow")


@dataclass
class GraphTables:
    """Handle to the on-disk graph artifacts under ``run_dir/graph``."""

    run_dir: str
    n: int  # vertices
    m: int  # distinct edges
    m_lines: int  # raw edge lines (incl. duplicates)
    shard_rows: int
    semantics: GraphSemantics

    @property
    def graph_dir(self) -> str:
        return os.path.join(self.run_dir, "graph")

    @property
    def edges_path(self) -> str:
        return os.path.join(self.graph_dir, "edges")

    @property
    def vertices_path(self) -> str:
        return os.path.join(self.graph_dir, "vertices")

    @property
    def vertex_map_path(self) -> str:
        return os.path.join(self.graph_dir, "vertex_map")

    def edges(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.edges_path, columns=["src", "dst"])

    def vertices(self, columns=None) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.vertices_path, columns=columns)

    def vertex_map(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(self.vertex_map_path)

    def weight_shards(self) -> ShardedVector:
        """1/out_degree per vertex (0 for dangling) as a sharded vector."""
        return ShardedVector.from_parquet(
            self.vertices_path, self.n, self.shard_rows, "id", "inv_out", fill=0.0
        )

    def dangling_shards(self) -> ShardedVector:
        return ShardedVector.from_parquet(
            self.vertices_path, self.n, self.shard_rows, "id", "dangling", fill=1.0
        )

    def fingerprint(self) -> str:
        # shard_rows is part of the identity: checkpoints are laid out
        # per shard, so the same graph at a different shard_rows must
        # not resume from the old run's iteration dirs
        payload = json.dumps(
            {
                "n": self.n,
                "m": self.m,
                "m_lines": self.m_lines,
                "outdegree_mode": self.semantics.outdegree_mode,
                "dedup": self.semantics.dedup_in_links,
                "shard_rows": self.shard_rows,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _done_payload(n: int, m: int, m_lines: int, shard_rows: int, semantics: GraphSemantics) -> dict:
    return {
        "n": n,
        "m": m,
        "m_lines": m_lines,
        "shard_rows": shard_rows,
        "outdegree_mode": semantics.outdegree_mode,
        "dedup_in_links": semantics.dedup_in_links,
    }


def _tables_from_done(run_dir: str, meta: dict, fallback_shard_rows: int, fallback_sem: GraphSemantics) -> GraphTables:
    """Cached-build return path: the on-disk artifacts were laid out with
    the ORIGINAL shard_rows/semantics, so those come from _DONE.json —
    NOT from the current call's RunConfig (a rerun with different
    shard_rows would otherwise read wrong id ranges out of the shard
    partitions). Falls back to the caller's values only for _DONE files
    written before these fields existed."""
    sem = GraphSemantics(
        outdegree_mode=meta.get("outdegree_mode", fallback_sem.outdegree_mode),
        dangling=fallback_sem.dangling,
        dedup_in_links=meta.get("dedup_in_links", fallback_sem.dedup_in_links),
    )
    return GraphTables(
        run_dir,
        meta["n"],
        meta["m"],
        meta["m_lines"],
        int(meta.get("shard_rows", fallback_shard_rows)),
        sem,
    )


@ray.remote
def _degree_partials(block: pa.Table, shard_rows: int, n: int):
    """Per-block out-degree counts, pre-aggregated per id shard
    (sparse (local_idx, count) pairs — the groupby combiner, as tasks).

    Join/distinct lineages can emit 0-row EMPTY-SCHEMA blocks (Ray
    2.49 quirk — see util.ensure_schema notes): tolerate them."""
    if len(block) == 0 or "src" not in block.column_names:
        return {}
    src = block.column("src").to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(src, return_counts=True)
    shard_of = uniq // shard_rows
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        out[int(s)] = (uniq[a:b] - s * shard_rows, counts[a:b])
    return out


@ray.remote
def _write_vertex_shard(
    s: int, shard_rows: int, n: int, e_default: float, out_dir: str, *partials
) -> int:
    lo = s * shard_rows
    size = min(shard_rows, n - lo)
    deg = np.zeros(size, dtype=np.int64)
    for p in partials:
        if s in p:
            local, counts = p[s]
            deg[local] += counts
    inv = np.zeros(size)
    nz = deg > 0
    inv[nz] = 1.0 / deg[nz]
    t = pa.table(
        {
            "id": pa.array(np.arange(lo, lo + size, dtype=np.int64)),
            "out_degree": pa.array(deg),
            "inv_out": pa.array(inv),
            "dangling": pa.array((~nz).astype(np.float64)),
            "e": pa.array(np.full(size, e_default)),
        }
    )
    shard_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, "part.parquet.tmp")
    import pyarrow.parquet as pq

    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(shard_dir, "part.parquet"))
    return size


def build_graph_dense(
    edges_raw: "ray.data.Dataset",
    n: int,
    run_dir: str,
    semantics: GraphSemantics | None = None,
    run_cfg: RunConfig | None = None,
    presorted: bool = True,
) -> GraphTables:
    """Fast-path build for edge tables whose ids are ALREADY dense
    0..n-1 (the synthetic bench generator): skips minting and the
    url→id joins. With ``presorted=True`` (generator output is written
    in src order) the global sort is skipped too, and out-degrees are
    computed with per-shard task combiners instead of a row-level
    groupby — the same two-stage-aggregate shape the PageRank gather
    uses, so the build streams E rows with no AllToAll.

    Dedup semantics: this path keeps duplicate edges
    (``dedup_in_links`` is ignored; line-count degrees). The minted
    ``build_graph`` path is the semantics-complete one; conformance
    fixtures run through it.
    """
    semantics = semantics or GraphSemantics()
    run_cfg = run_cfg or RunConfig()
    graph_dir = os.path.join(run_dir, "graph")
    done = os.path.join(graph_dir, "_DONE.json")
    if os.path.exists(done):
        with open(done) as fh:
            meta = json.load(fh)
        return _tables_from_done(run_dir, meta, run_cfg.shard_rows, semantics)
    os.makedirs(graph_dir, exist_ok=True)
    edges_mat = edges_raw.materialize() if presorted else edges_raw.sort("src").materialize()
    m = m_lines = edges_mat.count()
    edges_mat.write_parquet(os.path.join(graph_dir, "edges"))

    shard_rows = run_cfg.shard_rows
    S = max(1, -(-n // shard_rows))
    e_default = 1.0 / n if n else 0.0
    vdir = os.path.join(graph_dir, "vertices")
    os.makedirs(vdir, exist_ok=True)
    blocks = edges_mat.to_arrow_refs()
    partial_refs = [_degree_partials.remote(b, shard_rows, n) for b in blocks]
    ray.get(
        [
            _write_vertex_shard.remote(s, shard_rows, n, e_default, vdir, *partial_refs)
            for s in range(S)
        ]
    )
    # identity vertex map (join-backs are no-ops for dense graphs)
    ray.data.range(n).map_batches(
        lambda t: pa.table({"key": t.column("id"), "id": t.column("id")}),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(graph_dir, "vertex_map"))
    with open(done, "w") as fh:
        json.dump(_done_payload(n, m, m_lines, shard_rows, semantics), fh)
    return GraphTables(run_dir, n, m, m_lines, shard_rows, semantics)


def build_graph(
    links: "ray.data.Dataset",
    run_dir: str,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    semantics: GraphSemantics | None = None,
    run_cfg: RunConfig | None = None,
    mint: bool = True,
) -> GraphTables:
    """links(src_col, dst_col) → GraphTables written under run_dir/graph.

    ``mint=True`` treats keys as opaque (urls) and mints dense ids;
    ``mint=False`` requires int keys that are already dense 0..n-1
    (golden fixture graphs).

    Matches reference load semantics (SURVEY §1.3): vertex set =
    src ∪ dst (graph.go:66-76); out-degree per ``semantics``;
    duplicate edges collapse when ``dedup_in_links`` (graph.go:77-78).
    """
    semantics = semantics or GraphSemantics()
    run_cfg = run_cfg or RunConfig()
    graph_dir = os.path.join(run_dir, "graph")
    done = os.path.join(graph_dir, "_DONE.json")
    if os.path.exists(done):
        with open(done) as fh:
            meta = json.load(fh)
        return _tables_from_done(run_dir, meta, run_cfg.shard_rows, semantics)
    os.makedirs(graph_dir, exist_ok=True)
    P = run_cfg.num_partitions

    # Materialize the NARROW link projection once: the table is consumed
    # by several downstream branches (src∪dst key union, id joins), and
    # replaying an upstream extractor actor pool per branch both wastes
    # work and can deadlock a small cluster (two fixed-size actor pools
    # from the same lineage can reserve every CPU).
    links = links.select_columns([src_col, dst_col]).materialize()

    # vertex set = src ∪ dst  (reference graph.go:66-76)
    def _as_key(colname):
        return lambda t: pa.table({"key": t.column(colname)})

    keys = links.map_batches(_as_key(src_col), batch_format="pyarrow").union(
        links.map_batches(_as_key(dst_col), batch_format="pyarrow")
    )
    if mint:
        vmap, n = mint_dense_ids(keys, "key")
        vmap = vmap.materialize()
        vmap.write_parquet(os.path.join(graph_dir, "vertex_map"))
        edges_raw = _join_ids(links, src_col, vmap, "src", P)
        edges_raw = _join_ids(edges_raw, dst_col, vmap, "dst", P)
    else:
        def _cast(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            )

        edges_raw = links.map_batches(_cast, batch_format="pyarrow")
        vmap, n = mint_dense_ids(keys, "key")
        vmap.write_parquet(os.path.join(graph_dir, "vertex_map"))
    edges_raw = edges_raw.materialize()
    m_lines = edges_raw.count()

    # distinct edges (in-link dedup, graph.go:77) — per-shard BSP combine
    # when ids fit the packed key (post-mint ids are dense < n), else the
    # hash-groupby fallback (Ray's 2-col AllToAll aggregate is slow here)
    from ray.exceptions import RayTaskError

    from ..util import distinct_i64_pairs

    if semantics.dedup_in_links or semantics.outdegree_mode != "line_count":
        try:
            edges_distinct = distinct_i64_pairs(edges_raw, "src", "dst").materialize()
        except (RayTaskError, ValueError):
            edges_distinct = (
                edges_raw.groupby(["src", "dst"]).aggregate(Count(alias_name="_n")).select_columns(["src", "dst"])
            )
    else:
        # neither the edge set nor the degrees need the distinct pass —
        # don't pay a full gather+reduce whose output would be discarded
        edges_distinct = edges_raw

    edges_final = (edges_distinct if semantics.dedup_in_links else edges_raw).sort("src")
    edges_final = edges_final.materialize()
    m = edges_final.count()
    edges_final.write_parquet(os.path.join(graph_dir, "edges"))

    # vertices: dense ids after minting ⇒ same per-shard task combine as
    # the dense fast path (out-degree partials per block routed to one
    # writer task per shard) — no union-aggregate shuffle, and the shard
    # partition dirs are written directly
    shard_rows = run_cfg.shard_rows
    e_default = 1.0 / n if n else 0.0
    deg_input = edges_raw if semantics.outdegree_mode == "line_count" else edges_distinct
    S = max(1, -(-n // shard_rows)) if n else 1
    vdir = os.path.join(graph_dir, "vertices")
    os.makedirs(vdir, exist_ok=True)
    blocks = deg_input.materialize().to_arrow_refs()
    partial_refs = [_degree_partials.remote(b, shard_rows, n) for b in blocks]
    ray.get(
        [
            _write_vertex_shard.remote(s, shard_rows, n, e_default, vdir, *partial_refs)
            for s in range(S)
        ]
    )

    with open(done, "w") as fh:
        json.dump(_done_payload(n, m, m_lines, shard_rows, semantics), fh)
    return GraphTables(run_dir, n, m, m_lines, shard_rows, semantics)


# ------------------------------------------------------------------ update

@ray.remote
def _partial_shards(p: dict) -> list:
    return sorted(p.keys())


@ray.remote
def _update_vertex_shard(
    s: int,
    shard_rows: int,
    new_n: int,
    old_part: str | None,
    out_dir: str,
    *partials,
) -> int:
    """Rewrite ONE vertex shard for an incremental update: old degrees
    (if the shard existed) + new-edge deltas + newly-minted ids, with
    inv_out/dangling recomputed and e refreshed to 1/new_n."""
    import pyarrow.parquet as pq

    lo = s * shard_rows
    size = min(shard_rows, new_n - lo)
    deg = np.zeros(size, dtype=np.int64)
    if old_part is not None and os.path.exists(old_part):
        old = pq.read_table(old_part, columns=["out_degree"])
        od = old.column("out_degree").to_numpy(zero_copy_only=False)
        deg[: len(od)] = od
    for p in partials:
        if s in p:
            local, counts = p[s]
            deg[local] += counts
    inv = np.zeros(size)
    nz = deg > 0
    inv[nz] = 1.0 / deg[nz]
    t = pa.table(
        {
            "id": pa.array(np.arange(lo, lo + size, dtype=np.int64)),
            "out_degree": pa.array(deg),
            "inv_out": pa.array(inv),
            "dangling": pa.array((~nz).astype(np.float64)),
            "e": pa.array(np.full(size, 1.0 / new_n)),
        }
    )
    shard_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
    os.makedirs(shard_dir, exist_ok=True)
    tmp = os.path.join(shard_dir, f"part.parquet.tmp{os.getpid()}")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(shard_dir, "part.parquet"))
    return size


def _link_files(src_dir: str, dst_dir: str, prefix: str) -> None:
    """Hardlink every file of src_dir into dst_dir under a prefixed
    name (no copy — an update shares untouched bytes with its base).
    Idempotent: existing links are kept."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        p = os.path.join(src_dir, name)
        if not os.path.isfile(p):
            continue
        try:
            os.link(p, os.path.join(dst_dir, prefix + name))
        except FileExistsError:
            pass


def update_graph(
    old_run_dir: str,
    new_links: "ray.data.Dataset",
    out_run_dir: str,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    run_cfg: RunConfig | None = None,
    check_duplicates: bool = True,
) -> GraphTables:
    """Incremental graph update: merge a NEW batch of links (a fresh
    crawl increment) into an already-built graph WITHOUT rebuilding it.

    Produces a new graph version under ``out_run_dir`` whose tables are
    semantically identical to a full ``build_graph`` over the
    concatenated input (same per-URL degrees/dangling flags/edge set —
    id ASSIGNMENT differs: new URLs get ids old_n.., while a rebuild
    re-sorts; per-URL results of downstream algorithms match, asserted
    in tests/test_update_graph.py). The old version is untouched and
    stays queryable — updates are versions, not mutations.

    Cost profile (the point of the operator, vs O(total) rebuild):
    - mint only the NEW keys (anti-join against the old vertex_map),
    - dedup-check only the NEW edges (one anti-join vs old edges;
      skippable via ``check_duplicates=False`` when the crawler
      guarantees disjoint increments — then the update never reads the
      old edge table at all),
    - rewrite only vertex shards TOUCHED by new sources or new ids;
      untouched shards and all old edge/vertex_map files are
      hardlinked, sharing bytes with the base version.

    Note: the stored ``e`` column of untouched shards keeps its
    build-time 1/n_old — documented advisory; the uniform-E PageRank
    path derives 1/n from ``_DONE.json`` at query time, and custom-E
    runs pass ``e_vector`` explicitly.
    """
    run_cfg = run_cfg or RunConfig()
    P = run_cfg.num_partitions

    old_done = os.path.join(old_run_dir, "graph", "_DONE.json")
    with open(old_done) as fh:
        old_meta = json.load(fh)
    old = _tables_from_done(old_run_dir, old_meta, run_cfg.shard_rows, GraphSemantics())
    semantics, shard_rows = old.semantics, old.shard_rows

    old_vmap_path = os.path.join(old_run_dir, "graph", "vertex_map")
    if not os.path.isdir(old_vmap_path):
        raise ValueError(
            "update_graph needs a minted base graph (vertex_map missing — "
            "dense fast-path builds have no url→id map to extend)"
        )

    graph_dir = os.path.join(out_run_dir, "graph")
    done = os.path.join(graph_dir, "_DONE.json")
    if os.path.exists(done):
        with open(done) as fh:
            meta = json.load(fh)
        return _tables_from_done(out_run_dir, meta, shard_rows, semantics)
    if os.path.isdir(graph_dir):
        # a crashed half-run left partial files; a rerun re-derives
        # everything, and appending would DOUBLE vertex_map/edge rows —
        # restart from a clean version dir (the _DONE guard above keeps
        # completed versions immutable)
        import shutil

        shutil.rmtree(graph_dir)
    os.makedirs(graph_dir, exist_ok=True)

    links = new_links.select_columns([src_col, dst_col]).materialize()

    def _as_key(colname):
        return lambda t: pa.table({"key": t.column(colname)})

    keys = links.map_batches(_as_key(src_col), batch_format="pyarrow").union(
        links.map_batches(_as_key(dst_col), batch_format="pyarrow")
    )
    old_keys = ray.data.read_parquet(old_vmap_path).map_batches(
        lambda t: pa.table({"key2": t.column("key")}), batch_format="pyarrow"
    )
    fresh_keys = compact_for_join(_distinct(keys, "key"), P).join(
        compact_for_join(old_keys, P),
        join_type="left_anti",
        num_partitions=P,
        on=("key",),
        right_on=("key2",),
    )
    vmap_new, k_new = mint_dense_ids(fresh_keys, "key")
    old_n = old.n
    new_n = old_n + k_new
    # schema-preserving offset (key may be string OR int64 — minted
    # int-key graphs update too; empty blocks keep their typed schema)
    vmap_new = vmap_new.map_batches(
        lambda t: pa.table(
            {
                "key": t.column("key"),
                "id": pa.array(
                    t.column("id").to_numpy(zero_copy_only=False) + old_n
                ),
            }
        )
        if "key" in t.column_names and len(t)
        else t,
        batch_format="pyarrow",
    )
    vmap_dir = os.path.join(graph_dir, "vertex_map")
    if k_new:
        vmap_new.write_parquet(vmap_dir)
    _link_files(old_vmap_path, vmap_dir, "base_")
    vmap_all = ray.data.read_parquet(vmap_dir)

    new_raw = _join_ids(links, src_col, vmap_all, "src", P)
    new_raw = _join_ids(new_raw, dst_col, vmap_all, "dst", P).materialize()
    m_lines_new = new_raw.count()

    from ray.exceptions import RayTaskError

    from ..util import distinct_i64_pairs, ensure_schema

    if semantics.dedup_in_links or semantics.outdegree_mode != "line_count":
        try:
            new_distinct = distinct_i64_pairs(new_raw, "src", "dst").materialize()
        except (RayTaskError, ValueError):
            new_distinct = (
                new_raw.groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])
                .map_batches(
                    ensure_schema({"src": pa.int64(), "dst": pa.int64()}),
                    batch_format="pyarrow",
                )
                .materialize()
            )
    else:
        new_distinct = new_raw

    if semantics.dedup_in_links and check_duplicates:
        old_edges = ray.data.read_parquet(old.edges_path, columns=["src", "dst"]).map_batches(
            lambda t: pa.table({"src2": t.column("src"), "dst2": t.column("dst")}),
            batch_format="pyarrow",
        )
        truly_new = compact_for_join(new_distinct, P).join(
            compact_for_join(old_edges, P),
            join_type="left_anti",
            num_partitions=P,
            on=("src", "dst"),
            right_on=("src2", "dst2"),
        )
    else:
        truly_new = new_distinct if semantics.dedup_in_links else new_raw
    truly_new = truly_new.sort("src").materialize()
    m_delta = truly_new.count()

    edges_dir = os.path.join(graph_dir, "edges")
    if m_delta:
        truly_new.write_parquet(edges_dir)
    _link_files(old.edges_path, edges_dir, "base_")

    # vertex shards: rewrite the delta-touched + id-extended set only
    deg_input = new_raw if semantics.outdegree_mode == "line_count" else truly_new
    blocks = deg_input.to_arrow_refs()
    partial_refs = [_degree_partials.remote(b, shard_rows, new_n) for b in blocks]
    touched = set()
    for ks in ray.get([_partial_shards.remote(p) for p in partial_refs]):
        touched.update(ks)
    S_new = max(1, -(-new_n // shard_rows))
    touched.update(range(old_n // shard_rows, S_new))  # shards gaining new ids
    old_vdir = os.path.join(old_run_dir, "graph", "vertices")
    vdir = os.path.join(graph_dir, "vertices")
    os.makedirs(vdir, exist_ok=True)
    ray.get(
        [
            _update_vertex_shard.remote(
                s,
                shard_rows,
                new_n,
                os.path.join(old_vdir, f"{SHARD_COL}={s}", "part.parquet"),
                vdir,
                *partial_refs,
            )
            for s in sorted(touched)
        ]
    )
    for s in range(S_new):
        if s in touched:
            continue
        _link_files(os.path.join(old_vdir, f"{SHARD_COL}={s}"), os.path.join(vdir, f"{SHARD_COL}={s}"), "")

    with open(done, "w") as fh:
        json.dump(
            _done_payload(new_n, old.m + m_delta, old.m_lines + m_lines_new, shard_rows, semantics),
            fh,
        )
    return GraphTables(out_run_dir, new_n, old.m + m_delta, old.m_lines + m_lines_new, shard_rows, semantics)


def host_graph(
    links: "ray.data.Dataset",
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_intra: bool = True,
    num_shards: int = 16,
) -> "ray.data.Dataset":
    """Collapse the page-level link stream to the HOST-level graph —
    the classic Common-Crawl reduction (the host/domain webgraph is
    what most link-spam / centrality studies actually rank; ~1000×
    smaller than the page graph): output one row per (src_host,
    dst_host) with ``weight`` = number of page-level link lines.

    Hosts come from the same vectorized RE2 extraction as URL
    normalization (`functions.urls.host_array`: lowercased,
    default-port-stripped); rows where either side is relative /
    schemeless (host ``''``) are dropped, and ``drop_intra`` (default)
    drops same-host (intra-site) edges, which dominate raw crawls but
    carry no ranking signal.

    Scale shape: per-BATCH pre-aggregation (vectorized pair hash via
    `dedup.hash_str_array` on ``src\\x01dst`` + np.unique → O(distinct
    pairs per batch) partial rows) then ONE string-carrying weighted
    BSP (`util.sum_i64_keys_with_payload` — payloads are functionally
    determined by the pair hash, so reducers keep any representative).
    The exchange carries collapsed partials, never raw links. 64-bit
    siphash collisions would merge two host pairs (prob ≈ pairs²/2^64 —
    negligible; documented, not silent)."""
    import pyarrow.compute as pc

    from ..functions.dedup import hash_str_array
    from ..functions.urls import host_array
    from ..util import sum_i64_keys_with_payload

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "pc_": pa.array([], pa.int64()),
                "src_host": pa.array([], pa.string()),
                "dst_host": pa.array([], pa.string()),
            }
        )
        if src_col not in t.column_names or len(t) == 0:
            return empty
        sh = host_array(t.column(src_col))
        dh = host_array(t.column(dst_col))
        mask = pc.and_(pc.not_equal(sh, ""), pc.not_equal(dh, ""))
        if drop_intra:
            mask = pc.and_(mask, pc.not_equal(sh, dh))
        sh, dh = sh.filter(mask), dh.filter(mask)
        if len(sh) == 0:
            return empty
        pair = pc.binary_join_element_wise(sh, dh, "\x01")
        h = hash_str_array(pair.to_numpy(zero_copy_only=False).astype(object)).view(np.int64)
        u, idx, inv = np.unique(h, return_index=True, return_inverse=True)
        c = np.bincount(inv, minlength=len(u)).astype(np.int64)
        take = pa.array(idx)
        return pa.table(
            {
                "h": pa.array(u),
                "pc_": pa.array(c),
                "src_host": sh.take(take),
                "dst_host": dh.take(take),
            }
        )

    pre = links.map_batches(partials, batch_format="pyarrow")
    out = sum_i64_keys_with_payload(
        pre, "h", "pc_", ["src_host", "dst_host"], num_shards=num_shards
    )
    return out.map_batches(
        lambda t: t.select(["src_host", "dst_host", "pc_"]).rename_columns(
            ["src_host", "dst_host", "weight"]
        ),
        batch_format="pyarrow",
    )
