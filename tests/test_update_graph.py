"""Incremental update == full rebuild, compared per-URL (id assignment
is an internal detail: the update appends new ids, a rebuild re-sorts)."""

import tempfile

import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.config import PageRankConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph, update_graph
from distributed_pagerank_ray.pipelines.pagerank import pagerank


def _links(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([p[0] for p in pairs], pa.string()),
                "dst_url": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _url_table(run_dir, g):
    """url -> (out_degree, dangling) via the vertex_map join."""
    import pyarrow.parquet as pq

    vmap = pq.read_table(f"{run_dir}/graph/vertex_map").to_pydict()
    id2url = dict(zip(vmap["id"], vmap["key"]))
    verts = g.vertices().to_pandas()
    return {
        id2url[r.id]: (int(r.out_degree), float(r.dangling))
        for r in verts.itertuples()
    }


def _url_edges(run_dir, g):
    import pyarrow.parquet as pq

    vmap = pq.read_table(f"{run_dir}/graph/vertex_map").to_pydict()
    id2url = dict(zip(vmap["id"], vmap["key"]))
    e = g.edges().to_pandas()
    return {(id2url[s], id2url[d]) for s, d in zip(e["src"], e["dst"])}


BATCH_A = [
    ("u/a", "u/b"), ("u/a", "u/c"), ("u/b", "u/c"), ("u/c", "u/a"),
    ("u/d", "u/a"), ("u/a", "u/b"),  # duplicate line (line_count degrees)
]
BATCH_B = [
    ("u/a", "u/e"),          # old src -> new dst
    ("u/e", "u/f"),          # new -> new
    ("u/f", "u/a"),          # new -> old
    ("u/b", "u/c"),          # duplicate of an OLD edge (must not re-add)
    ("u/g", "u/g2"),         # fresh component
]


def test_update_matches_rebuild():
    base = tempfile.mkdtemp(prefix="dpr_upd_base_")
    upd = tempfile.mkdtemp(prefix="dpr_upd_inc_")
    full = tempfile.mkdtemp(prefix="dpr_upd_full_")

    g0 = build_graph(_links(BATCH_A), base)
    g1 = update_graph(base, _links(BATCH_B), upd)
    gf = build_graph(_links(BATCH_A + BATCH_B), full)

    assert g1.n == gf.n
    assert g1.m == gf.m
    assert g1.m_lines == gf.m_lines
    assert _url_table(upd, g1) == _url_table(full, gf)
    assert _url_edges(upd, g1) == _url_edges(full, gf)

    # old version untouched and still loadable
    g0b = build_graph(_links(BATCH_A), base)  # cached via _DONE
    assert g0b.n == g0.n and g0b.m == g0.m

    # downstream parity: converged pagerank per URL matches the rebuild
    import pyarrow.parquet as pq

    def ranks_by_url(run_dir, g):
        res = pagerank(g, PageRankConfig(threshold=1e-12))
        vmap = pq.read_table(f"{run_dir}/graph/vertex_map").to_pydict()
        id2url = dict(zip(vmap["id"], vmap["key"]))
        r = res.ranks().to_pandas()
        return {id2url[v]: rk for v, rk in zip(r["id"], r["rank"])}

    ra = ranks_by_url(upd, g1)
    rb = ranks_by_url(full, gf)
    assert set(ra) == set(rb)
    for u in ra:
        assert abs(ra[u] - rb[u]) < 1e-9, (u, ra[u], rb[u])


def test_update_is_idempotent_and_versioned():
    base = tempfile.mkdtemp(prefix="dpr_upd2_base_")
    upd = tempfile.mkdtemp(prefix="dpr_upd2_inc_")
    g0 = build_graph(_links(BATCH_A), base)
    g1 = update_graph(base, _links(BATCH_B), upd)
    # second call returns the cached version (no rebuild, same identity)
    g2 = update_graph(base, _links(BATCH_B), upd)
    assert (g2.n, g2.m, g2.m_lines) == (g1.n, g1.m, g1.m_lines)
    # disjoint-increment fast path (never reads old edges) agrees here
    upd3 = tempfile.mkdtemp(prefix="dpr_upd2_nodup_")
    g3 = update_graph(
        base, _links([("u/x", "u/y"), ("u/y", "u/x")]), upd3, check_duplicates=False
    )
    assert g3.n == g0.n + 2 and g3.m == g0.m + 2


def test_update_rerun_after_partial_crash_is_clean():
    import os

    base = tempfile.mkdtemp(prefix="dpr_upd3_base_")
    upd = tempfile.mkdtemp(prefix="dpr_upd3_inc_")
    build_graph(_links(BATCH_A), base)
    # simulate a crashed half-run: partial files, no _DONE
    gd = os.path.join(upd, "graph")
    os.makedirs(os.path.join(gd, "vertex_map"))
    with open(os.path.join(gd, "vertex_map", "stale.parquet"), "w") as fh:
        fh.write("junk")
    g1 = update_graph(base, _links(BATCH_B), upd)
    full = tempfile.mkdtemp(prefix="dpr_upd3_full_")
    gf = build_graph(_links(BATCH_A + BATCH_B), full)
    assert (g1.n, g1.m) == (gf.n, gf.m)
    assert _url_edges(upd, g1) == _url_edges(full, gf)
    # a base without any vertex_map is rejected with a clear error
    import shutil

    import pytest

    broken = tempfile.mkdtemp(prefix="dpr_upd3_broken_")
    shutil.copytree(os.path.join(base, "graph"), os.path.join(broken, "graph"))
    shutil.rmtree(os.path.join(broken, "graph", "vertex_map"))
    with pytest.raises(ValueError, match="vertex_map"):
        update_graph(broken, _links(BATCH_B), tempfile.mkdtemp(prefix="dpr_upd3_x_"))
