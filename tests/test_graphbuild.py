import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from distributed_pagerank_ray.config import GraphSemantics, RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph, mint_dense_ids


def _links_ds(src, dst):
    return ray.data.from_items(
        [{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)]
    )


def test_mint_dense_ids():
    ds = ray.data.from_items([{"key": k} for k in ["b", "a", "c", "a", "b"]])
    vmap, n = mint_dense_ids(ds, "key")
    assert n == 3
    rows = {r["key"]: r["id"] for r in vmap.take_all()}
    assert rows == {"a": 0, "b": 1, "c": 2}  # sorted rank


def test_build_graph_semantics(tmp_path, golden_graphs):
    # selfdup: 0->1 (x2), 1->0, 2->2  (duplicate line + self-loop)
    src, dst = golden_graphs["selfdup"]
    g = build_graph(
        _links_ds(src, dst),
        str(tmp_path / "run"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=2),  # force multiple shards
    )
    assert g.n == 3
    assert g.m == 3  # distinct edges: (0,1),(1,0),(2,2)
    assert g.m_lines == 4
    verts = pq.read_table(g.vertices_path).to_pylist()
    by_id = {v["id"]: v for v in verts}
    # line-count out-degrees (reference graph.go:78): 0->2, 1->1, 2->1
    assert by_id[0]["out_degree"] == 2
    assert by_id[1]["out_degree"] == 1
    assert by_id[2]["out_degree"] == 1
    assert all(v["dangling"] == 0.0 for v in verts)
    # duplicate edge collapsed in edge table (graph.go:77)
    edges = sorted((r["src"], r["dst"]) for r in pq.read_table(g.edges_path).to_pylist())
    assert edges == [(0, 1), (1, 0), (2, 2)]
    # weight shards: inv_out = 1/line-count degree
    w = g.weight_shards().to_numpy()
    assert np.allclose(w, [0.5, 1.0, 1.0])


def test_build_graph_distinct_mode(tmp_path, golden_graphs):
    src, dst = golden_graphs["selfdup"]
    g = build_graph(
        _links_ds(src, dst),
        str(tmp_path / "run"),
        src_col="src",
        dst_col="dst",
        mint=False,
        semantics=GraphSemantics(outdegree_mode="distinct"),
    )
    verts = {v["id"]: v for v in pq.read_table(g.vertices_path).to_pylist()}
    assert verts[0]["out_degree"] == 1  # dedup-consistent (generator path graph.go:140-145)


def test_build_graph_dangling(tmp_path, golden_graphs):
    src, dst = golden_graphs["chain5"]  # 4 is a dangling sink
    g = build_graph(
        _links_ds(src, dst), str(tmp_path / "run"), src_col="src", dst_col="dst", mint=False
    )
    verts = {v["id"]: v for v in pq.read_table(g.vertices_path).to_pylist()}
    assert verts[4]["dangling"] == 1.0 and verts[4]["out_degree"] == 0
    assert g.n == 5


def test_build_graph_from_urls(tmp_path, tiny_corpus):
    links = ray.data.read_parquet(f"{tiny_corpus}/links.parquet")
    g = build_graph(links, str(tmp_path / "run"), run_cfg=RunConfig(num_partitions=2))
    assert g.n <= 64  # dangling-only pages with no in-links may be absent
    # vertex_map join-back: every minted key is a url
    vm = pq.read_table(g.vertex_map_path).to_pylist()
    assert len(vm) == g.n
    assert len({r["id"] for r in vm}) == g.n
    assert sorted(r["id"] for r in vm) == list(range(g.n))
    # out-degrees match golden link line counts (line-count mode)
    golden = pq.read_table(f"{tiny_corpus}/links.parquet").to_pylist()
    from collections import Counter

    want = Counter(r["src_url"] for r in golden)
    url2id = {r["key"]: r["id"] for r in vm}
    verts = {v["id"]: v["out_degree"] for v in pq.read_table(g.vertices_path).to_pylist()}
    for url, cnt in want.items():
        assert verts[url2id[url]] == cnt


def test_cached_build_preserves_shard_rows(tmp_path):
    """A rerun with a DIFFERENT RunConfig.shard_rows must come back with
    the layout the artifacts were actually written with (_DONE.json),
    not the caller's value — wrong shard_rows would silently corrupt
    dense vectors loaded from the shard partitions."""
    src = [0, 1, 2, 3, 4]
    dst = [1, 2, 3, 4, 0]
    run = str(tmp_path / "run")
    g1 = build_graph(
        _links_ds(src, dst), run, src_col="src", dst_col="dst", mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=2),
    )
    assert g1.shard_rows == 2
    g2 = build_graph(
        _links_ds(src, dst), run, src_col="src", dst_col="dst", mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=4),  # different!
    )
    assert g2.shard_rows == 2  # from _DONE.json, not the new RunConfig
    assert g2.fingerprint() == g1.fingerprint()
    # and the weight vector reads back correctly through the cached handle
    np.testing.assert_allclose(g2.weight_shards().to_numpy(), np.ones(5))


def test_load_shard_rejects_wrong_layout(tmp_path):
    """Reading shard partitions with a mismatched shard_rows raises
    instead of wrapping ids negative and corrupting the vector."""
    import ray

    from distributed_pagerank_ray.state.shards import ShardedVector

    src = [0, 1, 2, 3, 4]
    dst = [1, 2, 3, 4, 0]
    g = build_graph(
        _links_ds(src, dst), str(tmp_path / "run"), src_col="src", dst_col="dst",
        mint=False, run_cfg=RunConfig(num_partitions=2, shard_rows=2),
    )
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        ShardedVector.from_parquet(g.vertices_path, g.n, 4, "id", "inv_out").to_numpy()


def test_host_graph_brute_force():
    """host_graph == brute-force collapse: case/port normalization,
    relative-URL drop, intra-host drop, duplicate-line weights."""
    from collections import defaultdict

    import ray.data

    from distributed_pagerank_ray.pipelines.graphbuild import host_graph

    rows = []
    for i in range(2000):
        src = "HTTP://Site%d.EXample.com:80/p/%d" % (i % 9, i)
        dst = "https://site%d.example.com:443/q" % ((i * 5 + 2) % 9)
        rows.append({"src_url": src, "dst_url": dst})
        if i % 4 == 0:  # duplicate line → weight 2
            rows.append({"src_url": src, "dst_url": dst})
        if i % 11 == 0:  # relative URL → dropped
            rows.append({"src_url": src, "dst_url": "/rel/%d" % i})
        if i % 13 == 0:  # intra-host → dropped by default
            rows.append({"src_url": src, "dst_url": src.lower().replace(":80", "")})

    want: dict = defaultdict(int)
    for r in rows:
        sh = "site%s.example.com" % r["src_url"][11]
        if r["dst_url"].startswith("/"):
            continue
        dh = r["dst_url"].split("://")[1].split("/")[0].replace(":443", "").replace(":80", "")
        if sh == dh:
            continue
        want[(sh, dh)] += 1

    ds = ray.data.from_items(rows).repartition(6)
    got = host_graph(ds, num_shards=4).take_all()
    assert len(got) == len(want)
    for g in got:
        assert g["weight"] == want[(g["src_host"], g["dst_host"])]
