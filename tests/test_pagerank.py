import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from distributed_pagerank_ray.config import GraphSemantics, PageRankConfig, RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.pagerank import pagerank
from oracle.pagerank_oracle import pagerank_oracle


def _links_ds(src, dst):
    return ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])


def _run(tmp_path, src, dst, name, **cfg_kw):
    g = build_graph(
        _links_ds(src, dst),
        str(tmp_path / name),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),  # multi-shard on purpose
    )
    res = pagerank(g, PageRankConfig(**cfg_kw))
    return g, res


@pytest.mark.parametrize("name", ["chain5", "cycle4", "star8", "twocomp", "selfdup", "tri_bridge", "k4"])
def test_golden_conformance(tmp_path, golden_graphs, name):
    """allclose(1e-6) per-vertex vs the reference-semantics oracle."""
    src, dst = golden_graphs[name]
    g, res = _run(tmp_path, src, dst, name)
    want, it, conv, _ = pagerank_oracle(src, dst)
    got = res.ranks_numpy(shard_rows=3)
    assert np.allclose(got, want, atol=1e-6), name
    assert res.iterations == it
    assert res.converged == conv
    assert abs(got.sum() - 1.0) < 1e-9  # post-normalization Σrank = 1


def test_cycle4_uniform(tmp_path, golden_graphs):
    src, dst = golden_graphs["cycle4"]
    _, res = _run(tmp_path, src, dst, "cycle4u")
    assert np.allclose(res.ranks_numpy(shard_rows=3), 0.25, atol=1e-9)


def test_alt_params_and_custom_e(tmp_path, golden_graphs):
    """c=0.9, tol=1e-4 and a seeded random normalized E (reference
    graph.go:82-97) passed identically to engine and oracle."""
    src, dst = golden_graphs["star8"]
    rng = np.random.default_rng(13)
    e = rng.random(9)
    e = e / e.sum()
    g, res = _run(tmp_path, src, dst, "star8e", c=0.9, threshold=1e-4, e_vector=e)
    want, it, conv, _ = pagerank_oracle(src, dst, c=0.9, threshold=1e-4, e_vector=e)
    assert np.allclose(res.ranks_numpy(shard_rows=3), want, atol=1e-6)
    assert res.iterations == it


def test_random_e_helper(tmp_path, golden_graphs):
    """random_e matches the reference formula (uniform draw, normalized
    to sum 1 — graph.go:81-96), is seed-deterministic, and drives
    pagerank to oracle conformance like any explicit E."""
    from distributed_pagerank_ray.config import random_e

    e = random_e(9, seed=21)
    assert np.array_equal(e, random_e(9, seed=21))
    assert abs(e.sum() - 1.0) < 1e-12
    assert (e > 0).all() and not np.allclose(e, e[0])
    src, dst = golden_graphs["star8"]
    _, res = _run(tmp_path, src, dst, "star8re", e_vector=e)
    want, it, _, _ = pagerank_oracle(src, dst, e_vector=e)
    assert np.allclose(res.ranks_numpy(shard_rows=3), want, atol=1e-6)
    assert res.iterations == it


def test_dangling_redistribute(tmp_path, golden_graphs):
    src, dst = golden_graphs["chain5"]
    g = build_graph(
        _links_ds(src, dst),
        str(tmp_path / "dang"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )
    cfg = PageRankConfig(semantics=GraphSemantics(dangling="redistribute"))
    res = pagerank(g, cfg)
    want, it, _, _ = pagerank_oracle(src, dst, dangling="redistribute")
    assert np.allclose(res.ranks_numpy(shard_rows=3), want, atol=1e-6)


def test_relabel_invariance(tmp_path, golden_graphs):
    """Rank invariance under vertex relabeling (FIXTURES §4 property)."""
    src, dst = golden_graphs["tri_bridge"]
    perm = np.array([3, 0, 4, 1, 2])
    _, r1 = _run(tmp_path, src, dst, "orig")
    _, r2 = _run(tmp_path, perm[src], perm[dst], "perm")
    a = r1.ranks_numpy(shard_rows=3)
    b = r2.ranks_numpy(shard_rows=3)
    assert np.allclose(a, b[perm], atol=1e-9)


def test_corpus_end_to_end(tmp_path, tiny_corpus):
    """pages.html → extract → graph → pagerank, conformant with the
    oracle run on the golden link table."""
    from collections import Counter

    from distributed_pagerank_ray.stages.extract import extract_links

    pages = ray.data.read_parquet(f"{tiny_corpus}/pages.parquet", columns=["url", "html"])
    links = extract_links(pages, concurrency=2).select_columns(["src_url", "dst_url"])
    g = build_graph(links, str(tmp_path / "corpus"), run_cfg=RunConfig(num_partitions=2, shard_rows=16))
    res = pagerank(g)

    # oracle over golden links with the same id minting (sorted urls)
    golden = pq.read_table(f"{tiny_corpus}/links.parquet").to_pylist()
    vm = {r["key"]: r["id"] for r in pq.read_table(g.vertex_map_path).to_pylist()}
    src = np.array([vm[r["src_url"]] for r in golden])
    dst = np.array([vm[r["dst_url"]] for r in golden])
    want, it, conv, _ = pagerank_oracle(src, dst, n_vertices=g.n)
    got = res.ranks_numpy(shard_rows=16)
    assert np.allclose(got, want, atol=1e-6)
    assert res.iterations == it


def test_hits_vs_numpy(golden_graphs):
    """hits_fixed matches a dense numpy HITS (same L1-normalized
    half-step order) on every golden graph, for 1-3 iterations."""
    import pyarrow as pa

    import ray.data
    from distributed_pagerank_ray.pipelines.hits import hits_fixed

    # three shapes cover the edge cases: dangling chain (zero rows),
    # multi-edges + self-loop, dense clique
    for name in ("chain5", "selfdup", "k4"):
        src, dst = golden_graphs[name]
        verts = np.unique(np.concatenate([src, dst]))
        n = len(verts)
        idx = {v: i for i, v in enumerate(verts)}
        # duplicate (s,d) rows are multi-edges: each contributes its own
        # summand in the join-based half-steps
        A = np.zeros((n, n))
        for s, d in zip(src, dst):
            A[idx[s], idx[d]] += 1.0
        for iters in (1, 3):
            a = np.full(n, 1.0 / n)
            for _ in range(iters):
                h = A @ a
                h /= h.sum()
                a = A.T @ h
                a /= a.sum()
            ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
            got = hits_fixed(ds, iters=iters, num_partitions=2).to_pandas()
            got = got.set_index("vertex").loc[verts]
            assert np.allclose(got["hub"].to_numpy(), np.round(h, 6), atol=2e-6), (name, iters)
            assert np.allclose(got["auth"].to_numpy(), np.round(a, 6), atol=2e-6), (name, iters)
