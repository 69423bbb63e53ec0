"""Round-4 scale-posture fixes: item_pairs hot-user cap, the
vectorized props extraction, and the BSP adjacency build for the
triangle join path."""

import json

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _write_events(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "props": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


def test_item_pairs_hot_user_cap(tmp_path):
    """A power user with 10^4 distinct items must be dropped by the
    default cap BEFORE the self-join (not expanded into 10^8 rows);
    normal users' pairs are unaffected."""
    from distributed_pagerank_ray.pipelines.relational import item_pairs

    rows = [(1, json.dumps({"k": int(k)})) for k in range(10_000)]
    for u in range(2, 22):  # 20 normal users sharing items {1,2,3}
        rows += [(u, json.dumps({"k": k})) for k in (1, 2, 3)]
    sf = _write_events(tmp_path, rows)

    got = (
        item_pairs(sf, min_count=5, num_partitions=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # hot user dropped: only the 3 shared pairs survive, each n=20
    # (+1 where user 1 would have contributed, had it not been capped)
    assert list(map(tuple, got[["a", "b", "n"]].to_numpy())) == [
        (1, 2, 20),
        (1, 3, 20),
        (2, 3, 20),
    ]

def test_item_pairs_cap_semantics(tmp_path):
    """Cap above a user's item count keeps its contribution; below
    drops it; None = exact/unbounded."""
    from distributed_pagerank_ray.pipelines.relational import item_pairs

    rows = [(1, json.dumps({"k": int(k)})) for k in range(1, 51)]  # 50 items
    for u in range(2, 8):
        rows += [(u, json.dumps({"k": k})) for k in (1, 2)]
    sf = _write_events(tmp_path, rows)

    capped = item_pairs(sf, min_count=6, num_partitions=2, max_items_per_user=10).to_pandas()
    assert sorted(map(tuple, capped[["a", "b", "n"]].to_numpy())) == [(1, 2, 6)]
    exact = item_pairs(sf, min_count=6, num_partitions=2, max_items_per_user=None).to_pandas()
    assert sorted(map(tuple, exact[["a", "b", "n"]].to_numpy())) == [(1, 2, 7)]


def test_props_k_vectorized_matches_json_loads():
    from distributed_pagerank_ray.pipelines.relational import _props_k_array

    vals = ['{"k": 87}', '{"k": 0}', '{"k": -3}', None, "", "{}", '{"j": 5}']
    got = _props_k_array(pa.array(vals, pa.string())).to_pylist()
    want = [json.loads(p or "{}").get("k", 0) for p in vals]
    assert got == want


def test_triangle_join_path_bsp_adjacency():
    """Forced join path (broadcast_threshold=0) must agree with brute
    force on a graph with hubs and shared neighbors."""
    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.triangles import triangle_count

    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 500)
    dst = rng.integers(0, 60, 500)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    got = triangle_count(ds, RunConfig(num_partitions=4), broadcast_threshold=0)

    und = set()
    for a, b in zip(src, dst):
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if c > b  # count each triangle once: a < b < c
        if a < b
    )
    assert got == brute


def test_cc_long_run_bounded_lineage(tmp_path):
    """Lineage-cut audit (round-4 verdict item): 40+ CC iterations must
    not grow driver/object-store state unboundedly. The CC loop is
    raw-task BSP — each iteration's reduce tasks consume the previous
    iteration's S shard refs and produce S new ones, the driver rebinds
    (freeing the old), and the edge blocks are materialized ONCE before
    the loop — there is no per-iteration Dataset plan to grow. LPA and
    the walk engine share the same shape (fixed blocks + per-step
    materialized state). This test pins that contract on a path graph
    whose min-label propagation needs one iteration per hop."""
    import ray

    from distributed_pagerank_ray.config import RunConfig
    from distributed_pagerank_ray.pipelines.components import connected_components
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph

    n = 48  # path 0-1-...-47: label 0 travels one hop per iteration
    ds = ray.data.from_items(
        [{"src": i, "dst": i + 1} for i in range(n - 1)]
    )
    g = build_graph(
        ds,
        str(tmp_path / "path"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=16),
    )
    before = ray.available_resources().get("object_store_memory", 0)
    res = connected_components(g, max_iters=100)
    after = ray.available_resources().get("object_store_memory", 0)
    assert res.converged and res.n_components == 1
    assert res.iterations >= 30  # genuinely long run
    # bounded growth: the driver ends holding only the final S shard
    # refs; anything leaked per-iteration would show up here (tiny
    # shards => tight 64 MiB tolerance is generous)
    assert before - after < 64 * 1024 * 1024
    # checkpoint cadence held: one durable metrics row per iteration
    import pyarrow.parquet as pq

    mt = pq.read_table(str(tmp_path / "path" / "cc" / "metrics.parquet"))
    assert mt.num_rows == res.iterations + 1  # + iter_0000 init


def test_reciprocity_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import reciprocity

    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 30, 200)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    row = reciprocity(ds, num_partitions=2, num_shards=2).take_all()[0]
    es = {(a, b) for a, b in zip(src, dst) if a != b}
    n_rec = sum(1 for (a, b) in es if (b, a) in es)
    assert row["n_edges"] == len(es)
    assert row["n_reciprocal"] == n_rec
    assert row["reciprocity"] == round(n_rec / len(es), 6)


def test_adamic_adar_brute_force():
    import math

    from distributed_pagerank_ray.pipelines.metrics import adamic_adar_scores

    rng = np.random.default_rng(11)
    raw = {(int(a), int(b)) for a, b in zip(rng.integers(0, 25, 150), rng.integers(0, 25, 150)) if a != b}
    und = sorted({(min(a, b), max(a, b)) for a, b in raw})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    )
    got = adamic_adar_scores(ds, k=10, num_partitions=2, num_shards=2).to_pandas()

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    for a, b in und:
        s = sum(
            1.0 / math.log(len(adj[m]))
            for m in adj[a] & adj[b]
            if len(adj[m]) > 1
        )
        want.append((a, b, round(s, 6)))
    want.sort(key=lambda t: (-t[2], t[0], t[1]))
    gl = [(int(r.a), int(r.b), float(r.score)) for r in got.itertuples(index=False)]
    assert gl == want[:10]


def test_covariance_matrix_vs_numpy():
    from distributed_pagerank_ray.functions.similarity import covariance_matrix

    rng = np.random.default_rng(4)
    X = rng.normal(size=(300, 5)).astype(np.float32)
    ds = ray.data.from_items(
        [{"embedding": list(map(float, row))} for row in X]
    ).repartition(4)
    got = covariance_matrix(ds).to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
    Xf = X.astype(np.float64)
    cov = (Xf.T @ Xf) / len(Xf) - np.outer(Xf.mean(axis=0), Xf.mean(axis=0))
    assert len(got) == 15  # upper triangle of 5x5
    for i, j, c in got.itertuples(index=False):
        assert abs(c - round(cov[int(i), int(j)], 6)) <= 1e-6


def test_resize_ppm_nearest_neighbor():
    from distributed_pagerank_ray.functions.multimodal import ResizePpm, encode_ppm

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (5, 9, 3)).astype(np.uint8)
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_ppm(img)], pa.binary()),
        }
    )
    out = ResizePpm(out_w=4, out_h=2)(t)
    sx = (np.arange(4) * 9) // 4
    sy = (np.arange(2) * 5) // 2
    small = img[sy[:, None], sx[None, :], :].reshape(-1, 3)
    for c, name in enumerate(("rmean_r", "rmean_g", "rmean_b")):
        assert out.column(name).to_pylist() == [round(float(small[:, c].mean()), 6)]


def test_parts_except_matches_duckdb(tmp_path):
    import duckdb

    from distributed_pagerank_ray.pipelines.relational import parts_except_years

    sf = "/root/testdata/sf0.001"
    got = (
        parts_except_years(sf)
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT l_partkey, count(*) AS cnt
        FROM read_parquet('{sf}/lineitem.parquet')
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_partkey
        HAVING l_partkey NOT IN (
          SELECT l_partkey FROM read_parquet('{sf}/lineitem.parquet')
          WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01')
        ORDER BY l_partkey
        """
    ).df()
    assert got["l_partkey"].tolist() == want["l_partkey"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()


def test_degree_gini_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import degree_gini

    rng = np.random.default_rng(6)
    src = rng.zipf(1.6, 400) % 40
    dst = rng.integers(0, 40, 400)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    row = degree_gini(ds, num_shards=2).take_all()[0]
    deg = pd.Series(src).value_counts().to_numpy()
    x = np.sort(deg)
    n = len(x)
    want = float(((2 * np.arange(1, n + 1) - n - 1) * x).sum()) / (n * x.sum())
    assert row["n"] == n
    assert row["gini"] == round(want, 6)


def test_bigram_surprisal_join_path_equals_broadcast_path():
    from distributed_pagerank_ray.functions.textstats import bigram_surprisal

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    a = bigram_surprisal(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        bigram_surprisal(docs, broadcast_vocab=0)  # force the join path
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0


def test_quantize_int8_vs_numpy():
    from distributed_pagerank_ray.functions.similarity import quantize_int8_stats

    rng = np.random.default_rng(8)
    X = rng.normal(size=(200, 6)).astype(np.float32)
    ds = ray.data.from_items([{"embedding": list(map(float, r))} for r in X]).repartition(3)
    got = quantize_int8_stats(ds).to_pandas().sort_values("j").reset_index(drop=True)
    Xf = X.astype(np.float64)
    scale = np.abs(Xf).max(axis=0) / 127.0
    code = np.floor(Xf / scale + 0.5)
    mse = ((Xf - code * scale) ** 2).mean(axis=0)
    assert got["scale"].tolist() == [round(s, 6) for s in scale]
    assert got["mse"].tolist() == [round(m, 9) for m in mse]


def test_modularity_brute_force():
    from distributed_pagerank_ray.pipelines.metrics import modularity

    rng = np.random.default_rng(12)
    # two clusters + a few cross edges
    edges = set()
    for lo, hi in ((0, 10), (10, 20)):
        for _ in range(30):
            a, b = rng.integers(lo, hi, 2)
            if a != b:
                edges.add((min(a, b), max(a, b)))
    edges.add((3, 15))
    und = sorted(edges)
    labels = [(v, 0 if v < 10 else 1) for v in range(20)]
    eds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in und], pa.int64()),
                "b": pa.array([e[1] for e in und], pa.int64()),
            }
        )
    )
    lds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([l[0] for l in labels], pa.int64()),
                "label": pa.array([l[1] for l in labels], pa.int64()),
            }
        )
    )
    row = modularity(eds, lds, num_partitions=2, num_shards=2).take_all()[0]

    m = len(und)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = dict(labels)
    communities = {0, 1}
    q = 0.0
    for c in sorted(communities):
        m_c = sum(1 for a, b in und if lab[a] == c and lab[b] == c)
        d_c = sum(d for v, d in deg.items() if lab[v] == c)
        q += m_c / m - (d_c / (2.0 * m)) ** 2
    assert row["m"] == m
    assert row["n_communities"] == 2
    assert row["modularity"] == round(q, 6)


def test_lexical_diversity_brute_force():
    from distributed_pagerank_ray.functions.textstats import lexical_diversity_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a c", "x x x", "", "  one  "], pa.string()),
        }
    )
    out = lexical_diversity_batch(t).to_pydict()
    assert out["doc_id"] == [0, 1, 3]  # empty doc 2 emits no row
    assert out["n_words"] == [4, 3, 1]
    assert out["n_distinct"] == [3, 1, 1]
    assert out["ttr"] == [0.75, round(1 / 3, 6), 1.0]
    assert out["hapax_frac"] == [0.5, 0.0, 1.0]


def test_zipf_words_vs_numpy():
    from distributed_pagerank_ray.functions.textstats import zipf_word_alpha

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    row = zipf_word_alpha(docs).take_all()[0]
    texts = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")["text"].fillna("")
    from collections import Counter

    cnt = Counter(w for t in texts for w in t.split() if w)
    tail = np.array([c for c in cnt.values() if c >= 2], dtype=np.float64)
    assert row["n_tail"] == len(tail)
    assert row["alpha"] == round(1.0 + len(tail) / np.log(tail / 1.5).sum(), 6)


def _tarjan(edges, verts):
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for s in verts:
        if s in index:
            continue
        work = [(s, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def test_scc_brute_force():
    """FW-BW-MIN SCC vs Tarjan on dense random digraphs (multiple
    nontrivial SCCs)."""
    from distributed_pagerank_ray.pipelines.scc import strongly_connected_components

    rng = np.random.default_rng(21)
    for trial in range(2):
        n = 24
        E = {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 90), rng.integers(0, n, 90))
            if a != b
        }
        verts = sorted({v for e in E for v in e})
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in E], pa.int64()),
                    "dst": pa.array([e[1] for e in E], pa.int64()),
                }
            )
        )
        got = {
            r["id"]: r["scc"]
            for r in strongly_connected_components(
                ds, num_partitions=2, num_shards=2
            ).take_all()
        }
        want = _tarjan(E, verts)
        assert got == want
        # density check: the fixture must actually contain cycles
        sizes = pd.Series(list(want.values())).value_counts()
        assert (sizes > 1).sum() >= 1
        # fused-exchange invariant (VERDICT r4 #4): ONE join per inner
        # iteration carries BOTH the forward and backward sweeps — the
        # pre-fusion shape spent 2 joins + 2 compare joins per
        # diameter step (F then B, sequentially).
        from distributed_pagerank_ray.pipelines import scc as scc_mod

        st = scc_mod.LAST_STATS
        assert st["inner_joins"] == st["inner_iters"]
        assert st["rounds"] >= 1 and st["inner_iters"] >= 1


def test_scc_inner_nonconvergence_raises():
    """ADVICE r4: an inner fixpoint that exhausts max_iters must RAISE,
    never silently return non-fixpoint labels (a long cycle's labels
    would otherwise settle wrong with no error)."""
    from distributed_pagerank_ray.pipelines.scc import strongly_connected_components

    n = 12  # a single n-cycle: inner diameter is n-1
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(range(n)), pa.int64()),
                "dst": pa.array([(i + 1) % n for i in range(n)], pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="inner fixpoint"):
        strongly_connected_components(ds, num_partitions=2, num_shards=2, max_iters=3)
    # and with enough budget the same graph is one SCC
    out = strongly_connected_components(ds, num_partitions=2, num_shards=2)
    assert {r["scc"] for r in out.take_all()} == {0}
