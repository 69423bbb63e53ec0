"""distributed_pagerank_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the capabilities of
lioia/distributed-pagerank (a Go master/worker/RabbitMQ Map-Reduce
PageRank engine, see /root/reference) re-expressed Ray-Data-first:

- HTML text/link extraction from Common-Crawl-style pages via stateful
  actor-pool ``map_batches`` over zero-copy Arrow batches.
- Edge-table construction (dense id minting, degrees, dangling flags).
- Iterative PageRank / connected components / label propagation /
  triangle counting as Dataset pipelines: gather stages read a sharded
  rank/label vector from the object store (range-aligned with
  src-sorted edge partitions), pre-aggregate per batch, and combine via
  one ``groupby().sum()`` shuffle per iteration.
- Per-iteration Parquet checkpoints (ranks + metrics + manifest) so a
  killed run resumes; this replaces the reference's full-state gRPC
  broadcast + bully election (reference: pkg/node/master.go:225-241,
  pkg/node/worker.go:143-193).

No code is copied from the reference; file:line citations in
docstrings identify the behavior being matched.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import distributed_pagerank_ray` free of
    Ray imports until a pipeline is actually used)."""
    api = {
        "build_graph": ("distributed_pagerank_ray.pipelines.graphbuild", "build_graph"),
        "build_graph_dense": ("distributed_pagerank_ray.pipelines.graphbuild", "build_graph_dense"),
        "GraphTables": ("distributed_pagerank_ray.pipelines.graphbuild", "GraphTables"),
        "pagerank": ("distributed_pagerank_ray.pipelines.pagerank", "pagerank"),
        "connected_components": ("distributed_pagerank_ray.pipelines.components", "connected_components"),
        "label_propagation": ("distributed_pagerank_ray.pipelines.lpa", "label_propagation"),
        "triangle_count": ("distributed_pagerank_ray.pipelines.triangles", "triangle_count"),
        "extract_links": ("distributed_pagerank_ray.stages.extract", "extract_links"),
        "extract_text": ("distributed_pagerank_ray.stages.extract", "extract_text"),
        "read_edgelist": ("distributed_pagerank_ray.sources.edgelist", "read_edgelist"),
        "read_warc": ("distributed_pagerank_ray.sources.warc", "read_warc"),
        "dag_longest_path": ("distributed_pagerank_ray.pipelines.dagdepth", "dag_longest_path"),
        "mis_luby": ("distributed_pagerank_ray.pipelines.mis", "mis_luby"),
        "maximal_matching": ("distributed_pagerank_ray.pipelines.matching", "maximal_matching"),
        "salsa_fixed": ("distributed_pagerank_ray.pipelines.hits", "salsa_fixed"),
        "boruvka_forest": ("distributed_pagerank_ray.pipelines.mst", "boruvka_forest"),
        "densest_subgraph": ("distributed_pagerank_ray.pipelines.densest", "densest_subgraph"),
        "sorted_neighborhood_pairs": ("distributed_pagerank_ray.functions.dedup", "sorted_neighborhood_pairs"),
        "forest_summary": ("distributed_pagerank_ray.pipelines.mst", "forest_summary"),
        "levenshtein_bytes": ("distributed_pagerank_ray.functions.editdist", "levenshtein_bytes"),
        "jaro_winkler_bytes": ("distributed_pagerank_ray.functions.editdist", "jaro_winkler_bytes"),
        "ppr_push": ("distributed_pagerank_ray.pipelines.pprpush", "ppr_push"),
        "quantile_sketch": ("distributed_pagerank_ray.functions.sketches", "quantile_sketch"),
        "closeness_centrality": ("distributed_pagerank_ray.pipelines.centrality", "closeness_centrality"),
        "eccentricity": ("distributed_pagerank_ray.pipelines.centrality", "eccentricity"),
        "effective_diameter": ("distributed_pagerank_ray.pipelines.centrality", "effective_diameter"),
        "rich_club": ("distributed_pagerank_ray.pipelines.metrics", "rich_club"),
        "rake_keywords": ("distributed_pagerank_ray.functions.textstats", "rake_keywords"),
        "vocab_growth": ("distributed_pagerank_ray.functions.textstats", "vocab_growth"),
        "parse_http_headers": ("distributed_pagerank_ray.sources.http", "parse_http_headers"),
        "decode_chunked": ("distributed_pagerank_ray.sources.http", "decode_chunked"),
        "split_gzip_members": ("distributed_pagerank_ray.functions.multimodal", "split_gzip_members"),
        "build_warc_gz": ("distributed_pagerank_ray.sources.warc", "build_warc_gz"),
        "centroid_silhouette": ("distributed_pagerank_ray.functions.similarity", "centroid_silhouette"),
        "bm25_scores": ("distributed_pagerank_ray.functions.textstats", "bm25_scores"),
        "knn_pq_adc": ("distributed_pagerank_ray.functions.pq", "knn_pq_adc"),
        "PageRankConfig": ("distributed_pagerank_ray.config", "PageRankConfig"),
        "GraphSemantics": ("distributed_pagerank_ray.config", "GraphSemantics"),
        "RunConfig": ("distributed_pagerank_ray.config", "RunConfig"),
        "JobConfig": ("distributed_pagerank_ray.pipelines.registry", "JobConfig"),
        "run": ("distributed_pagerank_ray.pipelines.registry", "run"),
    }
    if name in api:
        import importlib

        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
