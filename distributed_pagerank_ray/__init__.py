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
