"""Configuration dataclasses for the engine.

Replaces the reference's env-var/web-form configuration surface
(reference: pkg/utils/env.go:24-47, cmd/client/main.go:163-204,
proto/api.proto:17-30): damping ``c`` and convergence ``threshold``
come from the client form there; here they are explicit config fields
with the same defaults the north rule mandates (d=0.85, tol=1e-6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class GraphSemantics:
    """Flags capturing reference load-time semantics (SURVEY §1.3).

    - ``outdegree_mode='line_count'``: out-degree counts every input
      line including duplicate edges (reference: pkg/graph/graph.go:78)
      while duplicate in-links collapse (graph.go:77). ``'distinct'``
      counts deduped edges (the reference's *generator* path,
      graph.go:140-145).
    - ``dangling='none'``: dangling vertices contribute no mass; the
      leak is repaired only by the single final normalization
      (reference: pkg/graph/pagerank.go:38-45). ``'redistribute'``
      adds c * dangling_mass / N to every vertex each iteration
      (the textbook correction the north star asks for as an option).
    """

    outdegree_mode: str = "line_count"  # 'line_count' | 'distinct'
    dangling: str = "none"  # 'none' | 'redistribute'
    dedup_in_links: bool = True  # duplicate edges collapse to one in-link


@dataclass
class PageRankConfig:
    """PageRank parameters.

    Matches reference semantics: update ``c*sum + (1-c)*E`` (reference:
    pkg/node/worker.go:105-111), L1 residual ``<= threshold`` stop
    (pkg/node/master.go:158), 100-iteration cap (pkg/graph/pagerank.go:12),
    final normalization (pkg/node/master.go:160-167).
    """

    c: float = 0.85
    threshold: float = 1e-6
    max_iters: int = 100
    semantics: GraphSemantics = field(default_factory=GraphSemantics)
    # E (teleport) vector: None = uniform 1/|V|. The reference draws an
    # unseeded random normalized E (pkg/graph/graph.go:82-97); for
    # conformance, tests pass the same explicit E to engine and oracle.
    e_vector: Optional[np.ndarray] = None
    normalize: bool = True


def random_e(n: int, seed: int) -> np.ndarray:
    """Reference-style random personalization vector, made reproducible:
    the reference draws an UNSEEDED uniform per vertex and normalizes
    the sum to 1 (reference: pkg/graph/graph.go:81-96 — ``probability
    := rand.Float64()`` then ``v.E /= total``). Here the draw is seeded
    so engine and oracle can consume the identical vector; pass the
    result as ``PageRankConfig.e_vector``."""
    rng = np.random.default_rng(seed)
    e = rng.random(n)
    return e / e.sum()


@dataclass
class IterationLimits:
    max_iters: int = 100


@dataclass
class RunConfig:
    """Execution-level knobs (sizing for a multi-node cluster).

    ``shard_rows``: rank/label vector shard size (ids per object-store
    shard). Sized so a shard is a few MB: tasks pull only the shards
    overlapping their src range (edges are range-partitioned by src).

    ``num_partitions``: hash-join partition count for Dataset.join
    stages; scale with cluster CPUs.
    """

    shard_rows: int = 1 << 19  # 524288 ids -> 4 MiB float64 per shard
    num_partitions: int = 8
    batch_size: int = 65536
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1  # iterations between durable checkpoints
    # PageRank per-iteration combine implementation:
    # - 'tasks' (default): gather tasks over Dataset-prepared Arrow
    #   blocks emit per-shard partial vectors routed DIRECTLY to one
    #   reduce task per shard (num_returns=S) — no per-iteration
    #   AllToAll operator, ~0.2s fixed cost per iteration.
    # - 'groupby': pure Dataset pipeline (map_batches → union →
    #   groupby('shard') → map_groups) — same math, ~2-3s fixed
    #   AllToAll startup per iteration in local mode.
    combine_mode: str = "tasks"
    # Per-shard reduce arity cap for the tasks-mode BSP (pagerank / CC /
    # LPA). 0 = flat fan-in: every reduce task takes all B gather
    # payloads directly (fine while S × B is thousands). > 0 inserts
    # intermediate combiner tasks that merge groups of `combine_fanin`
    # payloads tree-wise until <= combine_fanin refs remain per shard —
    # the scale path once S × B reaches millions of refs (~10^9+
    # vertices): per-task argument counts stay bounded and the driver
    # releases gather refs as combiner levels complete. Combining is
    # the same accumulate the reducers run (sum / min / count-sum), so
    # results match the flat path up to FP summation order for
    # PageRank and exactly for CC / LPA (integer min / counts).
    combine_fanin: int = 0
