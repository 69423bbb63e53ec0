"""Algorithm registry + single run() entry point.

Replaces the reference's web-form → gRPC GraphUpload → master FSM
dispatch (reference: cmd/client/main.go:163-239, pkg/node/api.go:20-39,
pkg/node/master.go:21-55) with a plain config-driven dispatch usable
from Python or `ray job submit -- python -m distributed_pagerank_ray.run`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

import ray.data

from ..config import GraphSemantics, PageRankConfig, RunConfig
from ..sources.edgelist import read_edgelist
from ..stages.extract import extract_links
from .components import connected_components
from .graphbuild import GraphTables, build_graph
from .lpa import label_propagation
from .pagerank import pagerank
from .triangles import triangle_count

ALGORITHMS = ("pagerank", "cc", "lpa", "triangles", "scc")


@dataclass
class JobConfig:
    """One submitted computation (the reference's Configuration proto,
    proto/api.proto:17-30: c, threshold, graph source)."""

    algo: str = "pagerank"
    # input: exactly one of pages_parquet / edges_parquet / edgelist_txt
    pages_parquet: Optional[str] = None
    edges_parquet: Optional[str] = None
    edgelist_txt: Optional[str] = None
    run_dir: str = "/tmp/dpr_run"
    c: float = 0.85
    threshold: float = 1e-6
    max_iters: int = 100
    dangling: str = "none"
    outdegree_mode: str = "line_count"
    # None = derive from the cluster at load time. A fixed actor pool
    # that claims EVERY cluster CPU starves the upstream ReadParquet
    # task forever (hard deadlock observed at num_cpus=8 with the old
    # fixed default 8) — _resolve_extract_concurrency always leaves
    # headroom for the read + downstream tasks.
    extract_concurrency: Optional[int] = None
    run_cfg: RunConfig = field(default_factory=RunConfig)


def _resolve_extract_concurrency(requested: Optional[int], ncpu: int) -> int:
    """Actor-pool size for the extract stage: 3/4 of the cluster by
    default, and NEVER the whole cluster — at least 2 CPUs stay free
    for the parquet read feeding the pool (1 leads to livelock-grade
    trickle; 0 is a hard deadlock)."""
    cap = max(1, ncpu - 2)
    if requested is None:
        return max(1, min((3 * ncpu) // 4, cap))
    return max(1, min(requested, cap))


def load_edges(cfg: JobConfig) -> tuple["ray.data.Dataset", str, str, bool]:
    """Returns (links, src_col, dst_col, mint)."""
    if cfg.pages_parquet:
        pages = ray.data.read_parquet(cfg.pages_parquet, columns=["url", "html"])
        conc = _resolve_extract_concurrency(
            cfg.extract_concurrency, int(ray.cluster_resources().get("CPU", 8))
        )
        links = extract_links(pages, concurrency=conc).select_columns(
            ["src_url", "dst_url"]
        )
        return links, "src_url", "dst_url", True
    if cfg.edges_parquet:
        return (
            ray.data.read_parquet(cfg.edges_parquet, columns=["src", "dst"]),
            "src",
            "dst",
            True,
        )
    if cfg.edgelist_txt:
        return read_edgelist(cfg.edgelist_txt), "src", "dst", True
    raise ValueError("one of pages_parquet / edges_parquet / edgelist_txt required")


def build(cfg: JobConfig) -> GraphTables:
    links, s, d, mint = load_edges(cfg)
    sem = GraphSemantics(outdegree_mode=cfg.outdegree_mode, dangling=cfg.dangling)
    return build_graph(
        links, cfg.run_dir, src_col=s, dst_col=d, semantics=sem, run_cfg=cfg.run_cfg, mint=mint
    )


def run(cfg: JobConfig) -> dict[str, Any]:
    """Dispatch one algorithm; returns a JSON-able run summary (the
    reference's Ranks/status push, pkg/node/master.go:202-222)."""
    if cfg.algo not in ALGORITHMS:
        raise ValueError(f"unknown algo {cfg.algo!r}; choose from {ALGORITHMS}")
    g = build(cfg)
    if cfg.algo == "pagerank":
        pr = PageRankConfig(
            c=cfg.c,
            threshold=cfg.threshold,
            max_iters=cfg.max_iters,
            semantics=GraphSemantics(outdegree_mode=cfg.outdegree_mode, dangling=cfg.dangling),
        )
        res = pagerank(g, pr, cfg.run_cfg)
        status = (
            f"Converged after {res.iterations} iterations"
            if res.converged
            else f"Failed to converge after {cfg.max_iters} iterations"
        )  # wording mirrors masterSendRanksToClient, master.go:204-210
        return {
            "algo": "pagerank",
            "status": status,
            "iterations": res.iterations,
            "converged": res.converged,
            "residual": res.residual,
            "n_vertices": g.n,
            "n_edges": g.m,
            "ranks_path": res.final_ranks_path,
            "run_dir": g.run_dir,
        }
    if cfg.algo == "cc":
        res = connected_components(g, cfg.run_cfg, max_iters=cfg.max_iters)
        return {
            "algo": "cc",
            "iterations": res.iterations,
            "converged": res.converged,
            "n_components": res.n_components,
            "labels_path": res.labels_path,
            "run_dir": g.run_dir,
        }
    if cfg.algo == "lpa":
        res = label_propagation(g, cfg.run_cfg, max_iters=min(cfg.max_iters, 20))
        return {
            "algo": "lpa",
            "iterations": res.iterations,
            "converged": res.converged,
            "labels_path": res.labels_path,
            "run_dir": g.run_dir,
        }
    if cfg.algo == "scc":
        from ray.data.aggregate import Count

        from .scc import strongly_connected_components

        labels = strongly_connected_components(
            g.edges(),
            num_partitions=cfg.run_cfg.num_partitions,
        ).materialize()
        out = os.path.join(cfg.run_dir, "scc", "labels")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        labels.write_parquet(out)
        n_sccs = labels.groupby("scc").aggregate(Count(alias_name="_n")).count()
        return {
            "algo": "scc",
            "n_sccs": int(n_sccs),
            "labels_path": out,
            "run_dir": g.run_dir,
        }
    n_tri = triangle_count(g.edges(), cfg.run_cfg)
    return {"algo": "triangles", "n_triangles": n_tri, "run_dir": g.run_dir}
