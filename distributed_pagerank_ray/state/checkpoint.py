"""Per-iteration Parquet checkpointing with a manifest (resume support).

Replaces the reference's fault-tolerance story — full-state gRPC
broadcast to every worker each iteration plus bully re-election with
queue purges (reference: pkg/node/master.go:225-241,
pkg/node/worker.go:143-193) — with durable, resumable artifacts
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"):

    run_dir/
      graph/ edges.parquet…, vertices/…      (written once at build)
      iter_0000/ ranks/<shard-partitioned parquet>   + metrics.json
      iter_0001/ …
      manifest.json     {completed_iter, residual, fingerprint, …}

Every iteration directory is written to ``<dir>.tmp`` and atomically
renamed; the manifest is rewritten (tmp+rename) only after the rename
lands. Resume = read manifest, reload the last complete iteration's
rank shards, continue the driver loop. A killed run therefore loses at
most one in-flight iteration, vs the reference losing the whole
in-flight phase on queue purge (pkg/node/worker.go:181-186).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional


def iter_dir(run_dir: str, k: int) -> str:
    return os.path.join(run_dir, f"iter_{k:04d}")


def _manifest_path(run_dir: str) -> str:
    return os.path.join(run_dir, "manifest.json")


def read_manifest(run_dir: str) -> Optional[dict]:
    p = _manifest_path(run_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def write_manifest(run_dir: str, manifest: dict) -> None:
    p = _manifest_path(run_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, p)


def begin_iter(run_dir: str, k: int) -> str:
    """Temp staging dir for iteration k outputs; caller fills then commits."""
    tmp = iter_dir(run_dir, k) + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale partial write from a killed run
    os.makedirs(tmp)
    return tmp


def commit_iter(run_dir: str, k: int, metrics: dict[str, Any], manifest: dict) -> str:
    """Atomically publish iteration k and advance the manifest."""
    tmp = iter_dir(run_dir, k) + ".tmp"
    final = iter_dir(run_dir, k)
    with open(os.path.join(tmp, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1, sort_keys=True)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    manifest = dict(manifest)
    manifest["completed_iter"] = k
    manifest.update({f"last_{k2}": v for k2, v in metrics.items() if isinstance(v, (int, float, bool, str))})
    write_manifest(run_dir, manifest)
    return final


def write_metrics_parquet(run_dir: str) -> Optional[str]:
    """Consolidate every iteration's metrics.json into
    ``run_dir/metrics.parquet`` (one row per durable iteration — the
    queryable lineage/metrics table the north rule names). Unknown
    keys become nulls; list-valued keys are JSON-encoded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for d in sorted(os.listdir(run_dir)):
        p = os.path.join(run_dir, d, "metrics.json")
        if d.startswith("iter_") and os.path.isfile(p):
            with open(p) as fh:
                m = json.load(fh)
            rows.append(
                {
                    k: (json.dumps(v) if isinstance(v, (list, dict)) else v)
                    for k, v in m.items()
                }
            )
    if not rows:
        return None
    cols = sorted({k for r in rows for k in r})
    table = pa.table({c: [r.get(c) for r in rows] for c in cols})
    out = os.path.join(run_dir, "metrics.parquet")
    tmp = out + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out


def latest_complete_iter(run_dir: str, fingerprint: str) -> Optional[int]:
    """Resume point: manifest's completed_iter, iff fingerprints match and
    the iteration dir actually exists (belt and braces)."""
    m = read_manifest(run_dir)
    if not m or m.get("fingerprint") != fingerprint:
        return None
    k = m.get("completed_iter")
    if k is None or not os.path.isdir(iter_dir(run_dir, k)):
        return None
    return int(k)
