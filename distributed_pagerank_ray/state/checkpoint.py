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

URI targets: ``run_dir`` may be a ``scheme://`` URI (``file://`` is
exercised by tests; ``s3://``/``gs://`` route through the same
``pyarrow.fs.FileSystem.from_uri`` abstraction on a real cluster) —
every filesystem touch below goes through the ``fs_path``/``isdir``/
``makedirs``/``rmtree``/``replace`` helpers, which use plain ``os``
calls for local paths (fast path, truly atomic rename) and pyarrow
FileSystem calls for URIs. On backends without atomic directory
rename (object stores), ``replace`` degrades to move (copy+delete);
the MANIFEST write remains the commit point — ``latest_complete_iter``
trusts only a manifest whose iteration directory exists, so a torn
move is ignored and rewritten on resume.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional


def _is_uri(path: str) -> bool:
    return "://" in path


def fs_path(path: str):
    """(pyarrow FileSystem, in-filesystem path) for a URI; local paths
    return (None, path) — callers branch to plain ``os`` ops."""
    if not _is_uri(path):
        return None, path
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def isdir(path: str) -> bool:
    f, p = fs_path(path)
    if f is None:
        return os.path.isdir(p)
    from pyarrow import fs as pafs

    return f.get_file_info(p).type == pafs.FileType.Directory


def exists(path: str) -> bool:
    f, p = fs_path(path)
    if f is None:
        return os.path.exists(p)
    from pyarrow import fs as pafs

    return f.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    f, p = fs_path(path)
    if f is None:
        os.makedirs(p, exist_ok=True)
    else:
        f.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    f, p = fs_path(path)
    if f is None:
        shutil.rmtree(p)
    else:
        f.delete_dir(p)


def replace(src: str, dst: str) -> None:
    """Rename src over dst. Local: ``os.replace`` (atomic). URI:
    FileSystem.move — atomic on local/HDFS-like backends, copy+delete
    on object stores (the manifest, written after, is the real commit
    point)."""
    f, ps = fs_path(src)
    if f is None:
        os.replace(ps, fs_path(dst)[1])
    else:
        f.move(ps, fs_path(dst)[1])


def _read_json(path: str) -> Optional[dict]:
    """None for missing OR unparseable files. The URI commit path is
    FileSystem.move, which is copy+delete on object stores — a crash
    mid-copy can leave a truncated manifest (ADVICE r4). Treating a
    torn manifest as absent keeps the manifest-as-commit-point contract
    honest on non-atomic backends: resume falls back to the previous
    complete iteration (or from scratch) instead of crashing on
    JSONDecodeError."""
    f, p = fs_path(path)
    if f is None:
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            try:
                return json.load(fh)
            except json.JSONDecodeError:
                return None
    from pyarrow import fs as pafs

    if f.get_file_info(p).type == pafs.FileType.NotFound:
        return None
    with f.open_input_stream(p) as fh:
        try:
            return json.loads(fh.read().decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            return None


def _write_json_atomic(path: str, obj: dict) -> None:
    f, p = fs_path(path)
    data = json.dumps(obj, indent=1, sort_keys=True)
    if f is None:
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(data)
        os.replace(tmp, p)
    else:
        tmp = p + ".tmp"
        with f.open_output_stream(tmp) as fh:
            fh.write(data.encode("utf-8"))
        f.move(tmp, p)


def iter_dir(run_dir: str, k: int) -> str:
    return os.path.join(run_dir, f"iter_{k:04d}")


def _manifest_path(run_dir: str) -> str:
    return os.path.join(run_dir, "manifest.json")


def read_manifest(run_dir: str) -> Optional[dict]:
    return _read_json(_manifest_path(run_dir))


def write_manifest(run_dir: str, manifest: dict) -> None:
    _write_json_atomic(_manifest_path(run_dir), manifest)


def begin_iter(run_dir: str, k: int) -> str:
    """Temp staging dir for iteration k outputs; caller fills then commits."""
    tmp = iter_dir(run_dir, k) + ".tmp"
    if exists(tmp):
        rmtree(tmp)  # stale partial write from a killed run
    makedirs(tmp)
    return tmp


def commit_iter(run_dir: str, k: int, metrics: dict[str, Any], manifest: dict) -> str:
    """Atomically publish iteration k and advance the manifest."""
    tmp = iter_dir(run_dir, k) + ".tmp"
    final = iter_dir(run_dir, k)
    _write_json_atomic(os.path.join(tmp, "metrics.json"), metrics)
    if exists(final):
        rmtree(final)
    replace(tmp, final)
    manifest = dict(manifest)
    manifest["completed_iter"] = k
    manifest.update({f"last_{k2}": v for k2, v in metrics.items() if isinstance(v, (int, float, bool, str))})
    write_manifest(run_dir, manifest)
    return final


def _list_subdirs(run_dir: str) -> list[str]:
    f, p = fs_path(run_dir)
    if f is None:
        return sorted(os.listdir(p))
    from pyarrow import fs as pafs

    infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    return sorted(os.path.basename(i.path) for i in infos)


def write_metrics_parquet(run_dir: str) -> Optional[str]:
    """Consolidate every iteration's metrics.json into
    ``run_dir/metrics.parquet`` (one row per durable iteration — the
    queryable lineage/metrics table the north rule names). Unknown
    keys become nulls; list-valued keys are JSON-encoded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for d in _list_subdirs(run_dir):
        p = os.path.join(run_dir, d, "metrics.json")
        if d.startswith("iter_") and not d.endswith(".tmp"):
            m = _read_json(p)
            if m is None:
                continue
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
    f, ptmp = fs_path(tmp)
    pq.write_table(table, ptmp, filesystem=f)
    replace(tmp, out)
    return out


def latest_complete_iter(run_dir: str, fingerprint: str) -> Optional[int]:
    """Resume point: manifest's completed_iter, iff fingerprints match and
    the iteration dir actually exists (belt and braces)."""
    m = read_manifest(run_dir)
    if not m or m.get("fingerprint") != fingerprint:
        return None
    k = m.get("completed_iter")
    if k is None or not isdir(iter_dir(run_dir, k)):
        return None
    return int(k)
