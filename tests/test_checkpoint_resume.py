"""North-rule requirement: a killed run resumes from checkpoint and the
resumed result is bit-equal to an uninterrupted run (FIXTURES.md §5)."""

import json
import os

import numpy as np

import ray.data

from distributed_pagerank_ray.config import PageRankConfig, RunConfig
from distributed_pagerank_ray.pipelines.graphbuild import build_graph
from distributed_pagerank_ray.pipelines.pagerank import pagerank


def _graph(tmp_path, golden_graphs, name, sub):
    src, dst = golden_graphs[name]
    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    return build_graph(
        ds,
        str(tmp_path / sub),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )


def test_resume_bit_equal(tmp_path, golden_graphs):
    g1 = _graph(tmp_path, golden_graphs, "tri_bridge", "interrupted")
    partial = pagerank(g1, PageRankConfig(max_iters=3))
    assert partial.iterations == 3 and not partial.converged
    # "kill": a stale in-flight temp dir from a crashed iteration
    os.makedirs(os.path.join(g1.run_dir, "iter_0004.tmp", "junk"), exist_ok=True)

    resumed = pagerank(g1, PageRankConfig(max_iters=100))
    assert resumed.converged and resumed.iterations > 3

    g2 = _graph(tmp_path, golden_graphs, "tri_bridge", "uninterrupted")
    clean = pagerank(g2, PageRankConfig(max_iters=100))
    a = resumed.ranks_numpy(shard_rows=3)
    b = clean.ranks_numpy(shard_rows=3)
    assert np.array_equal(a, b)  # bit-equal, not just allclose
    assert resumed.iterations == clean.iterations


def test_manifest_metrics(tmp_path, golden_graphs):
    g = _graph(tmp_path, golden_graphs, "cycle4", "metrics")
    res = pagerank(g)
    with open(os.path.join(g.run_dir, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["completed_iter"] == res.iterations
    # per-iteration metrics files exist with residual + wall time
    with open(os.path.join(g.run_dir, f"iter_{res.iterations:04d}", "metrics.json")) as fh:
        metrics = json.load(fh)
    assert metrics["residual"] == res.residual
    assert "wall_sec" in metrics and "edges" in metrics
    # consolidated queryable metrics table (one row per durable iteration)
    import pyarrow.parquet as pq

    mt = pq.read_table(os.path.join(g.run_dir, "metrics.parquet"))
    assert len(mt) == res.iterations + 1  # incl. iter 0 init
    assert "residual" in mt.column_names and "iteration" in mt.column_names


def test_checkpoint_every_cadence(tmp_path, golden_graphs):
    """checkpoint_every=3: intermediate iterations live only in the
    object store; durable dirs land every 3rd iteration plus a final
    flush; results identical to per-iteration checkpointing."""
    import os

    src, dst = golden_graphs["tri_bridge"]
    g1 = _graph(tmp_path, golden_graphs, "tri_bridge", "every1")
    r1 = pagerank(g1, PageRankConfig())

    ds = ray.data.from_items([{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)])
    from distributed_pagerank_ray.pipelines.graphbuild import build_graph

    g3 = build_graph(
        ds,
        str(tmp_path / "every3"),
        src_col="src",
        dst_col="dst",
        mint=False,
        run_cfg=RunConfig(num_partitions=2, shard_rows=3, checkpoint_every=3),
    )
    r3 = pagerank(g3, PageRankConfig(), RunConfig(shard_rows=3, checkpoint_every=3))
    assert np.array_equal(r1.ranks_numpy(), r3.ranks_numpy())
    assert r1.iterations == r3.iterations
    iter_dirs = sorted(d for d in os.listdir(g3.run_dir) if d.startswith("iter_"))
    # far fewer durable checkpoints than iterations (init + every 3rd + flush)
    assert len(iter_dirs) < r3.iterations
    # resume from the sparse checkpoints still completes and agrees
    again = pagerank(g3, PageRankConfig(), RunConfig(shard_rows=3, checkpoint_every=3))
    assert np.array_equal(again.ranks_numpy(), r1.ranks_numpy())


def test_cc_resume(tmp_path, golden_graphs):
    from distributed_pagerank_ray.pipelines.components import connected_components

    g = _graph(tmp_path, golden_graphs, "tri_bridge", "cc_resume")
    partial = connected_components(g, max_iters=1)
    assert not partial.converged
    resumed = connected_components(g, max_iters=100)
    assert resumed.converged
    from oracle.graph_oracle import cc_oracle

    src, dst = golden_graphs["tri_bridge"]
    assert np.array_equal(resumed.labels_numpy(), cc_oracle(src, dst, n=g.n))
    # fully-converged re-entry is a no-op returning the same labels
    again = connected_components(g, max_iters=100)
    assert again.converged and again.iterations == resumed.iterations


def test_config_change_invalidates_resume(tmp_path, golden_graphs):
    g = _graph(tmp_path, golden_graphs, "cycle4", "inval")
    r1 = pagerank(g, PageRankConfig(c=0.85))
    r2 = pagerank(g, PageRankConfig(c=0.5))  # different damping -> fresh run
    assert r2.iterations >= 1
    want_sum = r2.ranks_numpy(shard_rows=3).sum()
    assert abs(want_sum - 1.0) < 1e-9


def test_resume_after_real_sigkill(tmp_path):
    """Literal SIGKILL mid-run (SURVEY §8): a child process running
    PageRank is killed -9 after ≥2 durable iterations; rerunning the
    same command resumes from manifest.json (pre-kill iteration dirs
    are NOT rewritten) and finishes; ranks match an uninterrupted run."""
    import signal
    import subprocess
    import sys as _sys
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    V, E = 400_000, 4_000_000
    rng = np.random.default_rng(7)
    edges = tmp_path / "edges.parquet"
    pq.write_table(
        pa.table(
            {
                "src": pa.array(np.sort(rng.integers(0, V, E)).astype(np.int64)),
                "dst": pa.array(rng.integers(0, V, E).astype(np.int64)),
            }
        ),
        str(edges),
    )
    child = os.path.join(os.path.dirname(__file__), "sigkill_child.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(child)))
    env = dict(os.environ, PYTHONPATH=repo, RAY_ADDRESS="")
    run_a = str(tmp_path / "killed")

    def spawn(run_dir, max_iters):
        return subprocess.Popen(
            [_sys.executable, child, str(edges), str(V), run_dir, str(max_iters)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )

    p = spawn(run_a, 500)  # far more iterations than we let it live
    manifest = os.path.join(run_a, "manifest.json")
    deadline = time.time() + 240
    k0 = None
    while time.time() < deadline:
        if os.path.exists(manifest):
            try:
                with open(manifest) as fh:
                    k0 = json.load(fh).get("completed_iter", 0)
            except (json.JSONDecodeError, OSError):
                k0 = None  # mid-rewrite
            if k0 is not None and k0 >= 2:
                break
        assert p.poll() is None, "child exited before it could be killed"
        time.sleep(0.05)
    assert k0 is not None and k0 >= 2, "child never reached iteration 2"
    p.send_signal(signal.SIGKILL)
    p.wait()
    kill_time = time.time()
    pre_kill_iter = os.path.join(run_a, "iter_0001")
    pre_kill_mtime = os.path.getmtime(pre_kill_iter)

    total_iters = max(10, k0 + 5)
    p2 = spawn(run_a, total_iters)  # same command again -> must resume
    out, _ = p2.communicate(timeout=240)
    assert p2.returncode == 0, out
    assert f"iters={total_iters}" in out
    # resume proof: the pre-kill iteration dir was reused, not rewritten
    assert os.path.getmtime(pre_kill_iter) == pre_kill_mtime
    assert os.path.getmtime(pre_kill_iter) < kill_time

    run_b = str(tmp_path / "clean")
    p3 = spawn(run_b, total_iters)
    out3, _ = p3.communicate(timeout=240)
    assert p3.returncode == 0, out3

    import pyarrow.dataset as pads

    def final_ranks(run_dir):
        t = pads.dataset(os.path.join(run_dir, "final", "ranks")).to_table(
            columns=["id", "rank"]
        )
        order = np.argsort(t.column("id").to_numpy(zero_copy_only=False))
        return t.column("rank").to_numpy(zero_copy_only=False)[order]

    a, b = final_ranks(run_a), final_ranks(run_b)
    assert len(a) == V == len(b)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_resume_via_file_uri(tmp_path, golden_graphs):
    """run_dir as a file:// URI: every checkpoint touch goes through the
    pyarrow.fs abstraction (object-store-ready resume contract)."""
    g = _graph(tmp_path, golden_graphs, "tri_bridge", "uri_graph")
    uri = "file://" + str(tmp_path / "ckpt_uri")
    partial = pagerank(g, PageRankConfig(max_iters=3), run_dir=uri)
    assert partial.iterations == 3 and not partial.converged
    # stale in-flight tmp dir from a "crash" must be ignored and cleaned
    os.makedirs(str(tmp_path / "ckpt_uri" / "iter_0004.tmp" / "junk"), exist_ok=True)
    resumed = pagerank(g, PageRankConfig(max_iters=100), run_dir=uri)
    assert resumed.converged and resumed.iterations > 3

    g2 = _graph(tmp_path, golden_graphs, "tri_bridge", "uri_clean")
    clean = pagerank(g2, PageRankConfig(max_iters=100))
    a = resumed.ranks_numpy(shard_rows=3)
    b = clean.ranks_numpy(shard_rows=3)
    assert np.array_equal(a, b)
    assert resumed.iterations == clean.iterations
    # artifacts really landed under the URI target via the fs layer
    assert (tmp_path / "ckpt_uri" / "manifest.json").exists()
    assert (tmp_path / "ckpt_uri" / "metrics.parquet").exists()
    assert (tmp_path / "ckpt_uri" / "final" / "ranks").is_dir()


def test_torn_manifest_reads_as_absent(tmp_path):
    """ADVICE r4: a truncated manifest.json (non-atomic object-store
    move interrupted mid-copy) must read as None — resume falls back —
    not crash with JSONDecodeError."""
    from distributed_pagerank_ray.state.checkpoint import _read_json, _write_json_atomic

    p = str(tmp_path / "manifest.json")
    _write_json_atomic(p, {"completed_iter": 3})
    assert _read_json(p) == {"completed_iter": 3}
    with open(p, "w") as f:
        f.write('{"completed_iter":')  # torn mid-copy
    assert _read_json(p) is None

    uri = "file://" + str(tmp_path / "m2.json")
    _write_json_atomic(uri, {"completed_iter": 7})
    assert _read_json(uri) == {"completed_iter": 7}
    with open(str(tmp_path / "m2.json"), "wb") as f:
        f.write(b'{"comple')
    assert _read_json(uri) is None


def test_watch_tails_live_run(tmp_path, golden_graphs):
    """--watch (VERDICT r4 #9): a concurrent watcher must report the
    per-iteration progress (iteration + residual) of a LIVE run and
    exit 0 once final ranks publish."""
    import io
    import threading

    from distributed_pagerank_ray.run import watch

    g = _graph(tmp_path, golden_graphs, "tri_bridge", "watched")
    buf = io.StringIO()
    codes = []
    t = threading.Thread(
        target=lambda: codes.append(
            watch(g.run_dir, poll_s=0.1, idle_timeout_s=60, out=buf)
        )
    )
    t.start()
    res = pagerank(g, PageRankConfig(max_iters=50))
    t.join(timeout=120)
    assert not t.is_alive() and codes == [0]
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert lines[-1]["done"] is True
    iters = [x for x in lines if "iter" in x and "residual" in x]
    assert len(iters) >= res.iterations  # every durable iteration reported
    assert any(x.get("iteration") == res.iterations for x in iters)


def test_watch_idle_timeout(tmp_path):
    import io

    from distributed_pagerank_ray.run import watch

    buf = io.StringIO()
    rc = watch(str(tmp_path / "nowhere"), poll_s=0.05, idle_timeout_s=0.2, out=buf)
    assert rc == 1
    assert json.loads(buf.getvalue().splitlines()[-1])["idle_timeout"] is True
