import json

import numpy as np

from distributed_pagerank_ray.config import RunConfig
from distributed_pagerank_ray.pipelines.registry import ALGORITHMS, JobConfig, run
from oracle.pagerank_oracle import pagerank_oracle

FIXTURE = """# golden chain
0 1
1 2
2 3
3 4
"""


def test_run_pagerank_from_edgelist(tmp_path):
    p = tmp_path / "chain.txt"
    p.write_text(FIXTURE)
    cfg = JobConfig(
        algo="pagerank",
        edgelist_txt=str(p),
        run_dir=str(tmp_path / "run"),
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )
    out = run(cfg)
    assert out["converged"] and out["status"].startswith("Converged after")
    _, it, _, _ = pagerank_oracle(np.array([0, 1, 2, 3]), np.array([1, 2, 3, 4]))
    assert out["iterations"] == it
    assert out["n_vertices"] == 5 and out["n_edges"] == 4
    assert json.dumps(out)  # summary is JSON-able


def test_run_cc_and_triangles(tmp_path):
    p = tmp_path / "two.txt"
    p.write_text("0 1\n1 0\n2 3\n3 2\n")
    base = JobConfig(
        algo="cc",
        edgelist_txt=str(p),
        run_dir=str(tmp_path / "run_cc"),
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )
    out = run(base)
    assert out["n_components"] == 2
    tri = JobConfig(
        algo="triangles",
        edgelist_txt=str(p),
        run_dir=str(tmp_path / "run_tri"),
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )
    assert run(tri)["n_triangles"] == 0


def test_run_scc(tmp_path):
    p = tmp_path / "cyc.txt"
    # 0<->1 is one SCC; 2->3 are singletons
    p.write_text("0 1\n1 0\n2 3\n")
    cfg = JobConfig(
        algo="scc",
        edgelist_txt=str(p),
        run_dir=str(tmp_path / "run_scc"),
        run_cfg=RunConfig(num_partitions=2, shard_rows=3),
    )
    out = run(cfg)
    assert out["n_sccs"] == 3  # {0,1}, {2}, {3}
    import pyarrow.dataset as pads

    t = pads.dataset(out["labels_path"]).to_table().to_pydict()
    lab = dict(zip(t["id"], t["scc"]))
    # ids are minted dense ranks of the sorted keys 0,1,2,3 -> same order
    assert lab[0] == lab[1] and lab[2] != lab[3] and lab[2] != lab[0]


def test_algorithms_list():
    assert set(ALGORITHMS) == {"pagerank", "cc", "lpa", "triangles", "scc"}


def test_supervised_restart_after_crash(tmp_path):
    """--supervise (round-5): the job-level failover analog of the
    reference's bully election — a crashed driver is relaunched and the
    relaunch completes the run (resume via the checkpoint manifest).
    The child REALLY dies (os._exit via the DPR_TEST_CRASH_ONCE hook);
    the supervisor's second attempt runs to convergence."""
    import os
    import subprocess
    import sys

    p = tmp_path / "chain.txt"
    p.write_text(FIXTURE)
    marker = str(tmp_path / "crashed_once")
    env = dict(os.environ, DPR_TEST_CRASH_ONCE=marker, RAY_ADDRESS="local")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "distributed_pagerank_ray.run",
            "--supervise",
            "--max-restarts",
            "2",
            "--algo",
            "pagerank",
            "--edgelist-txt",
            str(p),
            "--run-dir",
            str(tmp_path / "run"),
            "--num-cpus",
            "2",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(marker)  # first attempt really crashed
    assert '"supervise": "restarting"' in proc.stderr
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["converged"] and summary["n_vertices"] == 5


def test_supervise_gives_up(tmp_path):
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "distributed_pagerank_ray.run",
            "--supervise",
            "--max-restarts",
            "1",
            "--algo",
            "pagerank",
            "--edgelist-txt",
            str(tmp_path / "missing.txt"),
            "--run-dir",
            str(tmp_path / "run"),
            "--num-cpus",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode != 0
    assert '"supervise": "gave_up"' in proc.stderr


def test_extract_concurrency_never_saturates_cluster():
    # a fixed actor pool claiming EVERY cluster CPU starves the
    # upstream ReadParquet task forever (deadlock seen at num_cpus=8
    # with the old fixed default 8): the resolver must always leave
    # >= 2 CPUs of headroom on clusters that have them.
    from distributed_pagerank_ray.pipelines.registry import (
        _resolve_extract_concurrency,
    )

    assert _resolve_extract_concurrency(None, 8) == 6
    assert _resolve_extract_concurrency(None, 32) == 24
    assert _resolve_extract_concurrency(8, 8) == 6  # explicit ask capped
    assert _resolve_extract_concurrency(4, 32) == 4  # explicit ask kept
    assert _resolve_extract_concurrency(None, 2) == 1
    assert _resolve_extract_concurrency(None, 1) == 1
    for ncpu in range(3, 64):
        assert _resolve_extract_concurrency(None, ncpu) <= ncpu - 2
        assert _resolve_extract_concurrency(100, ncpu) <= ncpu - 2
