import numpy as np
import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


# Golden fixture graphs (FIXTURES.md §3): name -> (src, dst) edge lines
# (duplicates / self-loops intentionally present where noted).
GOLDEN_GRAPHS = {
    "chain5": ([0, 1, 2, 3], [1, 2, 3, 4]),
    "cycle4": ([0, 1, 2, 3], [1, 2, 3, 0]),
    "star8": (list(range(1, 9)), [0] * 8),
    "twocomp": ([0, 1, 2, 3], [1, 0, 3, 2]),
    "selfdup": ([0, 0, 1, 2], [1, 1, 0, 2]),
    "tri_bridge": (
        [0, 1, 0, 2, 1, 2, 2, 3, 2, 4, 3, 4],
        [1, 0, 2, 0, 2, 1, 3, 2, 4, 2, 4, 3],
    ),
    "k4": (
        [a for a in range(4) for b in range(4) if a != b],
        [b for a in range(4) for b in range(4) if a != b],
    ),
}


@pytest.fixture(scope="session")
def golden_graphs():
    return {k: (np.array(s, dtype=np.int64), np.array(d, dtype=np.int64)) for k, (s, d) in GOLDEN_GRAPHS.items()}


@pytest.fixture(scope="session")
def tiny_corpus():
    """Cached tiny pages corpus (64 pages)."""
    from distributed_pagerank_ray.sources.corpus import corpus_dir

    return corpus_dir("tiny")
