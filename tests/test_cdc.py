"""Content-defined chunking: brute-force parity, the planted-motif
residue pins the x_cdc_chunks oracle depends on, batch-split
invariance, and the shift-resistance property that motivates CDC."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from distributed_pagerank_ray.functions.dedup import (
    _CDC_B,
    _CDC_MASK,
    _CDC_W,
    cdc_chunk_stats,
)


def _brute_cuts(b: bytes) -> list[int]:
    """Per-position Python reference: cut after byte i when the Horner
    hash of b[i-7..i] has its low 6 bits zero (i < len-1)."""
    cuts = []
    for i in range(_CDC_W - 1, len(b) - 1):
        h = np.uint64(0)
        for j in range(i - _CDC_W + 1, i + 1):
            h = h * _CDC_B + np.uint64(b[j])
        if (h & _CDC_MASK) == 0:
            cuts.append(i)
    return cuts


def _brute_stats(text: str):
    b = text.encode("utf-8")
    if not b:
        return None
    cuts = _brute_cuts(b)
    edges = [-1] + cuts + [len(b) - 1]
    seg = [y - x for x, y in zip(edges, edges[1:])]
    return (len(b), len(seg), max(seg), round(len(b) / len(seg), 6))


def _run(texts, blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    return cdc_chunk_stats(ds).to_pandas().set_index("doc_id").sort_index()


def test_cdc_matches_brute_force_and_block_invariance(ray_session):
    rng = np.random.default_rng(3)
    texts = [
        "",  # absent from output
        "short",  # < window: one chunk
        "exactly8",  # == window: the single hash position is the last byte
        "ünïcødé multibyte ünïcødé multibyte ünïcødé",  # utf-8 > codepoints
    ] + [
        "".join(chr(c) for c in rng.integers(32, 127, rng.integers(5, 600)))
        for _ in range(30)
    ]
    got = _run(texts)
    got17 = _run(texts, blocks=17)
    assert got.values.tolist() == got17.values.tolist()
    want = {i: _brute_stats(x) for i, x in enumerate(texts) if x}
    assert sorted(got.index) == sorted(want)
    for i, (nb, nc, mx, avg) in want.items():
        row = got.loc[i]
        assert (row["n_bytes"], row["n_chunks"], row["max_chunk"]) == (nb, nc, mx)
        assert row["avg_chunk"] == avg


def test_cdc_oracle_motif_residues():
    """Pin the boundary-residue sets the x_cdc_chunks SQL oracle has
    baked in: if the hash constants or motifs drift, this fails before
    the driver gate does."""
    motifs = {
        b"brpoig8f1cbfno6b9m80o2ra": [8],
        b"xk87au5bhxtpdp ff5e8ii49kq71": [24],
        b"pe29gd8afpk054nzdkyayq3s195jmsnd": [4],
        b"8dudd467kd6fleepzh pcf0 7uqnupqzit3u": [17, 21, 24],
    }
    for m, res in motifs.items():
        L = len(m)
        cuts = _brute_cuts(m * 3)
        got = sorted({i % L for i in cuts if _CDC_W - 1 <= i < _CDC_W - 1 + L})
        assert got == res, m
        # and periodicity really holds: every cut's residue is in the set
        assert {i % L for i in cuts} <= set(res), m


def test_cdc_shift_resistance(ray_session):
    """Inserting one byte near the front must re-synchronize within
    one window: all boundaries past the insertion shift by exactly +1
    (same CONTENT cut points), instead of being recomputed from a new
    offset grid — the property fixed-size chunking lacks."""
    rng = np.random.default_rng(9)
    base = bytes(rng.integers(32, 127, 4000, dtype=np.uint8))
    ins = 100
    shifted = base[:ins] + b"X" + base[ins:]
    c0 = [i for i in _brute_cuts(base) if i > ins + _CDC_W]
    c1 = [i for i in _brute_cuts(shifted) if i > ins + _CDC_W + 1]
    assert c0 and [i + 1 for i in c0] == c1
