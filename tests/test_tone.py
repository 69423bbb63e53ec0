"""DominantTone spectral features: brute-FFT parity + edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from distributed_pagerank_ray.functions.multimodal import DominantTone, encode_wav


def _features(sigs):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(sigs)), pa.int64()),
            "payload": pa.array(
                [encode_wav(s.astype(np.int16)) for s in sigs], pa.binary()
            ),
        }
    )
    return DominantTone()(t).to_pandas()


def _brute(s):
    s = s.astype(np.float64)
    n = len(s)
    spec = np.abs(np.fft.rfft(s)) ** 2
    spec[0] = -1.0
    if n % 2 == 0:
        spec[-1] = -1.0
    d = int(spec.argmax())
    spec[d] = -1.0
    s2 = int(spec.argmax())
    nn = s >= 0
    zc = int((nn != np.roll(nn, -1)).sum())
    return d, s2, zc, int(np.abs(s).max())


def test_pure_sine_exact_bin():
    n, k, a = 512, 37, 9000.0
    t = np.arange(n)
    s = np.round(a * np.sin(2 * np.pi * k * t / n))
    out = _features([s]).iloc[0]
    assert out["dominant_bin"] == k
    assert out["peak"] == int(np.abs(s).max())
    # a pure bin-k sine crosses zero 2k times per period
    assert out["n_zero_cross"] == 2 * k


def test_brute_parity_mixed_lengths_one_batch():
    rng = np.random.default_rng(11)
    sigs = []
    for n in [64, 256, 64, 100, 256]:
        t = np.arange(n)
        k1, k2 = rng.integers(2, n // 4, 2)
        s = np.round(
            6000 * np.sin(2 * np.pi * k1 * t / n)
            + 2500 * np.cos(2 * np.pi * k2 * t / n)
            + rng.integers(-50, 50, n)
        )
        sigs.append(s)
    out = _features(sigs)
    for i, s in enumerate(sigs):
        d, s2, zc, pk = _brute(s)
        row = out.iloc[i]
        assert (
            row["dominant_bin"],
            row["second_bin"],
            row["n_zero_cross"],
            row["peak"],
        ) == (d, s2, zc, pk)


def test_square_wave_harmonic_ladder():
    # the gate's closed form: odd-k phase-accumulator square over N=256
    t = np.arange(256)
    for k in [3, 45, 119]:
        s = np.where((k * t) % 256 < 128, 5000, -5000)
        out = _features([s]).iloc[0]
        c3 = (3 * k) % 256
        assert out["dominant_bin"] == k
        assert out["second_bin"] == min(c3, 256 - c3)
        assert out["n_zero_cross"] == 2 * k


def test_short_and_malformed_raise():
    with pytest.raises(ValueError):
        _features([np.array([1.0, -1.0])])  # too short to rank
    bad = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "payload": pa.array([b"nope"], pa.binary())}
    )
    with pytest.raises(ValueError):
        DominantTone()(bad)
