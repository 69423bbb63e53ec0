"""G.711 mu-law WAV decode conformance: spec anchors + RIFF chunk walk.

The LUT anchors are the published G.711 values (0x00 -> -32124,
0x80 -> +32124, 0xFF/0x7F -> 0, 0xFE -> +8), so a matched
encoder/decoder sign or bias bug cannot pass.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from distributed_pagerank_ray.functions.multimodal import (
    _mulaw_decode_lut,
    decode_wav_mulaw,
    encode_wav_mulaw,
)


def test_spec_anchor_values():
    lut = _mulaw_decode_lut()
    assert lut[0x00] == -32124  # most-negative (u=0xFF: seg 7, mant 15)
    assert lut[0x80] == 32124  # most-positive
    assert lut[0xFF] == 0 and lut[0x7F] == 0  # both zero codes
    assert lut[0xFE] == 8  # u=0x01: ((1*8+132)<<0)-132
    assert lut[0xF0] == 120  # u=0x0F: ((15*8+132)<<0)-132
    assert lut[0x70] == -120
    # sign symmetry: byte b and byte b|0x80 decode to opposite values
    assert (lut[:128] == -lut[128:]).all()
    # monotone within the positive half (codes 0x80..0xFF decode
    # non-increasing as the byte increases toward 0xFF)
    pos = lut[0x80:0x100]
    assert (np.diff(pos) <= 0).all() and pos[0] == 32124 and pos[-1] == 0


def test_chunk_walk_any_order_and_unknown_chunks():
    raw = bytes((i * 37 + 11) % 256 for i in range(33))  # odd length
    lut = _mulaw_decode_lut()
    want = lut[np.frombuffer(raw, np.uint8)]
    rate, lin = decode_wav_mulaw(encode_wav_mulaw(raw, 16000))
    assert rate == 16000 and (lin == want).all()
    # hand-build: LIST chunk first, fmt AFTER data, odd-size unknown
    # chunk with its pad byte — the walk must skip all of it
    fmt = struct.pack("<HHIIHHH", 7, 1, 8000, 8000, 1, 8, 0)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
        + b"data" + struct.pack("<I", len(raw)) + raw + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, lin = decode_wav_mulaw(b)
    assert rate == 8000 and (lin == want).all()


def test_fail_loudly():
    raw = bytes(range(16))
    good = encode_wav_mulaw(raw)
    with pytest.raises(ValueError):
        decode_wav_mulaw(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        decode_wav_mulaw(good[:-3])  # truncated data chunk
    with pytest.raises(ValueError):  # PCM tag rejected here
        bad = bytearray(good)
        bad[20] = 1  # format tag 7 -> 1
        decode_wav_mulaw(bytes(bad))
    with pytest.raises(ValueError):  # stereo rejected
        bad = bytearray(good)
        bad[22] = 2
        decode_wav_mulaw(bytes(bad))


def test_actor_pool_stage(ray_session):
    import ray.data

    from distributed_pagerank_ray.functions.multimodal import decode_wav_mulaw_ds

    lut = _mulaw_decode_lut()
    items = []
    wants = {}
    for i in range(30):
        n = 16 + i % 17
        raw = ((37 * i + 11 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
        items.append({"doc_id": i, "payload": encode_wav_mulaw(raw.tobytes(), 8000)})
        lin = lut[raw].astype(np.int64)
        wants[i] = (n, round(float(np.abs(lin).sum()) / n, 6), int(np.abs(lin).max()), int(lin[0]))
    out = (
        decode_wav_mulaw_ds(ray.data.from_items(items), concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 30
    for _, row in out.iterrows():
        n, mean_abs, peak, first = wants[row["doc_id"]]
        assert row["n_samples"] == n and row["sample_rate"] == 8000
        assert row["mean_abs"] == mean_abs
        assert row["peak"] == peak and row["first_lin"] == first


# ------------------------------------------------------------ Sun AU sibling


def test_au_round_trip_and_hazards():
    from distributed_pagerank_ray.functions.multimodal import (
        decode_au,
        encode_au,
    )

    lut = _mulaw_decode_lut()
    raw = bytes((i * 37 + 5) % 256 for i in range(33))
    # mu-law with annotation: offset must skip the poison bytes
    enc, rate, lin = decode_au(encode_au(raw, 1, 8000, annotation=b"\x2e\x73\x6e\x64x"))
    assert enc == 1 and rate == 8000
    assert (lin == lut[np.frombuffer(raw, np.uint8)]).all()
    # PCM16 big-endian with unknown size
    s = np.array([1, -1, 256, -256, 32767, -32768], np.int16)
    enc, rate, lin = decode_au(encode_au(s, 3, 16000, unknown_size=True))
    assert enc == 3 and rate == 16000 and (lin == s).all()
    # a little-endian misread of sample 256 (0x0100 BE) would give 1
    assert lin[2] == 256
    # known size smaller than payload tail: must truncate to size
    b = encode_au(s, 3, 16000)
    enc, rate, lin = decode_au(b + b"\x00\x00")  # trailing junk beyond size
    assert (lin == s).all()


def test_au_fail_loudly():
    import struct

    from distributed_pagerank_ray.functions.multimodal import decode_au, encode_au

    s = np.array([1, 2, 3], np.int16)
    good = encode_au(s, 3, 8000)
    with pytest.raises(ValueError):
        decode_au(good[:-1])  # truncated vs declared size
    with pytest.raises(ValueError):
        decode_au(b"RIFF" + good[4:])
    bad = bytearray(good)
    struct.pack_into(">I", bad, 12, 99)  # unsupported encoding
    with pytest.raises(ValueError):
        decode_au(bytes(bad))
    bad = bytearray(good)
    struct.pack_into(">I", bad, 4, 10)  # offset below header size
    with pytest.raises(ValueError):
        decode_au(bytes(bad))
