"""AIFF PCM decode conformance: IEEE 80-bit extended float anchors +
big-endian IFF chunk walk + SSND offset honoring.

The 44100 Hz sample-rate encoding 0x400E_AC44_0000_0000_0000 is the
canonical published vector (every AIFF spec appendix carries it), so a
matched encode/decode exponent-bias bug cannot pass.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from distributed_pagerank_ray.functions.multimodal import (
    _float80_decode,
    _float80_encode,
    decode_aiff,
    encode_aiff,
)


def test_float80_published_vectors():
    # canonical AIFF-spec sample rates, big-endian extended format
    assert _float80_encode(44100.0) == bytes.fromhex("400eac44000000000000")
    assert _float80_encode(22050.0) == bytes.fromhex("400dac44000000000000")
    assert _float80_encode(8000.0) == bytes.fromhex("400bfa00000000000000")
    for r in (8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000, 8012.8215):
        assert _float80_decode(_float80_encode(r)) == r
    with pytest.raises(ValueError):
        _float80_decode(bytes.fromhex("7fff8000000000000000"))  # inf
    with pytest.raises(ValueError):
        _float80_decode(b"\x00" * 9)  # wrong length


def test_round_trip_orders_and_offsets():
    s = np.array([0, 1, -1, 32767, -32768, 1234, -999], dtype=np.int16)
    for off in (0, 1, 2, 5):
        for last in (False, True):
            rate, out = decode_aiff(encode_aiff(s, 44100, ssnd_offset=off, comm_last=last))
            assert rate == 44100.0
            assert np.array_equal(out, s), (off, last)


def test_chunk_walk_skips_unknown_and_pads():
    s = np.arange(-5, 6, dtype=np.int16)
    comm = b"COMM" + struct.pack(">I", 18) + struct.pack(">hIh", 1, len(s), 16) + _float80_encode(8000)
    ssnd_payload = struct.pack(">II", 0, 0) + s.astype(">i2").tobytes()
    body = (
        b"AIFF"
        + b"ANNO" + struct.pack(">I", 5) + b"hello" + b"\x00"  # odd + IFF pad
        + b"SSND" + struct.pack(">I", len(ssnd_payload)) + ssnd_payload
        + comm  # COMM after SSND: walk, don't assume layout
    )
    b = b"FORM" + struct.pack(">I", len(body)) + body
    rate, out = decode_aiff(b)
    assert rate == 8000.0 and np.array_equal(out, s)


def test_fail_loudly():
    s = np.array([1, 2, 3], dtype=np.int16)
    good = encode_aiff(s, 8000)
    with pytest.raises(ValueError):
        decode_aiff(good[:-1])  # truncated SSND
    with pytest.raises(ValueError):
        decode_aiff(b"RIFF" + good[4:])  # wrong magic
    # COMM frame count disagreeing with SSND payload must raise
    bad = bytearray(good)
    pos = bad.find(b"COMM") + 8 + 2  # numSampleFrames field
    struct.pack_into(">I", bad, pos, 99)
    with pytest.raises(ValueError):
        decode_aiff(bytes(bad))
    # stereo rejected
    bad = bytearray(good)
    struct.pack_into(">h", bad, bad.find(b"COMM") + 8, 2)
    with pytest.raises(ValueError):
        decode_aiff(bytes(bad))


def test_offset_poison_is_skipped():
    # the encoder writes non-zero junk in the offset gap; a decoder
    # that ignores the SSND offset field reads the junk as samples
    s = np.array([100, -200, 300], dtype=np.int16)
    b = encode_aiff(s, 8000, ssnd_offset=4)
    rate, out = decode_aiff(b)
    assert np.array_equal(out, s)
    naive = np.frombuffer(b[b.find(b"SSND") + 16 : b.find(b"SSND") + 16 + 6], dtype=">i2")
    assert not np.array_equal(naive.astype(np.int16), s)
