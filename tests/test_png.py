"""PNG decode conformance: spec-pinned unfiltering + encoder roundtrip.

test_hand_filtered_scanlines builds the IDAT byte stream BY HAND with
filtered values computed from the PNG spec (RFC 2083 §6) in the test
source — so a matched encoder/decoder bug (e.g. both using a wrong
Paeth) cannot pass; the decoder is checked against the spec itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from distributed_pagerank_ray.functions.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_png_gray8,
    encode_png,
)


def _wrap(w: int, h: int, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_hand_filtered_scanlines():
    # 4x5 image, one scanline per filter type (None, Sub, Up, Average,
    # Paeth), filtered bytes computed by hand from the spec:
    #   row0 raw  10  20  30  40      f=0 -> 10 20 30 40
    #   row1 raw  15  25  35  45      f=1 Sub: x - left        -> 15 10 10 10
    #   row2 raw  20  18  250  5      f=2 Up: x - up           -> 5 249(-7) 215 216(-40)
    #   row3 raw  30  40  50  60      f=3 Avg: x - (l+up)//2   -> 30-10=20, 40-(30+18)//2=16,
    #                                    50-(40+250)//2=-95->161, 60-(50+5)//2=33
    #   row4 raw   7   8   9  10      f=4 Paeth(l,up,ul):
    #     x0: pred=paeth(0,30,0)=30   -> 7-30 = -23 -> 233
    #     x1: pred=paeth(7,40,30)     p=17 pa=10 pb=23 pc=13 -> a=7   -> 8-7  = 1
    #     x2: pred=paeth(8,50,40)     p=18 pa=10 pb=32 pc=22 -> a=8   -> 9-8  = 1
    #     x3: pred=paeth(9,60,50)     p=19 pa=10 pb=41 pc=31 -> a=9   -> 10-9 = 1
    want = np.array(
        [
            [10, 20, 30, 40],
            [15, 25, 35, 45],
            [20, 18, 250, 5],
            [30, 40, 50, 60],
            [7, 8, 9, 10],
        ],
        dtype=np.uint8,
    )
    scan = bytes(
        [0, 10, 20, 30, 40]
        + [1, 15, 10, 10, 10]
        + [2, 5, 249, 215, 216]
        + [3, 20, 16, 161, 33]
        + [4, 233, 1, 1, 1]
    )
    got = decode_png_gray8(_wrap(4, 5, scan))
    assert (got == want).all(), got


def test_roundtrip_all_shapes():
    rng = np.random.default_rng(42)
    for _ in range(25):
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        assert (decode_png_gray8(encode_png(img)) == img).all()


def test_malformed_payloads_raise():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    good = encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_gray8(b"JFIF" + good)
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[-6] ^= 0xFF  # corrupt IEND CRC... corrupt IDAT instead
        # flip a byte inside the IDAT chunk data
        idx = good.index(b"IDAT") + 5
        bad = bytearray(good)
        bad[idx] ^= 0xFF
        decode_png_gray8(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png_gray8(good[:30])
    # unsupported profile: 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad16 = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="grayscale"):
        decode_png_gray8(bad16)


def test_dataset_stage():
    import ray.data
    import pyarrow as pa

    from distributed_pagerank_ray.functions.multimodal import decode_png

    imgs = [np.full((2, 3), i * 7 % 256, dtype=np.uint8) for i in range(8)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "payload": pa.array([encode_png(m) for m in imgs], pa.binary()),
            }
        )
    )
    out = decode_png(ds).to_pandas().sort_values("doc_id")
    assert list(out["mean_gray"]) == [float(i * 7 % 256) for i in range(8)]
    assert list(out["width"]) == [3] * 8 and list(out["height"]) == [2] * 8
