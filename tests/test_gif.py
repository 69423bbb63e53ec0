"""GIF decode conformance: spec-pinned LZW + framing + roundtrip.

test_hand_packed_lzw_stream decodes a code stream whose BYTES were
computed by hand from the GIF89a spec (appendix F: LSB-first
variable-width packing, CLEAR/EOI protocol, the KwKwK rule) in the
test source — so a matched encoder/decoder bug (e.g. both packing
MSB-first) cannot pass; the decoder is checked against the spec
itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from distributed_pagerank_ray.functions.multimodal import (
    _lzw_compress_gif,
    _lzw_decompress_gif,
    decode_gif_gray8,
    encode_gif,
)


def test_hand_packed_lzw_stream():
    # pixels [0,0,0] with min_code_size=8: encoder emits
    # CLEAR(256), 0, 258, EOI(257) at 9 bits each, LSB-first.
    # 258 is the KwKwK case — it names the not-yet-complete entry
    # (prev + prev[0]) — so this stream also pins that rule.
    # Hand-packing the 36 bits:
    #   code 256 = 0b100000000 -> global bits 0-8   = 0,0,0,0,0,0,0,0,1
    #   code   0               -> global bits 9-17  = all 0
    #   code 258 = 0b100000010 -> global bits 18-26 = 0,1,0,0,0,0,0,0,1
    #   code 257 = 0b100000001 -> global bits 27-35 = 1,0,0,0,0,0,0,0,1
    #   byte0 = bits 0-7   = 0x00
    #   byte1 = bits 8-15  = 0x01   (bit 8 set)
    #   byte2 = bits 16-23 = 0x08   (bit 19 set -> position 3)
    #   byte3 = bits 24-31 = 0x0C   (bits 26,27 -> positions 2,3)
    #   byte4 = bits 32-35 = 0x08   (bit 35 set -> position 3)
    hand = bytes([0x00, 0x01, 0x08, 0x0C, 0x08])
    assert _lzw_decompress_gif(hand, 8, 3).tolist() == [0, 0, 0]
    # and the encoder reproduces exactly the hand-packed stream
    assert _lzw_compress_gif(np.zeros(3, np.uint8)) == hand


def test_lzw_width_growth_and_table_reset_roundtrip():
    # enough distinct 2-grams to push the table through every width
    # bump (9->10->11->12) and past 4096 (forcing a mid-stream CLEAR):
    # a repetitive raster compresses through deep dictionary chains.
    img = np.tile(np.arange(64, dtype=np.uint8), 4096).reshape(512, 512)
    assert (decode_gif_gray8(encode_gif(img)) == img).all()
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (101, 67)).astype(np.uint8)
    assert (decode_gif_gray8(encode_gif(noise)) == noise).all()


def test_roundtrip_small_shapes():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (1, 5), (7, 1), (4, 5), (17, 23)]:
        for img in (
            rng.integers(0, 256, (h, w)).astype(np.uint8),
            np.zeros((h, w), np.uint8),
            np.full((h, w), 255, np.uint8),
        ):
            out = decode_gif_gray8(encode_gif(img))
            assert out.shape == (h, w)
            assert (out == img).all()


def test_extension_blocks_are_skipped():
    # splice a Graphic Control Extension (0x21 0xF9, 4-byte block)
    # between the color table and the image descriptor — decoders must
    # walk extensions by sub-block framing (GIF89a §23).
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    b = encode_gif(img)
    desc_at = 13 + 3 * 256  # header+LSD, then the full 256-entry GCT
    assert b[desc_at] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = b[:desc_at] + gce + b[desc_at:]
    assert (decode_gif_gray8(spliced) == img).all()


def test_fail_loudly():
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    good = encode_gif(img)
    with pytest.raises(ValueError):  # wrong magic
        decode_gif_gray8(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):  # truncated mid image data
        decode_gif_gray8(good[:-6])
    with pytest.raises(ValueError):  # interlace flag set
        broken = bytearray(good)
        broken[13 + 3 * 256 + 9] |= 0x40
        decode_gif_gray8(bytes(broken))
    with pytest.raises(ValueError):  # non-gray palette
        broken = bytearray(good)
        broken[13 + 3 * 7 + 1] ^= 0xFF  # G channel of palette entry 7
        decode_gif_gray8(bytes(broken))
    with pytest.raises(ValueError):  # LZW code beyond table
        # codes CLEAR(256), 300 (not yet assigned) at 9 bits
        bad = bytearray()
        acc = 256 | (300 << 9)
        for _ in range(3):
            bad.append(acc & 0xFF)
            acc >>= 8
        _lzw_decompress_gif(bytes(bad), 8, 4)
    with pytest.raises(ValueError):  # raster short of w*h (EOI too early)
        # CLEAR, 5, EOI at 9 bits but 4 pixels promised
        acc = 256 | (5 << 9) | (257 << 18)
        early = bytes([(acc >> (8 * k)) & 0xFF for k in range(4)])
        _lzw_decompress_gif(early, 8, 4)


def test_actor_pool_stage(ray_session):
    import ray.data

    from distributed_pagerank_ray.functions.multimodal import decode_gif

    rows = []
    for i in range(40):
        w, h = 4 + i % 5, 3 + i % 4
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        img = ((11 * i + 5 * x[None, :] + 7 * y[:, None]) % 256).astype(np.uint8)
        rows.append({"doc_id": i, "payload": encode_gif(img), "want_mean": img.mean()})
    ds = ray.data.from_items([{k: r[k] for k in ("doc_id", "payload")} for r in rows])
    out = decode_gif(ds, concurrency=2).to_pandas().sort_values("doc_id")
    assert len(out) == 40
    for r, (_, got) in zip(rows, out.iterrows()):
        assert got["width"] == 4 + r["doc_id"] % 5
        assert got["height"] == 3 + r["doc_id"] % 4
        assert abs(got["mean_gray"] - round(float(r["want_mean"]), 6)) < 1e-9
