import numpy as np
import pyarrow as pa
import pytest

import ray.data

from distributed_pagerank_ray.functions.multimodal import (
    ByteFeatures,
    FrameSampleStub,
    ImageDecodeStub,
    attach_binary_from_text,
    byte_features,
)

DOCS = [
    {"doc_id": 0, "text": "aaaa"},
    {"doc_id": 1, "text": "hello world, some bytes here"},
    {"doc_id": 2, "text": ""},
]


def test_attach_binary():
    t = pa.table({"doc_id": [0], "text": ["héllo"]})
    out = attach_binary_from_text(t)
    assert out.column("payload").to_pylist() == ["héllo".encode("utf-8")]


def test_byte_features_pipeline():
    ds = ray.data.from_items(DOCS)
    out = {r["doc_id"]: r for r in byte_features(ds, concurrency=2).take_all()}
    assert out[0]["n_bytes"] == 4
    assert out[0]["entropy"] == 0.0  # single repeated byte
    assert out[1]["n_bytes"] == len(DOCS[1]["text"].encode())
    assert out[1]["entropy"] > 0
    assert out[2]["n_bytes"] == 0
    # histogram sums to n_bytes
    assert sum(out[1][f"h{j:02d}"] for j in range(16)) == out[1]["n_bytes"]


def test_image_decode_stub_gates():
    t = attach_binary_from_text(pa.table({"doc_id": [0], "text": ["xyz"]}))
    with pytest.raises(NotImplementedError):
        ImageDecodeStub()(t)
    out = ImageDecodeStub(fake_decode=True)(t)
    row = out.to_pylist()[0]
    assert row["channels"] == 3 and 16 <= row["width"] < 256
    # deterministic
    out2 = ImageDecodeStub(fake_decode=True)(t)
    assert out.equals(out2)


def test_frame_sample_stub():
    t = attach_binary_from_text(pa.table({"doc_id": [7], "text": ["abcdefgh"]}))
    out = FrameSampleStub(n_frames=4)(t)
    rows = out.to_pylist()
    assert [r["frame"] for r in rows] == [0, 1, 2, 3]
    assert b"".join(r["frame_bytes"] for r in rows) == b"abcdefgh"


def test_actor_pool_decode_on_dataset():
    ds = ray.data.from_items(DOCS).map_batches(
        lambda t: attach_binary_from_text(t), batch_format="pyarrow"
    )
    out = ds.map_batches(
        ImageDecodeStub,
        fn_constructor_kwargs={"fake_decode": True},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=2,
    ).take_all()
    assert len(out) == 3 and all(r["channels"] == 3 for r in out)


def test_ppm_decode_roundtrip_and_malformed():
    import numpy as np
    import pyarrow as pa
    import pytest

    from distributed_pagerank_ray.functions.multimodal import PpmDecode, encode_ppm

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for h, w in [(1, 1), (5, 7), (16, 9)]]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([encode_ppm(i) for i in imgs], pa.binary()),
        }
    )
    out = PpmDecode()(t)
    assert out.column("width").to_pylist() == [1, 7, 9]
    assert out.column("height").to_pylist() == [1, 5, 16]
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        got = out.column(name).to_pylist()
        want = [round(float(i.reshape(-1, 3)[:, c].mean()), 6) for i in imgs]
        assert got == want
    with pytest.raises(ValueError):
        PpmDecode()(pa.table({"payload": pa.array([b"JFIF garbage"], pa.binary())}))
    with pytest.raises(ValueError):
        PpmDecode()(  # truncated pixel data
            pa.table({"payload": pa.array([b"P6\n4 4\n255\nxx"], pa.binary())})
        )


def test_pgm_decode_roundtrip_and_malformed():
    import numpy as np
    import pyarrow as pa
    import pytest

    from distributed_pagerank_ray.functions.multimodal import PgmDecode, encode_pgm

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (h, w)).astype(np.uint8) for h, w in [(1, 1), (4, 9), (13, 2)]]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([encode_pgm(i) for i in imgs], pa.binary()),
        }
    )
    out = PgmDecode()(t)
    assert out.column("width").to_pylist() == [1, 9, 2]
    assert out.column("height").to_pylist() == [1, 4, 13]
    assert out.column("mean_gray").to_pylist() == [round(float(i.mean()), 6) for i in imgs]
    assert out.column("min_gray").to_pylist() == [int(i.min()) for i in imgs]
    assert out.column("max_gray").to_pylist() == [int(i.max()) for i in imgs]
    with pytest.raises(ValueError):
        PgmDecode()(pa.table({"payload": pa.array([b"P6\n1 1\n255\nabc"], pa.binary())}))
    with pytest.raises(ValueError):
        PgmDecode()(  # truncated pixel data
            pa.table({"payload": pa.array([b"P5\n4 4\n255\nxx"], pa.binary())})
        )


def test_wav_decode_roundtrip_and_malformed():
    import numpy as np
    import pyarrow as pa
    import pytest

    from distributed_pagerank_ray.functions.multimodal import WavDecode, encode_wav

    rng = np.random.RandomState(3)
    sigs = [rng.randint(-32768, 32768, n).astype(np.int16) for n in (1, 77, 500)]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array(
                [encode_wav(s, sample_rate=r) for s, r in zip(sigs, (8000, 16000, 44100))],
                pa.binary(),
            ),
        }
    )
    out = WavDecode()(t)
    assert out.column("sample_rate").to_pylist() == [8000, 16000, 44100]
    assert out.column("n_samples").to_pylist() == [len(s) for s in sigs]
    assert out.column("mean_abs").to_pylist() == [
        round(float(np.abs(s.astype(np.float64)).mean()), 6) for s in sigs
    ]
    assert out.column("peak").to_pylist() == [int(np.abs(s.astype(np.int64)).max()) for s in sigs]
    with pytest.raises(ValueError):
        WavDecode()(pa.table({"payload": pa.array([b"OggS junk"], pa.binary())}))
    with pytest.raises(ValueError):  # truncated data chunk
        good = encode_wav(sigs[1])
        WavDecode()(pa.table({"payload": pa.array([good[:-3]], pa.binary())}))


def test_y4m_frame_means_roundtrip_and_malformed():
    import numpy as np
    import pyarrow as pa
    import pytest

    from distributed_pagerank_ray.functions.multimodal import Y4mFrameMeans, encode_y4m

    rng = np.random.RandomState(7)
    vids = [rng.randint(0, 256, (n, h, w)).astype(np.uint8) for n, h, w in [(1, 1, 1), (3, 4, 6), (5, 2, 9)]]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([encode_y4m(v) for v in vids], pa.binary()),
        }
    )
    out = Y4mFrameMeans()(t)
    assert out.column("width").to_pylist() == [1, 6, 9]
    assert out.column("height").to_pylist() == [1, 4, 2]
    assert out.column("n_frames").to_pylist() == [1, 3, 5]
    assert out.column("mean_y_first").to_pylist() == [
        round(float(v[0].astype(np.float64).mean()), 6) for v in vids
    ]
    assert out.column("mean_y_last").to_pylist() == [
        round(float(v[-1].astype(np.float64).mean()), 6) for v in vids
    ]
    with pytest.raises(ValueError):
        Y4mFrameMeans()(pa.table({"payload": pa.array([b"RIFF not video"], pa.binary())}))
    with pytest.raises(ValueError):  # truncated final frame
        good = encode_y4m(vids[1])
        Y4mFrameMeans()(pa.table({"payload": pa.array([good[:-5]], pa.binary())}))
    with pytest.raises(ValueError):  # chroma-subsampled streams are honest errors
        hdr = b"YUV4MPEG2 W2 H2 F25:1 Ip A0:0 C420\n" + b"FRAME\n" + bytes(6)
        Y4mFrameMeans()(pa.table({"payload": pa.array([hdr], pa.binary())}))


def test_pnm_trailing_bytes_rejected():
    """ADVICE r4: trailing bytes (e.g. a trailing newline from another
    encoder) must raise, not silently shift the pixel window."""
    import numpy as np
    import pytest

    from distributed_pagerank_ray.functions.multimodal import (
        PgmDecode,
        PpmDecode,
        encode_pgm,
        encode_ppm,
    )
    import pyarrow as pa

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    for enc, dec in ((encode_pgm(gray), PgmDecode()), (encode_ppm(rgb), PpmDecode())):
        ok = pa.table({"payload": pa.array([enc], pa.binary())})
        dec(ok)  # clean payload decodes
        bad = pa.table({"payload": pa.array([enc + b"\n"], pa.binary())})
        with pytest.raises(ValueError, match="length mismatch"):
            dec(bad)
        trunc = pa.table({"payload": pa.array([enc[:-1]], pa.binary())})
        with pytest.raises(ValueError, match="length mismatch"):
            dec(trunc)


def test_bmp_roundtrip_both_orientations_and_padding():
    from distributed_pagerank_ray.functions.multimodal import BmpDecode, encode_bmp

    rng = np.random.default_rng(5)
    # w=5 -> stride 16 (1 pad byte); w=6 -> stride 20 (2); w=4 -> stride 12 (0)
    for w, h in ((5, 3), (6, 4), (4, 2), (7, 1)):
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for td in (False, True):
            enc = encode_bmp(rgb, top_down=td, pad_byte=0xAB)  # nonzero pad must be skipped
            out = BmpDecode()(pa.table({"payload": pa.array([enc], pa.binary())}))
            assert out.column("width")[0].as_py() == w
            assert out.column("height")[0].as_py() == h
            assert out.column("mean_r")[0].as_py() == round(float(rgb[:, :, 0].mean()), 6)
            assert out.column("mean_g")[0].as_py() == round(float(rgb[:, :, 1].mean()), 6)
            assert out.column("mean_b")[0].as_py() == round(float(rgb[:, :, 2].mean()), 6)
            # orientation witness: TOP row regardless of storage order
            assert out.column("top_g")[0].as_py() == round(float(rgb[0, :, 1].mean()), 6)


def test_bmp_malformed_rejected():
    from distributed_pagerank_ray.functions.multimodal import BmpDecode, encode_bmp

    rgb = np.arange(45, dtype=np.uint8).reshape(3, 5, 3)
    enc = encode_bmp(rgb)
    dec = BmpDecode()
    with pytest.raises(ValueError, match="length mismatch"):
        dec(pa.table({"payload": pa.array([enc + b"\x00"], pa.binary())}))
    with pytest.raises(ValueError, match="length mismatch"):
        dec(pa.table({"payload": pa.array([enc[:-1]], pa.binary())}))
    with pytest.raises(ValueError, match="not a BMP"):
        dec(pa.table({"payload": pa.array([b"PNG" + enc], pa.binary())}))
    # compressed (BI_RLE8) and non-24bpp headers are honest errors
    import struct

    bad_bpp = bytearray(enc)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="24-bit"):
        dec(pa.table({"payload": pa.array([bytes(bad_bpp)], pa.binary())}))
    bad_comp = bytearray(enc)
    struct.pack_into("<I", bad_comp, 30, 1)
    with pytest.raises(ValueError, match="24-bit"):
        dec(pa.table({"payload": pa.array([bytes(bad_comp)], pa.binary())}))


def test_tiff_roundtrip_orders_photometrics_strips():
    from distributed_pagerank_ray.functions.multimodal import TiffDecode, encode_tiff

    rng = np.random.default_rng(3)
    dec = TiffDecode()
    for big_endian in (False, True):
        for photometric in (0, 1):
            for rps in (1, 2, 3, 7):
                g = rng.integers(0, 256, (5, 4), dtype=np.uint8)
                enc = encode_tiff(
                    g, big_endian=big_endian, photometric=photometric, rows_per_strip=rps
                )
                r = dec(pa.table({"payload": pa.array([enc], pa.binary())}))
                lum = g.astype(np.int64) if photometric == 1 else 255 - g.astype(np.int64)
                assert r["width"][0].as_py() == 4
                assert r["height"][0].as_py() == 5
                assert r["n_strips"][0].as_py() == -(-5 // rps)
                assert r["byte_order"][0].as_py() == ("MM" if big_endian else "II")
                assert r["mean_lum"][0].as_py() == round(float(lum.mean()), 6)
                assert r["min_lum"][0].as_py() == lum.min()
                assert r["max_lum"][0].as_py() == lum.max()
                assert r["top_lum"][0].as_py() == round(float(lum[0].mean()), 6)


def test_tiff_strip_offsets_honored_not_file_order():
    """encode_tiff writes strips back-to-front; a decoder walking file
    order instead of StripOffsets sees a row-permuted image. top_lum
    is the witness (whole-image stats are permutation-blind)."""
    from distributed_pagerank_ray.functions.multimodal import TiffDecode, encode_tiff

    g = np.zeros((4, 4), dtype=np.uint8)
    g[0] = 200  # only the top rows are bright
    g[1] = 100
    enc = encode_tiff(g, rows_per_strip=2)  # 2 strips, reversed in file
    r = TiffDecode()(pa.table({"payload": pa.array([enc], pa.binary())}))
    assert r["top_lum"][0].as_py() == 200.0
    # file-order assembly would put the dark strip first -> top_lum 0
    assert r["mean_lum"][0].as_py() == round((200 * 4 + 100 * 4) / 16, 6)


def test_tiff_malformed_rejected():
    from distributed_pagerank_ray.functions.multimodal import TiffDecode, encode_tiff

    dec = TiffDecode()
    enc = encode_tiff(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a TIFF"):
        dec(pa.table({"payload": pa.array([b"XX" + enc[2:]], pa.binary())}))
    with pytest.raises(ValueError, match="truncated"):
        dec(pa.table({"payload": pa.array([enc[:30]], pa.binary())}))
    with pytest.raises(ValueError):  # strip data missing
        dec(pa.table({"payload": pa.array([enc[:80]], pa.binary())}))
    import struct

    comp = bytearray(enc)
    # Compression tag is the 4th entry (tag 259): value at its +8
    off = 8 + 2 + 12 * 3 + 8
    struct.pack_into("<H", comp, off, 5)  # LZW
    with pytest.raises(ValueError, match="uncompressed"):
        dec(pa.table({"payload": pa.array([bytes(comp)], pa.binary())}))


def test_tga_roundtrip_orientations_types_footer():
    from distributed_pagerank_ray.functions.multimodal import TgaDecode, encode_tga

    rng = np.random.default_rng(11)
    for w, h in ((6, 3), (9, 5), (4, 1), (130, 2)):  # >128 exercises packet caps
        img = rng.integers(0, 4, (h, w), dtype=np.uint8) * 80  # runs likely
        for top in (False, True):
            for rle in (False, True):
                for foot in (False, True):
                    enc = encode_tga(
                        img, top_origin=top, rle=rle, id_field=b"idf", footer=foot
                    )
                    out = TgaDecode()(
                        pa.table({"payload": pa.array([enc], pa.binary())})
                    )
                    assert out.column("width")[0].as_py() == w
                    assert out.column("height")[0].as_py() == h
                    assert out.column("img_type")[0].as_py() == (11 if rle else 3)
                    assert out.column("mean_lum")[0].as_py() == round(
                        float(img.mean()), 6
                    )
                    assert out.column("min_lum")[0].as_py() == int(img.min())
                    assert out.column("max_lum")[0].as_py() == int(img.max())
                    # orientation witness: IMAGE top row either storage order
                    assert out.column("top_lum")[0].as_py() == round(
                        float(img[0].mean()), 6
                    )


def test_tga_hand_computed_rle_stream():
    """Hand-built packet stream (top-left origin, no ID field): a
    5-run packet, a 3-byte raw packet, then a run CROSSING the
    scanline boundary — packet-stream decode semantics accept it."""
    import struct

    from distributed_pagerank_ray.functions.multimodal import TgaDecode

    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 4, 3, 8, 0x20)
    body = bytes(
        [0x80 | 4, 7]  # run of 5 sevens -> fills row 0 + 1 px of row 1
        + [2, 1, 2, 3]  # raw 3: 1 2 3
        + [0x80 | 3, 9]  # run of 4 nines crosses rows 1->2
    )
    out = TgaDecode()(pa.table({"payload": pa.array([hdr + body], pa.binary())}))
    # pixels: 7 7 7 7 | 7 1 2 3 | 9 9 9 9
    assert out.column("mean_lum")[0].as_py() == round((7 * 5 + 1 + 2 + 3 + 9 * 4) / 12, 6)
    assert out.column("top_lum")[0].as_py() == 7.0
    assert out.column("min_lum")[0].as_py() == 1
    assert out.column("max_lum")[0].as_py() == 9


def test_tga_encoder_packets_never_cross_scanlines():
    """The encoder honors the spec recommendation: walking its RLE
    stream row-by-row, every packet ends exactly at a row boundary
    count-wise (total per row == w)."""
    from distributed_pagerank_ray.functions.multimodal import encode_tga

    img = np.array([[5, 5, 5, 1], [1, 1, 2, 2]], dtype=np.uint8)
    enc = encode_tga(img, top_origin=True, rle=True)
    pos, w = 18, 4
    for _row in range(2):
        filled = 0
        while filled < w:
            head = enc[pos]
            cnt = (head & 0x7F) + 1
            pos += 2 if head & 0x80 else 1 + cnt
            filled += cnt
        assert filled == w  # a packet never spilled into the next row
    assert pos == len(enc)


def test_tga_malformed_rejected():
    import struct

    import pytest

    from distributed_pagerank_ray.functions.multimodal import TgaDecode, encode_tga

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    dec = TgaDecode()

    def run(b):
        return dec(pa.table({"payload": pa.array([b], pa.binary())}))

    enc = encode_tga(img, rle=True)
    with pytest.raises(ValueError, match="trailing"):
        run(enc + b"x")
    with pytest.raises(ValueError, match="truncated"):
        run(enc[:-1])
    with pytest.raises(ValueError, match="truncated"):
        run(encode_tga(img, rle=False)[:-1])
    # RLE overrun: run of 128 into a 12-px image
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 4, 3, 8, 0)
    with pytest.raises(ValueError, match="overrun"):
        run(hdr + bytes([0xFF, 1]))
    # colormapped / truecolor / 16-bpp rejected
    bad = bytearray(encode_tga(img, rle=False))
    bad[2] = 2
    with pytest.raises(ValueError, match="supported"):
        run(bytes(bad))
    bad = bytearray(encode_tga(img, rle=False))
    bad[16] = 16
    with pytest.raises(ValueError, match="supported"):
        run(bytes(bad))


def test_gzip_member_walk_and_trailer():
    import gzip as _gzip
    import struct

    import pytest

    from distributed_pagerank_ray.functions.multimodal import (
        decode_gzip_member,
        encode_gzip_member,
    )

    data = bytes((i * 29 + 3) % 256 for i in range(200))
    for fn, fx in ((None, None), (b"name", None), (None, b"xx"), (b"n", b"\xde\xad\xbe")):
        b = encode_gzip_member(data, fn, fx)
        assert _gzip.decompress(b) == data  # stdlib agrees with the writer
        out, name = decode_gzip_member(b)
        assert out == data and name == (fn or b"").decode()
    # stdlib-written member (with mtime) decodes too
    out, name = decode_gzip_member(_gzip.compress(data, 5))
    assert out == data
    b = encode_gzip_member(data, b"x")
    bad = bytearray(b)
    bad[-8] ^= 1
    with pytest.raises(ValueError):
        decode_gzip_member(bytes(bad))  # CRC flip
    bad = bytearray(b)
    struct.pack_into("<I", bad, len(bad) - 4, 7)
    with pytest.raises(ValueError):
        decode_gzip_member(bytes(bad))  # ISIZE lie
    bad = bytearray(b)
    bad[3] |= 0xE0
    with pytest.raises(ValueError):
        decode_gzip_member(bytes(bad))  # reserved FLG bits


def test_split_gzip_members_boundaries():
    import pytest

    from distributed_pagerank_ray.functions.multimodal import (
        encode_gzip_member,
        split_gzip_members,
    )

    parts = [bytes((i * 13 + j) % 256 for j in range(50 + i)) for i in range(5)]
    stream = b"".join(
        encode_gzip_member(p, fname=b"r%d" % i if i % 2 else None)
        for i, p in enumerate(parts)
    )
    assert split_gzip_members(stream) == parts
    with pytest.raises(ValueError):
        split_gzip_members(stream + b"junk")  # trailing garbage
    with pytest.raises(ValueError):
        split_gzip_members(stream[:-3])  # truncated last member
    # a corrupted middle member must not be silently skipped
    bad = bytearray(stream)
    bad[len(stream) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        split_gzip_members(bytes(bad))


def test_warc_gz_round_trip():
    from distributed_pagerank_ray.functions.multimodal import split_gzip_members
    from distributed_pagerank_ray.sources.warc import build_warc_gz, parse_warc_bytes

    recs = [("http://a.test/1", 200, b"hello"), ("http://a.test/2", 404, b"x" * 37)]
    gz = build_warc_gz(recs)
    members = split_gzip_members(gz)
    assert len(members) == 5  # warcinfo + 2 x (request + response)
    assert parse_warc_bytes(b"".join(members)) == [
        ("http://a.test/1", 200, 5),
        ("http://a.test/2", 404, 37),
    ]
