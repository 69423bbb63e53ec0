"""QOI codec conformance (spec: qoiformat.org, public domain).

The hand-computed byte vector breaks encoder/decoder bug-cancellation
(the repo's codec-pair rule): RGB, RUN, DIFF and INDEX ops with their
exact tag bytes are pinned against the spec by hand, not against our
own encoder."""

import numpy as np
import pytest

from distributed_pagerank_ray.functions.multimodal import decode_qoi, encode_qoi

# 2x2 image, worked by hand from the spec:
#   P1 (128,0,0)    -> QOI_OP_RGB   FE 80 00 00   (hash 53 -> index)
#   P2 (128,0,0)    -> QOI_OP_RUN   C0            (run 1, bias -1)
#   P3 (126,254,254)-> QOI_OP_DIFF  40            (dr=dg=db=-2 wrapping)
#   P4 (128,0,0)    -> QOI_OP_INDEX 35            (index slot 53)
_PIXELS = np.array(
    [[[128, 0, 0], [128, 0, 0]], [[126, 254, 254], [128, 0, 0]]], np.uint8
)
_BYTES = (
    b"qoif"
    + (2).to_bytes(4, "big")
    + (2).to_bytes(4, "big")
    + bytes([3, 0])
    + bytes([0xFE, 0x80, 0x00, 0x00, 0xC0, 0x40, 0x35])
    + b"\x00" * 7
    + b"\x01"
)


def test_decode_hand_vector():
    assert np.array_equal(decode_qoi(_BYTES), _PIXELS)


def test_encode_matches_hand_vector():
    assert encode_qoi(_PIXELS) == _BYTES


def test_roundtrip_all_ops_and_long_runs():
    """Random-ish structured image: constant rows (RUN, incl. a run
    crossing the 62 cap), gradients (LUMA), small deltas (DIFF),
    alternating colors (INDEX), jumps (RGB). Roundtrip is lossless and
    every op tag appears in the stream."""
    rng = np.random.default_rng(3)
    h, w = 9, 70  # 70 > 62 forces a run split
    img = np.zeros((h, w, 3), np.uint8)
    img[0:2] = (10, 70, 130)  # long run
    for x in range(w):  # LUMA gradient row
        img[2, x] = ((10 + x) % 256, (70 + 2 * x) % 256, (130 + 3 * x) % 256)
    for x in range(w):  # DIFF micro-gradient row
        img[3, x] = ((10 + x) % 256, (70 + x) % 256, (130 + x) % 256)
    img[4::2] = (10, 70, 130)  # alternating -> INDEX hits
    img[5::2] = rng.integers(0, 256, (len(img[5::2]), w, 3), np.uint8)  # RGB jumps
    enc = encode_qoi(img)
    assert np.array_equal(decode_qoi(enc), img)
    body = enc[14:-8]
    tags = set()
    i = 0
    while i < len(body):
        b = body[i]
        if b == 0xFE:
            tags.add("rgb")
            i += 4
        elif b >> 6 == 0:
            tags.add("index")
            i += 1
        elif b >> 6 == 1:
            tags.add("diff")
            i += 1
        elif b >> 6 == 2:
            tags.add("luma")
            i += 2
        else:
            tags.add("run")
            i += 1
    assert tags == {"rgb", "index", "diff", "luma", "run"}


def test_decode_rejects_malformed():
    with pytest.raises(ValueError, match="not a QOI"):
        decode_qoi(b"nope" + _BYTES[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(_BYTES[:16] + b"\x00" * 7 + b"\x01")
    with pytest.raises(ValueError, match="end marker|trailing"):
        decode_qoi(_BYTES + b"\x00")
    with pytest.raises(ValueError, match="end marker|trailing"):
        decode_qoi(_BYTES[:-8] + b"\x00" * 7 + b"\x02")


# --------------------------------------------------------------- IMA ADPCM


def test_adpcm_hand_vectors():
    """Hand-worked recurrence steps from the IMA spec arithmetic:
    seed (0,0): nibble 3 -> step 7, diff 0+1+3=4, pred 4, idx-1->0;
    nibble 9 -> diff 1, sign bit, pred 3. [7,15]: diff 11 then 30 at
    step 16 after the +8 index jump."""
    import numpy as np

    from distributed_pagerank_ray.functions.multimodal import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    r, s, idx = decode_wav_adpcm(encode_wav_adpcm(np.array([3, 9]), 0, 0))
    assert (list(s), idx, r) == ([0, 4, 3], 0, 8000)
    _, s, idx = decode_wav_adpcm(encode_wav_adpcm(np.array([7, 15]), 0, 0))
    assert (list(s), idx) == ([0, 11, -19], 16)


def test_adpcm_clamps_and_malformed():
    import numpy as np
    import pytest

    from distributed_pagerank_ray.functions.multimodal import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    # positive clamp: max-magnitude nibbles from a high seed
    _, s, idx = decode_wav_adpcm(
        encode_wav_adpcm(np.array([7] * 40), 32000, 88)
    )
    assert s.max() == 32767 and idx == 88
    # negative clamp
    _, s, _ = decode_wav_adpcm(encode_wav_adpcm(np.array([15] * 40), -32000, 88))
    assert s.min() == -32768
    with pytest.raises(ValueError, match="even nibble"):
        encode_wav_adpcm(np.array([1, 2, 3]), 0, 0)
    good = encode_wav_adpcm(np.array([1, 2]), 0, 0)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_adpcm(b"nope" + good[4:])
    # shrink the declared data size below block_align (4+1 -> 4)
    with pytest.raises(ValueError, match="block align"):
        decode_wav_adpcm(good.replace(b"data\x05\x00\x00\x00", b"data\x04\x00\x00\x00"))
