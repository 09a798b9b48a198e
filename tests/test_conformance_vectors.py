"""External-encoder conformance vectors (round-14 verdict item 3).

Every media test so far decodes bytes produced by this repo's OWN
encoders — self-consistency, which cannot see a bug that encoder and
decoder share. No independent codec ships in this container (PIL,
libpng, libjpeg are absent), so these vectors are HAND-ASSEMBLED from
the public specifications alone — ITU-T T.81 (marker syntax B.2,
canonical Huffman code construction C.2, entropy coding F.1.2, byte
stuffing/padding F.1.2.3), the PNG specification (chunk layout,
CRC-32, filter types 0-4, Adam7 pass grid) and RFC 1952/1951 (gzip
member framing, stored-block deflate) — with the derivation recorded
next to each literal. Expected outputs are closed-form (DC-only JPEG
blocks decode to flat round(DC*Q/8)+128; PNG/gzip are lossless), so
nothing on the expectation side touches the repo's codecs either.

The bit-level derivations live in comments; the byte literals were
transcribed from a scratch derivation that used only spec rules (no
imports from this package). The JPEG Huffman tables are deliberately
MINIMAL stream-defined tables (e.g. a single length-1 code), which no
real encoder emits — exercising the decoder's canonical-code builder
on shapes outside its own encoder's table set.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pytest

from etl_geonet_quakes_spark.llm.multimodal import (
    _gzip_members_decode,
    _jpeg_decode_baseline,
    decode_jpeg_features,
    decode_png_features,
    decode_png_interlaced_features,
    decode_warc_gzip_features,
)

# Shared prelude of all JPEG vectors: SOI + DQT (table 0, all-ones —
# dequantized coefficient == stored coefficient, so a DC-only block
# decodes to the closed form round(DC/8) + 128 with zero quant loss).
_SOI_DQT = (
    "ffd8ffdb0043000101010101010101010101010101010101010101010101"
    "0101010101010101010101010101010101010101010101010101010101010101"
    "010101010101010101"
)

# T.81 C.2 canonical tables used below (stream-defined via DHT):
#   DC table A: BITS=(1,0,...), HUFFVAL=[5]      -> category 5 = "0"
#   DC table B: BITS=(0,2,0,...), HUFFVAL=[4,5]  -> cat4="00", cat5="01"
#   AC table:   BITS=(1,0,...), HUFFVAL=[0x00]   -> EOB = "0"
# Magnitude bits per F.1.2.1: +16="10000", -8=7="0111", +8="1000",
# +24="11000", -16=15="01111".

# V1 — baseline grayscale 8x8, single DC-only block.
# SOF0 8x8 1 comp (id1, H=V=1, Tq0); DHT A + AC; SOS; entropy bits
# "0"+"10000" (DC diff +16, cat5) + "0" (EOB) padded with 1s -> 0x41.
# Expected: flat 130 (= 16/8 + 128).
V1_GRAY_DC = bytes.fromhex(
    _SOI_DQT
    + "ffc0000b080008000801011100"
    + "ffc40014000100000000000000000000000000000005"
    + "ffc40014100100000000000000000000000000000000"
    + "ffda0008010100003f0041ffd9"
)

# V2 — grayscale 16x8, TWO blocks: DC prediction across blocks.
# DHT B. Entropy: blk1 "01"+"10000" (diff +16 -> D=16, px 130), EOB;
# blk2 "00"+"0111" (diff -8 -> D=8, px 129), EOB -> 0x60 0x1d.
V2_GRAY_PRED = bytes.fromhex(
    _SOI_DQT
    + "ffc0000b080008001001011100"
    + "ffc4001500000200000000000000000000000000000405"
    + "ffc40014100100000000000000000000000000000000"
    + "ffda0008010100003f00601dffd9"
)

# V3 — same image as V2 via a RESTART interval: DRI=1, RST0 between
# the MCUs, so blk2's diff is ABSOLUTE (+8="00"+"1000") after the
# predictor reset; entropy blk1 byte-aligns to 0x60, blk2 to 0x21.
V3_GRAY_RST = bytes.fromhex(
    _SOI_DQT
    + "ffc0000b080008001001011100"
    + "ffc4001500000200000000000000000000000000000405"
    + "ffc40014100100000000000000000000000000000000"
    + "ffdd00040001"
    + "ffda0008010100003f0060ffd021ffd9"
)

# V4 — color 4:4:4 8x8 interleaved (3 comps, H=V=1): one MCU =
# C1,C2,C3 data units. DHT A. Diffs +16/+24/-16 -> planes flat
# 130/131/126. Entropy: "0 10000 0 0 11000 0 0 01111 0" + pad.
V4_COLOR_444 = bytes.fromhex(
    _SOI_DQT
    + "ffc00011080008000803011100021100031100"
    + "ffc40014000100000000000000000000000000000005"
    + "ffc40014100100000000000000000000000000000000"
    + "ffda000c03010002000300003f0040c0f7ffd9"
)

# V5 — 4:2:0 16x16 (Y H=V=2, Cb/Cr H=V=1): ONE MCU = 4 Y units +
# Cb + Cr, T.81 A.2.3 ordering. DHT B. Y diffs +16,-8,+8,-16 chain
# the predictor to D=16,8,16,0 -> quadrants TL130 TR129 BL130 BR128;
# Cb +24 -> 131 flat; Cr -16 -> 126 flat.
V5_COLOR_420 = bytes.fromhex(
    _SOI_DQT
    + "ffc00011080010001003012200021100031100"
    + "ffc4001500000200000000000000000000000000000405"
    + "ffc40014100100000000000000000000000000000000"
    + "ffda000c03010002000300003f00601c4179c17bffd9"
)


def test_jpeg_vector_v1_single_block(spark):
    w, h, planes, samps = _jpeg_decode_baseline(V1_GRAY_DC)
    assert (w, h, samps) == (8, 8, [(1, 1)])
    assert np.array_equal(planes[0], np.full((8, 8), 130))
    # and through the production mapInPandas feature path
    df = spark.createDataFrame(
        [(0, bytearray(V1_GRAY_DC))], "doc_id long, payload binary"
    )
    r = decode_jpeg_features(df).collect()[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 8, 8)
    assert r["pixel_sum"] == 64 * 130
    assert r["px_first"] == r["px_last"] == 130


def test_jpeg_vector_v2_dc_prediction():
    w, h, planes, _ = _jpeg_decode_baseline(V2_GRAY_PRED)
    assert (w, h) == (16, 8)
    assert np.array_equal(planes[0][:, :8], np.full((8, 8), 130))
    assert np.array_equal(planes[0][:, 8:], np.full((8, 8), 129))


def test_jpeg_vector_v3_restart_resets_predictor():
    w, h, planes, _ = _jpeg_decode_baseline(V3_GRAY_RST)
    assert (w, h) == (16, 8)
    # identical image to V2, reached through DRI/RST0 + absolute diff
    v2 = _jpeg_decode_baseline(V2_GRAY_PRED)
    assert np.array_equal(planes[0], v2[2][0])


def test_jpeg_vector_v4_interleaved_color():
    w, h, planes, samps = _jpeg_decode_baseline(V4_COLOR_444)
    assert (w, h, samps) == (8, 8, [(1, 1), (1, 1), (1, 1)])
    for p, v in zip(planes, (130, 131, 126)):
        assert np.array_equal(p, np.full((8, 8), v))


def test_jpeg_vector_v5_420_mcu_order():
    w, h, planes, samps = _jpeg_decode_baseline(V5_COLOR_420)
    assert (w, h, samps) == (16, 16, [(2, 2), (1, 1), (1, 1)])
    y = planes[0]
    for (r0, c0), v in (((0, 0), 130), ((0, 8), 129),
                        ((8, 0), 130), ((8, 8), 128)):
        assert np.array_equal(
            y[r0 : r0 + 8, c0 : c0 + 8], np.full((8, 8), v)
        ), (r0, c0, v)
    assert np.array_equal(planes[1], np.full((8, 8), 131))
    assert np.array_equal(planes[2], np.full((8, 8), 126))


# V6 — PROGRESSIVE (SOF2) grayscale 16x8 in THREE hand-built scans:
#   scan1 DC-first Al=1: sends DC>>1 as diffs (+8 cat4 "01"+"1000",
#         then -4 cat3 "00"+"011" — DHT B' cat3="00"/cat4="01")
#   scan2 AC band Ss=1..Se=63 Al=0: all ACs zero -> one EOB-run
#         symbol (0x00 = "0") per block
#   scan3 DC refinement Ah=1,Al=0: raw bits 0,1 append the low bit
# Final DCs (8<<1)|0=16 and (4<<1)|1=9 -> blocks 130 and 129
# (round(9/8)+128). Exercises multi-SOS parsing, successive
# approximation arithmetic, and progressive AC EOB-run coding on
# bytes this repo's encoder never produced (its script is 6 scans
# for grayscale; this one is 3).
V6_GRAY_PROGRESSIVE = bytes.fromhex(
    _SOI_DQT
    + "ffc2000b080008001001011100"
    + "ffc4001500000200000000000000000000000000000304"
    + "ffc40014100100000000000000000000000000000000"
    + "ffda0008010100000001607f"
    + "ffda0008010100013f003f"
    + "ffda00080101000000107f"
    + "ffd9"
)


def test_jpeg_vector_v6_progressive_three_scans(spark):
    w, h, planes, samps = _jpeg_decode_baseline(V6_GRAY_PROGRESSIVE)
    assert (w, h, samps) == (16, 8, [(1, 1)])
    assert np.array_equal(planes[0][:, :8], np.full((8, 8), 130))
    assert np.array_equal(planes[0][:, 8:], np.full((8, 8), 129))
    df = spark.createDataFrame(
        [(0, bytearray(V6_GRAY_PROGRESSIVE))], "doc_id long, payload binary"
    )
    r = decode_jpeg_features(df).collect()[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 16, 8)
    assert r["pixel_sum"] == 64 * 130 + 64 * 129


# ---- PNG: hand-filtered scanlines, zlib-compressed independently ----

# V7 — 3x3 RGB exercising Sub(1), Up(2) and Paeth(4) with
# HAND-COMPUTED filtered bytes (this repo's encoder never produced
# them). Pixels row-major:
#   (10,20,30)(13,25,29)(250,3,40)
#   (12,18,35)(13,29,31)(200,60,41)
#   (15,10,40)(20,35,28)(100,200,50)
# Row0 Sub: each byte minus the byte 3 to its left (mod 256);
# row1 Up: minus the byte above; row2 Paeth vs reconstructed row1.
# The IDAT is zlib-compressed (stdlib zlib — an implementation
# independent of this repo) and every chunk carries its real CRC-32.
_V7_PIXELS = [
    [(10, 20, 30), (13, 25, 29), (250, 3, 40)],
    [(12, 18, 35), (13, 29, 31), (200, 60, 41)],
    [(15, 10, 40), (20, 35, 28), (100, 200, 50)],
]
V7_PNG_FILTERS = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000003000000030802000000d94a22"
    "e80000002749444154789c63e412916366fdfff6153713d33f560616a6739"
    "68c2ccc3f5859057fcee9e10400792f08808f36b1ee0000000049454e44ae42"
    "6082"
)

# V8 — Adam7-interlaced 2x2 RGB: passes 2,3,4,5 are EMPTY at this
# size (their grids start past the image), so the stream is pass1
# [(0,0)], pass6 [(1,0)], pass7 [(0,1),(1,1)], each with its own
# filter byte (0). Pixels: p00=(1,2,3) p10=(4,5,6) p01=(7,8,9)
# p11=(10,11,12).
V8_PNG_ADAM7 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000020000000208020000018ad3aa"
    "e50000001749444154789c63606462666061656360e7e0e4e2e601000196004f"
    "90b4ab700000000049454e44ae426082"
)


def test_png_vector_v7_hand_filtered(spark):
    df = spark.createDataFrame(
        [(0, bytearray(V7_PNG_FILTERS))], "doc_id long, payload binary"
    )
    r = decode_png_features(df).collect()[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 3, 3)
    sums = [0, 0, 0]
    for row in _V7_PIXELS:
        for p in row:
            for j in range(3):
                sums[j] += p[j]
    assert r["mean_r"] == sums[0] / 9
    assert r["mean_g"] == sums[1] / 9
    assert r["mean_b"] == sums[2] / 9


def test_png_vector_v8_adam7_tiny(spark):
    df = spark.createDataFrame(
        [(0, bytearray(V8_PNG_ADAM7))], "doc_id long, payload binary"
    )
    r = decode_png_interlaced_features(df).collect()[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 2, 2)
    assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (22, 26, 30)


# V8B — Adam7 5x5 RGB with FILTERED multi-row passes: pixel (x,y) =
# (10+x+16y, 40+2x+y, 200-3x-5y). At 5x5 every pass is non-empty —
# pass3 [(0,4),(4,4)], pass4 [(2,0),(2,4)], pass6 2x3, pass7 5x2 —
# and each pass's rows are filtered Sub, then Up, then Paeth (then
# None), so Up/Paeth predict from the PASS-LOCAL prior row (e.g.
# pass 7's second row (y=3) predicts from its first (y=1), two image
# rows away). Hand-computed filter bytes, stdlib-zlib IDAT.
V8B_PNG_ADAM7_FILTERS = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000005000000050802000001750a81"
    "240000004449444154789c63e4d238c1c867b087d14b670b0bc717461e9d434c"
    "0e2c6f18b5b4f631b1fc0222466eada3209602d3372062016226a65f8c529a87"
    "1999fec21154168e00214c1a2a633112410000000049454e44ae426082"
)


def test_png_vector_v8b_adam7_filtered_passes(spark):
    df = spark.createDataFrame(
        [(0, bytearray(V8B_PNG_ADAM7_FILTERS))], "doc_id long, payload binary"
    )
    r = decode_png_interlaced_features(df).collect()[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 5, 5)
    # closed-form channel sums over pixel(x,y) = (10+x+16y, 40+2x+y,
    # 200-3x-5y) for x,y in 0..4
    assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (1100, 1150, 4600)


# ---- gzip: RFC 1952 framing with a stored-block deflate member ----

# V9 — a gzip member assembled byte-by-byte from RFC 1952 (header
# 1f 8b 08 00 + MTIME=0 + XFL=0 + OS=ff) around an RFC 1951 STORED
# block (BFINAL=1 BTYPE=00 -> 0x01, LEN/NLEN little-endian, raw
# bytes) — a wire shape zlib.compressobj never emits at any level —
# plus the CRC32/ISIZE trailer.
V9_PAYLOAD = b"WARC/1.0\r\nWARC-Record-ID: <doc-7>\r\n\r\n"
V9_GZIP_STORED = bytes.fromhex(
    "1f8b08000000000000ff012500daff574152432f312e300d0a574152432d5265"
    "636f72642d49443a203c646f632d373e0d0a0d0a13356b3725000000"
)


def test_gzip_vector_v9_stored_block_member(spark):
    assert _gzip_members_decode(V9_GZIP_STORED) == [V9_PAYLOAD]
    # mixed-member stream: hand-built stored member + a dynamically
    # compressed one must both be recovered in order
    text = b"tiny document body"
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    member2 = co.compress(text) + co.flush()
    buf = V9_GZIP_STORED + member2
    assert _gzip_members_decode(buf) == [V9_PAYLOAD, text]
    df = spark.createDataFrame(
        [(7, bytearray(buf))], "doc_id long, payload binary"
    )
    r = decode_warc_gzip_features(df).collect()[0]
    assert r["valid"] is True and r["n_members"] == 2
    assert r["header_len"] == len(V9_PAYLOAD)
    assert r["text_len"] == len(text)
    assert r["payload_md5"] == hashlib.md5(V9_PAYLOAD + text).hexdigest()


# ---- WAV / PPM: hand-framed containers the synths never emit ----


def test_wav_vector_odd_chunk_word_alignment(spark):
    # RIFF chunks are word-aligned: an ODD-sized chunk is followed by
    # a pad byte (RIFF spec). The repo's synthesizer emits no such
    # chunk, so this path only ever ran against hand bytes. A LIST
    # chunk of size 5 precedes fmt/data; mis-handling the pad byte
    # desynchronizes the walk and poisons the row.
    import math
    import struct

    from etl_geonet_quakes_spark.llm.multimodal import decode_wav_features

    samples = [1000, -2000, 3000]
    data = struct.pack("<3h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame(
        [(0, bytearray(wav))], "doc_id long, payload binary"
    )
    r = decode_wav_features(df).collect()[0]
    assert (r["valid"], r["n_samples"], r["sample_rate"]) == (True, 3, 8000)
    assert r["duration_ms"] == 3 / 8000 * 1000
    assert r["mean"] == sum(samples) / 3
    assert r["rms"] == math.sqrt(sum(s * s for s in samples) / 3)


def test_ppm_vector_whitespace_variants_and_comment_gate(spark):
    # P6 header fields may be separated by ANY whitespace (tab, CR,
    # LF, runs of them) — hand-framed here; the synth always writes
    # single "\n"s. PPM comments ("#") are a documented down-scope:
    # they must poison the row, never mis-parse as dimensions.
    from etl_geonet_quakes_spark.llm.multimodal import decode_ppm_features

    px = bytes(range(18))  # 3x2 RGB raster
    good = b"P6\t3 2\r\n255\n" + px
    commented = b"P6 #c\n3 2 255\n" + px
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(commented))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_ppm_features(df).collect()}
    r = rows[0]
    assert (r["valid"], r["width"], r["height"]) == (True, 3, 2)
    # channel k mean over bytes 0..17: r=(0+3+6+9+12+15)/6
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (7.5, 8.5, 9.5)
    assert rows[1]["valid"] is False  # comment -> poisoned, not misread


# ---- arithmetic-coding gate (round-14 verdict item 4) ----

# T.81's arithmetic-coded processes (SOF9 sequential / SOF10
# progressive + DAC conditioning tables) are a DOCUMENTED down-scope:
# patent-era rare, essentially absent from real web corpora. The
# contract is that such a stream POISONS the row — it must never be
# mis-parsed as Huffman data.


def _arith_variant(sof_marker: int) -> bytes:
    # V1's layout with the SOF marker swapped to an arithmetic
    # process and the DHTs replaced by a DAC (FF CC) conditioning
    # segment; the entropy bytes are irrelevant — rejection must
    # happen at the frame/table level.
    return bytes.fromhex(
        _SOI_DQT
        + f"ff{sof_marker:02x}000b080008000801011100"
        + "ffcc000400"  # DAC: 4-byte segment (Tc/Tb + Cs)
        + "01"
        + "ffda0008010100003f0041ffd9"
    )


@pytest.mark.parametrize("sof", [0xC9, 0xCA])
def test_jpeg_arithmetic_coded_stream_is_poisoned(spark, sof):
    buf = _arith_variant(sof)
    assert _jpeg_decode_baseline(buf) is None
    df = spark.createDataFrame(
        [(0, bytearray(buf)), (1, bytearray(V1_GRAY_DC))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["valid"] for r in decode_jpeg_features(df).collect()}
    assert got == {0: False, 1: True}  # poisoned row, job survives
