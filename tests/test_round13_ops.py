"""Round-13 operator tests: JPEG 4:2:0 chroma subsampling (q383) and
restart markers (q384) through the general baseline decoder, plus the
cross-contract poisoning rules between the three JPEG query families.

The registry-level oracle parity of q383/q384 is covered automatically
by tests/test_oracle_parity.py (parametrized over SPECS); these tests
pin the CODEC: exact roundtrip on the uniform-even-block subset, the
lossy general case against the independent transform-layer reference
(per native plane — 4:2:0 encodes each plane's own blocks, so the
4:4:4 reference applies plane-wise), restart-stream equivalence, and
the malformation policies unique to subsampled/restarted streams.
"""

from __future__ import annotations

import struct

import numpy as np

from etl_geonet_quakes_spark.llm.multimodal import (
    _jpeg_420_planes,
    _jpeg_decode_baseline,
    _jpeg_encode_gray,
    _jpeg_encode_ycc420,
    _jpeg_encode_ycc444,
)
from tests.test_round12_ops import _jpeg_transform_reference


def test_jpeg_420_uniform_even_blocks_roundtrip_exactly():
    yp, cb, cr = _jpeg_420_planes(4242, 31)
    r = _jpeg_decode_baseline(_jpeg_encode_ycc420(yp, cb, cr, 32, 32))
    assert r is not None
    w, h, planes, samps = r
    assert (w, h) == (32, 32)
    assert samps == [(2, 2), (1, 1), (1, 1)]
    assert planes[0].shape == (32, 32) and planes[1].shape == (16, 16)
    assert np.array_equal(planes[0], yp)
    assert np.array_equal(planes[1], cb)
    assert np.array_equal(planes[2], cr)


def test_jpeg_420_lossy_general_case_matches_transform_reference():
    # Non-uniform content: the decoder must reproduce the independent
    # DCT->quant->dequant->IDCT reference bit-exactly per NATIVE plane
    # (the encoder transforms each plane's own 8x8 blocks; subsampling
    # changes plane geometry, not the per-block math).
    yp = np.fromfunction(lambda y, x: (3 * x + 5 * y) % 256, (48, 32)).astype(
        np.int64
    )
    cb = np.fromfunction(lambda y, x: (7 * x + y + 11) % 256, (24, 16)).astype(
        np.int64
    )
    cr = np.fromfunction(lambda y, x: (x + 13 * y + 29) % 256, (24, 16)).astype(
        np.int64
    )
    r = _jpeg_decode_baseline(_jpeg_encode_ycc420(yp, cb, cr, 32, 48))
    assert r is not None
    w, h, planes, samps = r
    assert (w, h) == (32, 48) and samps == [(2, 2), (1, 1), (1, 1)]
    for got, src in zip(planes, (yp, cb, cr)):
        assert np.array_equal(got, _jpeg_transform_reference(src))


def test_jpeg_restart_streams_decode_to_identical_pixels():
    yp, cb, cr = _jpeg_420_planes(777, 37)
    base = _jpeg_decode_baseline(_jpeg_encode_ycc420(yp, cb, cr, 32, 32))
    assert base is not None
    for ri in (1, 2, 3):
        buf = _jpeg_encode_ycc420(yp, cb, cr, 32, 32, restart_interval=ri)
        assert struct.pack(">H", ri) in buf  # DRI segment present
        r = _jpeg_decode_baseline(buf)
        assert r is not None, f"restart_interval={ri}"
        assert all(
            np.array_equal(a, b) for a, b in zip(r[2], base[2])
        ), f"restart_interval={ri} changed pixels"


def test_jpeg_dri_without_rst_markers_is_poisoned():
    # A stream whose DRI promises a restart every MCU but whose scan
    # carries none: the decoder must reject, not silently continue.
    yp, cb, cr = _jpeg_420_planes(99, 31)
    buf = _jpeg_encode_ycc420(yp, cb, cr, 32, 32)
    sos_at = buf.find(b"\xff\xda")
    dri = struct.pack(">HH", 0xFFDD, 4) + struct.pack(">H", 1)
    assert _jpeg_decode_baseline(buf[:sos_at] + dri + buf[sos_at:]) is None


def test_jpeg_wrong_rst_index_is_poisoned():
    yp, cb, cr = _jpeg_420_planes(99, 31)
    buf = bytearray(_jpeg_encode_ycc420(yp, cb, cr, 32, 32, restart_interval=1))
    sos_at = bytes(buf).find(b"\xff\xda")
    i = bytes(buf).find(b"\xff\xd0", sos_at)  # first RST0 in the scan
    assert i != -1
    buf[i + 1] = 0xD3  # out-of-cycle index
    assert _jpeg_decode_baseline(bytes(buf)) is None


def test_jpeg_420_truncated_stream_is_poisoned():
    yp, cb, cr = _jpeg_420_planes(5, 31)
    buf = _jpeg_encode_ycc420(yp, cb, cr, 32, 32, restart_interval=2)
    assert _jpeg_decode_baseline(buf[: len(buf) // 2]) is None


def test_jpeg_contract_cross_rejection_across_all_three_families(spark):
    # Each decode contract owns exactly one stream layout; the other
    # two layouts are poisoned rows, never silent projections.
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_gray,
        decode_jpeg_420_features,
        decode_jpeg_color_features,
    )

    img = np.full((16, 16), 100, dtype=np.int64)
    gray = _jpeg_encode_gray(img.reshape(-1), 16, 16)
    c444 = _jpeg_encode_ycc444([img, img, img], 16, 16)
    yp, cb, cr = _jpeg_420_planes(1, 31)
    c420 = _jpeg_encode_ycc420(yp, cb, cr, 32, 32)

    # codec-level: gray contract rejects both color layouts
    assert _jpeg_decode_gray(c444) is None
    assert _jpeg_decode_gray(c420) is None
    assert _jpeg_decode_gray(gray) is not None

    # DataFrame-level: run all three payloads through both color
    # contracts; only the native layout is valid.
    df = spark.createDataFrame(
        [(0, bytearray(gray)), (1, bytearray(c444)), (2, bytearray(c420))],
        "doc_id long, payload binary",
    )
    by_444 = {
        r["doc_id"]: r["valid"]
        for r in decode_jpeg_color_features(df).collect()
    }
    assert by_444 == {0: False, 1: True, 2: False}
    by_420 = {
        r["doc_id"]: r["valid"] for r in decode_jpeg_420_features(df).collect()
    }
    assert by_420 == {0: False, 1: False, 2: True}


def test_jpeg_single_component_sof_sampling_is_ignored(spark):
    # T.81 A.2.2: a non-interleaved single-component scan ignores the
    # SOF sampling factors. Rewrite the gray stream's SOF to claim
    # H=V=2; the decode must be unchanged (data-unit raster).
    from etl_geonet_quakes_spark.llm.multimodal import _jpeg_decode_gray

    img = np.arange(256, dtype=np.int64).reshape(16, 16) % 256
    img = (img // 2) * 2
    buf = bytearray(_jpeg_encode_gray(img.reshape(-1), 16, 16))
    sof_at = bytes(buf).find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nf(1) then cid hv tq
    hv_at = sof_at + 4 + 6 + 1
    assert buf[hv_at] == 0x11
    buf[hv_at] = 0x22
    base = _jpeg_decode_gray(bytes(_jpeg_encode_gray(img.reshape(-1), 16, 16)))
    got = _jpeg_decode_gray(bytes(buf))
    assert got is not None
    assert np.array_equal(got[2], base[2])


# ---- progressive JPEG (q385) ----


def test_jpeg_progressive_equals_sequential_on_arbitrary_images():
    # The strongest property a progressive decoder can satisfy: SOF2
    # is a lossless re-encoding of the same quantized coefficients, so
    # progressive decode must equal sequential decode bit-exactly for
    # ANY image — exercising EOB runs, ZRL, spectral bands, DC/AC
    # successive approximation, sign and correction bits.
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(1313)
    stressors = [
        np.full((16, 24), 200, dtype=np.int64),           # pure EOB runs
        np.eye(16, 24, dtype=np.int64) * 255,             # sparse spikes
        ((np.indices((16, 24)).sum(0) % 2) * 255).astype(np.int64),
        rng.randint(0, 256, (16, 24)).astype(np.int64),
        rng.choice([0, 255], (16, 24)).astype(np.int64),
    ]
    for img in stressors:
        seq = _jpeg_decode_baseline(
            _jpeg_encode_gray(img.reshape(-1), 24, 16)
        )
        pro = _jpeg_decode_baseline(_jpeg_encode_progressive([img], 24, 16))
        assert seq is not None and pro is not None
        assert np.array_equal(seq[2][0], pro[2][0])
    # color
    planes = [rng.randint(0, 256, (16, 16)).astype(np.int64) for _ in range(3)]
    seq = _jpeg_decode_baseline(_jpeg_encode_ycc444(planes, 16, 16))
    pro = _jpeg_decode_baseline(_jpeg_encode_progressive(planes, 16, 16))
    assert seq is not None and pro is not None
    for ci in range(3):
        assert np.array_equal(seq[2][ci], pro[2][ci])


def test_jpeg_progressive_uniform_even_blocks_roundtrip_exactly():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    planes = []
    for ci in range(3):
        img = np.zeros((16, 16), dtype=np.int64)
        for k in range(4):
            v = 2 * ((9 * 41 + ci * 53 + k * 97) % 128)
            by, bx = divmod(k, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
        planes.append(img)
    r = _jpeg_decode_baseline(_jpeg_encode_progressive(planes, 16, 16))
    assert r is not None
    assert r[3] == [(1, 1)] * 3
    for got, src in zip(r[2], planes):
        assert np.array_equal(got, src)


def test_jpeg_progressive_truncation_and_scan_damage_poisoned():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    img = np.arange(256, dtype=np.int64).reshape(16, 16)
    buf = _jpeg_encode_progressive([img], 16, 16)
    # truncation at several depths (inside different scans)
    for frac in (3, 2):
        assert _jpeg_decode_baseline(buf[: len(buf) // frac]) is None
    # EOI alone after headers (zero scans) is premature
    sos_at = buf.find(b"\xff\xda")
    assert _jpeg_decode_baseline(buf[:sos_at] + b"\xff\xd9") is None


def test_jpeg_progressive_stream_under_sequential_only_contracts(spark):
    # A progressive stream decodes through the general decoder and
    # satisfies the color contract (3 comps, 1x1) — and the GRAY
    # contract still rejects it (component count).
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_gray,
        _jpeg_encode_progressive,
        decode_jpeg_420_features,
        decode_jpeg_color_features,
    )

    rng = np.random.RandomState(5)
    planes = [rng.randint(0, 256, (16, 16)).astype(np.int64) for _ in range(3)]
    pro = _jpeg_encode_progressive(planes, 16, 16)
    assert _jpeg_decode_gray(pro) is None
    df = spark.createDataFrame(
        [(0, bytearray(pro))], "doc_id long, payload binary"
    )
    assert decode_jpeg_color_features(df).collect()[0]["valid"] is True
    assert decode_jpeg_420_features(df).collect()[0]["valid"] is False


# ---- progressive x 4:2:0 (q386) ----


def test_jpeg_progressive_420_equals_sequential_420():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(86)
    s420 = [(2, 2), (1, 1), (1, 1)]
    for _ in range(3):
        yp = rng.randint(0, 256, (32, 48)).astype(np.int64)
        cb = rng.randint(0, 256, (16, 24)).astype(np.int64)
        cr = rng.randint(0, 256, (16, 24)).astype(np.int64)
        seq = _jpeg_decode_baseline(_jpeg_encode_ycc420(yp, cb, cr, 48, 32))
        pro = _jpeg_decode_baseline(
            _jpeg_encode_progressive([yp, cb, cr], 48, 32, sampling=s420)
        )
        assert seq is not None and pro is not None
        assert pro[3] == s420
        for ci in range(3):
            assert np.array_equal(seq[2][ci], pro[2][ci])


def test_jpeg_progressive_420_uniform_blocks_roundtrip_exactly():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    yp, cb, cr = _jpeg_420_planes(1234, 43)
    buf = _jpeg_encode_progressive(
        [yp, cb, cr], 32, 32, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    r = _jpeg_decode_baseline(buf)
    assert r is not None and r[3] == [(2, 2), (1, 1), (1, 1)]
    assert np.array_equal(r[2][0], yp)
    assert np.array_equal(r[2][1], cb)
    assert np.array_equal(r[2][2], cr)
    # the stream satisfies the 4:2:0 contract, and truncation poisons
    assert _jpeg_decode_baseline(buf[: len(buf) * 2 // 3]) is None


def test_jpeg_progressive_422_matches_transform_reference():
    # A third sampling configuration through the general machinery:
    # 4:2:2 (Y at H=2,V=1; chroma full-height half-width). No
    # sequential 4:2:2 encoder exists here, so the pin is the
    # independent per-plane transform reference — every plane's
    # blocks are DCT'd at native resolution, so the 4:4:4 reference
    # applies plane-wise exactly as for 4:2:0.
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(22)
    yp = rng.randint(0, 256, (32, 32)).astype(np.int64)
    cb = rng.randint(0, 256, (32, 16)).astype(np.int64)
    cr = rng.randint(0, 256, (32, 16)).astype(np.int64)
    buf = _jpeg_encode_progressive(
        [yp, cb, cr], 32, 32, sampling=[(2, 1), (1, 1), (1, 1)]
    )
    r = _jpeg_decode_baseline(buf)
    assert r is not None
    assert r[3] == [(2, 1), (1, 1), (1, 1)]
    assert [p.shape for p in r[2]] == [(32, 32), (32, 16), (32, 16)]
    for got, src in zip(r[2], (yp, cb, cr)):
        assert np.array_equal(got, _jpeg_transform_reference(src))


# ---- progressive + DRI (q387) ----


def test_jpeg_progressive_dri_equals_no_dri():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    rng = np.random.RandomState(47)
    s420 = [(2, 2), (1, 1), (1, 1)]
    yp = rng.randint(0, 256, (32, 48)).astype(np.int64)
    cb = rng.randint(0, 256, (16, 24)).astype(np.int64)
    cr = rng.randint(0, 256, (16, 24)).astype(np.int64)
    base = _jpeg_decode_baseline(
        _jpeg_encode_progressive([yp, cb, cr], 48, 32, sampling=s420)
    )
    assert base is not None
    for ri in (1, 2, 3):
        buf = _jpeg_encode_progressive(
            [yp, cb, cr], 48, 32, sampling=s420, restart_interval=ri
        )
        r = _jpeg_decode_baseline(buf)
        assert r is not None, f"restart_interval={ri}"
        for ci in range(3):
            assert np.array_equal(r[2][ci], base[2][ci]), (ri, ci)
    # gray progressive + DRI too
    img = rng.randint(0, 256, (24, 32)).astype(np.int64)
    g0 = _jpeg_decode_baseline(_jpeg_encode_progressive([img], 32, 24))
    for ri in (1, 5):
        r = _jpeg_decode_baseline(
            _jpeg_encode_progressive([img], 32, 24, restart_interval=ri)
        )
        assert r is not None and np.array_equal(r[2][0], g0[2][0]), ri


def test_jpeg_progressive_forged_dri_is_poisoned():
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    img = np.arange(768, dtype=np.int64).reshape(24, 32) % 256
    nodri = _jpeg_encode_progressive([img], 32, 24)
    sos_at = nodri.find(b"\xff\xda")
    dri = struct.pack(">HH", 0xFFDD, 4) + struct.pack(">H", 1)
    assert _jpeg_decode_baseline(nodri[:sos_at] + dri + nodri[sos_at:]) is None


def test_jpeg_appn_and_com_segments_are_skipped():
    # Real files carry JFIF/EXIF APPn and COM metadata; they must be
    # transparent to decoding in both sequential and progressive mode.
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_encode_progressive,
    )

    img = (np.arange(256, dtype=np.int64).reshape(16, 16) // 2) * 2
    app0 = (
        struct.pack(">HH", 0xFFE0, 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    com = struct.pack(">HH", 0xFFFE, 13) + b"hello world"
    for encode in (
        lambda: _jpeg_encode_gray(img.reshape(-1), 16, 16),
        lambda: _jpeg_encode_progressive([img], 16, 16),
    ):
        buf = encode()
        sos_at = buf.find(b"\xff\xda")
        forged = buf[:2] + app0 + buf[2:sos_at] + com + buf[sos_at:]
        plain = _jpeg_decode_baseline(buf)
        tagged = _jpeg_decode_baseline(forged)
        assert plain is not None and tagged is not None
        assert np.array_equal(plain[2][0], tagged[2][0])


# ---- WARC multi-member gzip (q388) ----


def test_warc_gzip_members_roundtrip_and_poisoning(spark):
    from etl_geonet_quakes_spark.llm.multimodal import (
        _gzip_members,
        _gzip_members_decode,
        _warc_header,
        decode_warc_gzip_features,
    )

    h = _warc_header(123)
    buf = _gzip_members([h, b"hello world"])
    assert _gzip_members_decode(buf) == [h, b"hello world"]
    # truncated member, corrupted byte (CRC), trailing garbage: poisoned
    assert _gzip_members_decode(buf[:-3]) is None
    bad = bytearray(buf)
    bad[len(buf) // 2] ^= 0xFF
    assert _gzip_members_decode(bytes(bad)) is None
    assert _gzip_members_decode(buf + b"garbage") is None
    # contract: exactly two members — a single-member stream is poisoned
    one = _gzip_members([b"only one"])
    df = spark.createDataFrame(
        [(0, bytearray(buf)), (1, bytearray(one)), (2, bytearray(buf[:-3]))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["valid"] for r in decode_warc_gzip_features(df).collect()}
    assert got == {0: True, 1: False, 2: False}


def test_warc_payloads_utf8_and_null_text_poisoned_row(spark):
    # Round-14 ADVICE: text encodes as UTF-8 (DuckDB's strlen/md5
    # byte semantics), and a NULL text yields a poisoned row instead
    # of failing the whole Spark task.
    import hashlib

    from etl_geonet_quakes_spark.llm.multimodal import (
        _warc_gzip_payloads,
        _warc_header,
        decode_warc_gzip_features,
    )

    txt = "tēnā koutou — Aotearoa 🌋"  # non-ASCII: macrons + emoji
    df = spark.createDataFrame(
        [(0, txt), (1, None), (2, "plain ascii")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in decode_warc_gzip_features(
            _warc_gzip_payloads(df)
        ).collect()
    }
    assert rows[1]["valid"] is False and rows[1]["payload_md5"] is None
    for did, t in ((0, txt), (2, "plain ascii")):
        b = t.encode("utf-8")
        assert rows[did]["valid"] is True
        assert rows[did]["text_len"] == len(b)  # BYTE length, not chars
        assert rows[did]["payload_md5"] == hashlib.md5(
            _warc_header(did) + b
        ).hexdigest()
    # and the md5 matches what the DuckDB oracle computes for the
    # same VARCHAR content (strlen/md5 operate on UTF-8 bytes there)
    import duckdb

    d_md5, d_len = duckdb.sql(
        "SELECT md5('WARC/1.0' || chr(13) || chr(10) || "
        "'WARC-Record-ID: <doc-0>' || chr(13) || chr(10) || chr(13) || chr(10)"
        " || ?), strlen(?)",
        params=[txt, txt],
    ).fetchone()
    assert d_md5 == rows[0]["payload_md5"]
    assert d_len == rows[0]["text_len"]


# ---- Adam7 interlaced PNG (q389) ----


def test_png_adam7_roundtrip_across_dims(spark):
    # Dims chosen so some passes are EMPTY (1x1: only pass 1; 3x3:
    # passes 2 and 4 have zero width) — empty passes must contribute
    # zero bytes on both sides.
    import struct
    import zlib

    from etl_geonet_quakes_spark.llm.multimodal import (
        _ADAM7,
        _PNG_SIG,
        _png_filter_line,
        decode_png_features,
        decode_png_interlaced_features,
        media_png_interlaced_decode,  # noqa: F401 (registry fn importable)
    )

    def encode(doc_id, w, h):
        px = [(doc_id * 53 + k) % 256 for k in range(w * h * 3)]

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        scan = bytearray()
        for pi, (x0, dx, y0, dy) in enumerate(_ADAM7):
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            prior = bytes(pw * 3)
            for r in range(ph):
                y = y0 + r * dy
                raw = bytes(
                    px[(y * w + x0 + j * dx) * 3 + c]
                    for j in range(pw) for c in range(3)
                )
                ft = (doc_id + pi + r) % 5
                scan.append(ft)
                scan += _png_filter_line(raw, prior, ft)
                prior = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )

    rows = []
    expected = {}
    for i, (w, h) in enumerate([(16, 8), (3, 3), (1, 1), (7, 5)]):
        buf = encode(i, w, h)
        rows.append((i, bytearray(buf)))
        sums = [0, 0, 0]
        for k in range(w * h * 3):
            sums[k % 3] += (i * 53 + k) % 256
        expected[i] = (True, w, h, *sums)
    # a truncated interlaced stream is poisoned
    rows.append((99, bytearray(encode(99, 16, 8)[:-20])))
    expected[99] = (False, None, None, None, None, None)
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["valid"], r["width"], r["height"],
                      r["sum_r"], r["sum_g"], r["sum_b"])
        for r in decode_png_interlaced_features(df).collect()
    }
    assert got == expected
    # cross-rejection: an interlaced stream under the q98 (interlace=0)
    # contract is a poisoned row, and vice versa
    one = spark.createDataFrame(rows[:1], "doc_id long, payload binary")
    assert decode_png_features(one).collect()[0]["valid"] is False


# ---- data-URI inline-image extraction (q390) ----


def test_data_uri_extraction_is_jvm_side_and_handles_imageless_docs(spark):
    import base64

    from pyspark.sql import functions as F

    from etl_geonet_quakes_spark.llm.multimodal import (
        _png_encode_rgb,
        decode_png_features,
    )

    png = _png_encode_rgb(7, 16, 8, 59)
    b64 = base64.b64encode(png).decode("ascii")
    rows = [
        (0, f'<img src="data:image/png;base64,{b64}"/>'),
        (1, "<html><p>no image here</p></html>"),  # no match -> poisoned
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    payloads = df.select(
        "doc_id",
        F.unbase64(
            F.regexp_extract(
                F.col("html"), r'data:image/png;base64,([A-Za-z0-9+/=]+)', 1
            )
        ).alias("payload"),
    )
    # the extraction must be a plain JVM Project: the only Python
    # nodes in the full q390 plan are the two mapInPandas codec stages
    import re

    got = {r["doc_id"]: r["valid"] for r in decode_png_features(payloads).collect()}
    assert got == {0: True, 1: False}
    plan = decode_png_features(payloads)._jdf.queryExecution().optimizedPlan().toString()
    assert len(re.findall(r"MapInPandas", plan)) == 1  # only the codec
    assert "regexp_extract" in plan and "unbase64" in plan


# ---- streaming WARC ingestion (q391) ----


def test_stream_warc_ingest_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.llm.multimodal import (
        _warc_gzip_payloads,
        decode_warc_gzip_features,
        media_warc_gzip_stream,
    )

    got = media_warc_gzip_stream(spark, sf_dir).collect()
    batch = (
        decode_warc_gzip_features(
            _warc_gzip_payloads(
                load_table(spark, sf_dir, "documents").select("doc_id", "text")
            )
        )
        .groupBy("valid")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_members").alias("n_members"),
            F.sum("header_len").alias("sum_header_len"),
            F.sum("text_len").alias("sum_text_len"),
        )
        .orderBy("valid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]
    assert got[0]["valid"] is True and got[0]["n_members"] == 2 * got[0]["n_docs"]


# ---- property-based guard: progressive is a lossless re-encoding ----

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        seed=st.integers(0, 2**31 - 1),
        bw=st.integers(1, 3),
        bh=st.integers(1, 3),
        gray=st.booleans(),
    )
    def test_jpeg_progressive_equals_sequential_property(seed, bw, bh, gray):
        # For ANY image content and block-grid shape, SOF2 re-encodes
        # the same quantized coefficients sequential mode carries, so
        # the two decodes must agree bit-exactly.
        from etl_geonet_quakes_spark.llm.multimodal import (
            _jpeg_encode_progressive,
        )

        rng = np.random.RandomState(seed)
        w, h = bw * 8, bh * 8
        if gray:
            img = rng.randint(0, 256, (h, w)).astype(np.int64)
            seq = _jpeg_decode_baseline(
                _jpeg_encode_gray(img.reshape(-1), w, h)
            )
            pro = _jpeg_decode_baseline(_jpeg_encode_progressive([img], w, h))
        else:
            planes = [
                rng.randint(0, 256, (h, w)).astype(np.int64) for _ in range(3)
            ]
            seq = _jpeg_decode_baseline(_jpeg_encode_ycc444(planes, w, h))
            pro = _jpeg_decode_baseline(_jpeg_encode_progressive(planes, w, h))
        assert seq is not None and pro is not None
        for a, b in zip(seq[2], pro[2]):
            assert np.array_equal(a, b)
