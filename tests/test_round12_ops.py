"""Round-12 regression tests for the advisor findings:

1. bm25_topk / rrf_hybrid_fusion pivoted the query terms to columns
   (the round-11 fixed-order-scoring fix) but took the term list from
   query.split() verbatim — a REPEATED query term produced duplicate
   pivot columns, so F.col(term) either raised an ambiguous-column
   AnalysisException or double-counted the term. Both now dedup the
   term list order-preservingly; BM25 scores a term SET (tf already
   counts within-document repetitions), so a duplicated query must
   score identically to the deduped one.

2. The fence-class audit (unrounded order-dependent float rank key
   under LIMIT — the q101/q279 sf1.0 bug class) was a manual one-off
   in round 11; tests/test_registry_guard.py now carries the standing
   static check. Its discriminating power is mutation-tested there.
"""

from __future__ import annotations

from etl_geonet_quakes_spark.llm import similarity, text


def test_bm25_duplicate_query_terms_match_deduped(spark, sf_dir):
    dup = text.bm25_topk(spark, sf_dir, query="spark hash join window spark hash", k=10)
    ded = text.bm25_topk(spark, sf_dir, query="spark hash join window", k=10)
    assert [tuple(r) for r in dup.collect()] == [tuple(r) for r in ded.collect()]


def test_rrf_duplicate_query_terms_match_deduped(spark, sf_dir):
    dup = similarity.rrf_hybrid_fusion(
        spark, sf_dir, query_terms=("spark", "hash", "join", "window", "spark")
    )
    ded = similarity.rrf_hybrid_fusion(
        spark, sf_dir, query_terms=("spark", "hash", "join", "window")
    )
    assert [tuple(r) for r in dup.collect()] == [tuple(r) for r in ded.collect()]


# ---------------------------------------------------------------------------
# Round-12 REAL JPEG codec (closes the round-11 verdict's missing #2:
# "real image decode" was PIL-gated; baseline grayscale JPEG needs no
# library). The q381 oracle covers the exactly-invertible uniform-
# even-block subset; these tests pin the LOSSY general path against
# an independent transform-layer reference (numpy DCT->quant->
# dequant->IDCT, no bitstream), so the Huffman/bitstream layers are
# validated independently of the transform layers.
# ---------------------------------------------------------------------------


def _jpeg_transform_reference(img):
    """Independent lossy reference: what a correct baseline codec must
    reproduce bit-exactly, computed without any bitstream."""
    import numpy as np

    from etl_geonet_quakes_spark.llm.multimodal import _JPEG_QTABLE

    q = np.array(_JPEG_QTABLE, dtype=np.float64).reshape(8, 8)
    x = np.arange(8)
    u = np.arange(8).reshape(8, 1)
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    h, w = img.shape
    ref = np.zeros_like(img)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            qc = np.rint((a @ blk @ a.T) / q)
            r = a.T @ (qc * q) @ a
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(r + 128.0), 0, 255
            )
    return ref


def test_jpeg_lossy_path_matches_independent_reference():
    import numpy as np

    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_gray,
        _jpeg_encode_gray,
    )

    for h, w, f in [
        (16, 24, lambda y, x: (3 * x + 5 * y + 7) % 256),
        (8, 8, lambda y, x: (x * y * 11 + 13) % 256),
        (32, 16, lambda y, x: (x * x + y) % 256),
    ]:
        img = np.fromfunction(f, (h, w)).astype(np.int64)
        got = _jpeg_decode_gray(_jpeg_encode_gray(img.reshape(-1), w, h))
        assert got is not None
        gw, gh, px = got
        assert (gw, gh) == (w, h)
        assert np.array_equal(px, _jpeg_transform_reference(img))


def test_jpeg_poisoned_rows_yield_invalid_not_failure(spark):
    import pandas as pd

    from etl_geonet_quakes_spark.llm.multimodal import decode_jpeg_features

    rows = [
        (1, b""),  # empty
        (2, b"\xff\xd8\xff\xd9"),  # SOI+EOI, no scan
        (3, b"\x89PNG\r\n\x1a\n" + b"x" * 40),  # a PNG, not a JPEG
        (4, None),  # null payload
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_jpeg_features(df).collect()}
    assert all(not out[i]["valid"] for i in (1, 2, 3, 4))
    assert all(out[i]["pixel_sum"] is None for i in (1, 2, 3, 4))


def test_jpeg_truncated_scan_is_invalid(spark):
    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_gray,
        _jpeg_encode_gray,
    )
    import numpy as np

    img = np.fromfunction(lambda y, x: (3 * x + 5 * y) % 256, (16, 16)).astype(
        np.int64
    )
    buf = _jpeg_encode_gray(img.reshape(-1), 16, 16)
    assert _jpeg_decode_gray(buf) is not None
    assert _jpeg_decode_gray(buf[: len(buf) // 2]) is None


def test_jpeg_q381_end_to_end_matches_pixel_spec(spark, sf_dir):
    from etl_geonet_quakes_spark.llm.multimodal import media_jpeg_decode

    rows = media_jpeg_decode(spark, sf_dir).collect()
    assert rows, "no documents decoded"
    for r in rows:
        d = r["doc_id"]
        vs = [2 * ((d * 31 + k * 97) % 128) for k in range(4)]
        assert r["valid"]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["pixel_sum"] == 64 * sum(vs)
        assert r["px_first"] == vs[0]
        assert r["px_last"] == vs[3]


# --- color JPEG (q382): 4:4:4 interleaved, per-component DC predictors ---


def test_jpeg_color_lossy_path_matches_per_plane_reference():
    import numpy as np

    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_baseline,
        _jpeg_encode_ycc444,
    )

    planes = [
        np.fromfunction(
            lambda y, x, c=ci: (3 * x + 5 * y + 7 * (c + 1)) % 256, (16, 24)
        ).astype(np.int64)
        for ci in range(3)
    ]
    r = _jpeg_decode_baseline(_jpeg_encode_ycc444(planes, 24, 16))
    assert r is not None
    w, h, got, samps = r
    assert (w, h, len(got)) == (24, 16, 3)
    assert samps == [(1, 1)] * 3
    for ci in range(3):
        assert np.array_equal(got[ci], _jpeg_transform_reference(planes[ci]))


def test_jpeg_gray_and_color_streams_cross_reject(spark):
    import numpy as np

    from etl_geonet_quakes_spark.llm.multimodal import (
        _jpeg_decode_gray,
        _jpeg_encode_gray,
        _jpeg_encode_ycc444,
        decode_jpeg_color_features,
    )

    img = np.full((8, 8), 100, dtype=np.int64)
    gray = _jpeg_encode_gray(img.reshape(-1), 8, 8)
    color = _jpeg_encode_ycc444([img, img, img], 8, 8)
    # a color stream is a poisoned row for the grayscale contract
    assert _jpeg_decode_gray(color) is None
    assert _jpeg_decode_gray(gray) is not None
    # and a grayscale stream is a poisoned row for the color contract
    df = spark.createDataFrame(
        [(1, bytearray(gray)), (2, bytearray(color))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_jpeg_color_features(df).collect()}
    assert not out[1]["valid"] and out[1]["sum_y"] is None
    assert out[2]["valid"] and out[2]["sum_y"] == 64 * 100


def test_jpeg_q382_end_to_end_matches_pixel_spec(spark, sf_dir):
    from etl_geonet_quakes_spark.llm.multimodal import media_jpeg_color_decode

    rows = media_jpeg_color_decode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        assert r["valid"] and (r["width"], r["height"]) == (16, 16)
        for ci, (s_key, p_key) in enumerate(
            [("sum_y", "px_y"), ("sum_cb", "px_cb"), ("sum_cr", "px_cr")]
        ):
            vs = [2 * ((d * 31 + ci * 53 + k * 97) % 128) for k in range(4)]
            assert r[s_key] == 64 * sum(vs)
            assert r[p_key] == vs[3]
