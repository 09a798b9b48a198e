"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern (SURVEY.md §2.3): media travels as a ``binary`` column
next to a typed metadata struct (the same nested-struct shape the
reference uses for feature metadata, task.ts:222-232). Everything
Spark-side — schema, partitioning, Arrow batch shape through
mapInPandas — is real and tested, and two codecs are REAL as well,
because their wire formats need only the stdlib: a P6 PPM image
parser (``decode_ppm_features``, q96) and a RIFF/WAVE PCM16 audio
parser (``decode_wav_features``, q97), each hash-checked against a
closed-form oracle that never touches bytes. Library-dependent
codecs (JPEG/PNG/ffmpeg) stay honestly gated: the fake=False generic
path raises ``NotImplementedError`` pointing at the real decoders,
and the deterministic fakes remain for the value-checked plumbing
queries, so a production codec drops in without touching the
plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_geonet_quakes_spark.io import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha", T.StringType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a multimodal table from the documents fixture: the UTF-8
    text bytes stand in for an opaque media payload; metadata struct
    carries kind/size/content-hash. Pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("media_meta"),
    )


def media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-comparable projection over the binary column: sizes and
    content hashes (proves binary columns round-trip correctly)."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha").alias("sha"),
    ).orderBy("doc_id")


_FEATURE_SCHEMA = "doc_id long, n_bytes long, feat_mean double, feat_dim int"


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Feature-extraction over binary payloads via mapInPandas —
    Arrow-batched, partition-parallel, the real 100 TB shape for
    media work (decode happens next to the data, never on the
    driver).

    ``fake=True`` applies the deterministic stand-in (mean byte value
    as a 1-dim "feature"); ``fake=False`` raises NotImplementedError
    where a real decoder (PIL/torchaudio/ffmpeg) would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "generic media decode (JPEG/PNG/audio/video) requires "
                    "codec libraries not present in this environment; wire "
                    "PIL/ffmpeg here. For a REAL no-dependency codec path "
                    "through this exact plumbing see decode_ppm_features "
                    "(stdlib P6 parser, hash-checked end-to-end as q96)."
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    # deterministic fake: mean byte value
                    "feat_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "feat_dim": 1,
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def media_frame_sample(
    spark: SparkSession, sf_dir: str, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Frame sampling over an opaque binary payload: treat the blob as
    fixed-size frames, keep every ``stride``-th frame, emit its bytes'
    checksum — the video-keyframe-sampling shape with a deterministic
    byte-slicing stand-in for a real demuxer. Pure column algebra
    (sequence → filter → explode → substring on binary), so the
    1→N fan-out stays inside codegen and shuffles nothing; a real
    ffmpeg demux would swap into a mapInPandas stage (see
    extract_features) with this exact output schema."""
    m = documents_as_media(spark, sf_dir)
    # explicit floor: double→int CAST truncates in Spark but ROUNDS in
    # DuckDB — floor() agrees everywhere
    n_frames = F.floor(F.col("media_meta.n_bytes") / frame_bytes)
    sampled = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)).cast("int")),
        lambda i: i % stride == 0,
    )
    frame = F.substring(F.col("payload"), F.col("i") * frame_bytes + 1, frame_bytes)
    return (
        m.filter(F.col("media_meta.n_bytes") >= frame_bytes)
        .select("doc_id", "payload", F.explode(sampled).alias("i"))
        .select(
            "doc_id",
            F.col("i").cast("long").alias("frame_idx"),
            F.md5(frame).alias("frame_md5"),
        )
        .orderBy("doc_id", "frame_idx")
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: build media table → mapInPandas
    feature extraction → stable ordering. (No SQL oracle — the
    mapInPandas stage is outside DuckDB's vocabulary; driver records
    rows-only. The byte-stats query above carries the hash-level
    check for the binary plumbing.)"""
    return extract_features(documents_as_media(spark, sf_dir)).orderBy("doc_id")


_PPM_SCHEMA = (
    "doc_id long, valid boolean, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def synthesize_ppm_media(
    spark: SparkSession, sf_dir: str, width: int = 16, height: int = 8
) -> DataFrame:
    """Deterministic REAL image files as binary payloads: one P6 PPM
    per document, pixel stream value(k) = (doc_id·31 + k) mod 256.
    The closed-form spec is what lets an external oracle verify the
    decoder without ever parsing bytes itself."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = width * height * 3
                px = bytes((int(doc_id) * 31 + k) % 256 for k in range(n))
                payloads.append(b"P6\n%d %d\n255\n" % (width, height) + px)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def decode_ppm_features(df: DataFrame) -> DataFrame:
    """A REAL codec, no external libraries: parse the P6 PPM wire
    format (magic, whitespace-separated dimensions + maxval header,
    raw RGB24 payload) and emit per-channel means. This is the
    fake=False path the container could not previously exercise —
    the decoder runs against bytes produced by a SEPARATE stage, so
    a header-offset or stride bug fails the cross-engine hash check
    rather than cancelling out.

    One-poisoned-row policy: malformed payloads (bad magic, truncated
    pixels, unsupported maxval) yield valid=false + NULL features,
    never a job failure — at 100 TB a corrupt blob must not kill the
    scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(buf):
            try:
                if not isinstance(buf, (bytes, bytearray)) or buf[:2] != b"P6":
                    return None
                # header = magic + 3 whitespace-separated ints, then
                # exactly ONE whitespace byte before the raster
                fields, i, tok = [], 2, b""
                while len(fields) < 3 and i < len(buf):
                    c = buf[i : i + 1]
                    if c.isspace():
                        if tok:
                            fields.append(int(tok))
                            tok = b""
                    elif c.isdigit():
                        tok += c
                    else:
                        return None
                    i += 1
                if len(fields) < 3:
                    return None
                w, h, maxval = fields
                if maxval != 255 or w <= 0 or h <= 0:
                    return None
                px = buf[i : i + w * h * 3]
                if len(px) != w * h * 3:
                    return None
                sums = [0, 0, 0]
                for k, v in enumerate(px):
                    sums[k % 3] += v
                n = w * h
                return (w, h, sums[0] / n, sums[1] / n, sums[2] / n)
            except Exception:
                return None

        for pdf in batches:
            out = {
                "doc_id": [], "valid": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                r = decode(buf)
                out["doc_id"].append(doc_id)
                out["valid"].append(r is not None)
                out["width"].append(r[0] if r else None)
                out["height"].append(r[1] if r else None)
                out["mean_r"].append(r[2] if r else None)
                out["mean_g"].append(r[3] if r else None)
                out["mean_b"].append(r[4] if r else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=_PPM_SCHEMA)


def media_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real-codec path: synthesize P6 files → parse them
    back with the stdlib-only decoder → per-channel means, ordered.
    Oracle side replays the closed-form pixel spec, never the bytes."""
    return (
        decode_ppm_features(synthesize_ppm_media(spark, sf_dir))
        .orderBy("doc_id")
    )


_WAV_SCHEMA = (
    "doc_id long, valid boolean, n_samples int, sample_rate int, "
    "duration_ms double, mean double, rms double"
)


def synthesize_wav_media(
    spark: SparkSession, sf_dir: str, n_samples: int = 256, rate: int = 8000
) -> DataFrame:
    """Deterministic REAL audio files: one RIFF/WAVE (mono PCM16 LE)
    per document, sample stream s(k) = ((doc_id·7 + k·13) mod 65536)
    − 32768 — closed-form, so the decode oracle never parses bytes."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                samples = [
                    ((int(doc_id) * 7 + k * 13) % 65536) - 32768
                    for k in range(n_samples)
                ]
                data = struct.pack("<%dh" % n_samples, *samples)
                fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                payloads.append(b"RIFF" + struct.pack("<I", len(body)) + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def decode_wav_features(df: DataFrame) -> DataFrame:
    """A REAL audio codec, stdlib only: walk the RIFF chunk list
    (magic, WAVE form type, fmt /data chunks with little-endian
    sizes), require mono PCM16, and emit duration + exact mean and
    RMS. Division is by the power-of-two sample count and sum/ssq fit
    in 2^53, so mean and ssq/n are EXACT doubles and IEEE sqrt makes
    rms bit-identical on any engine — no rounding step needed.

    One-poisoned-row policy: non-RIFF blobs, missing chunks,
    compressed or multi-channel formats, truncated data → valid=false
    + NULL features, never a job failure."""
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(buf):
            try:
                if not isinstance(buf, (bytes, bytearray)) or len(buf) < 12:
                    return None
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    return None
                i, fmt, data = 12, None, None
                while i + 8 <= len(buf):
                    cid = bytes(buf[i : i + 4])
                    (sz,) = struct.unpack_from("<I", buf, i + 4)
                    if cid == b"fmt " and sz >= 16:
                        fmt = struct.unpack_from("<HHIIHH", buf, i + 8)
                    elif cid == b"data":
                        data = bytes(buf[i + 8 : i + 8 + sz])
                        if len(data) != sz:
                            return None  # truncated raster
                    i += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
                if fmt is None or data is None:
                    return None
                audio_fmt, channels, rate, _, _, bits = fmt
                if audio_fmt != 1 or channels != 1 or bits != 16:
                    return None
                n = len(data) // 2
                if n == 0 or len(data) % 2:
                    return None
                samples = struct.unpack("<%dh" % n, data)
                s1 = sum(samples)
                s2 = sum(v * v for v in samples)
                # math.sqrt, NOT ** 0.5: pow(x, 0.5) is not guaranteed
                # correctly rounded, IEEE sqrt is — rms must be
                # bit-identical to the oracle's sqrt()
                import math

                return (
                    n, rate, n * 1000.0 / rate,
                    s1 / n, math.sqrt(s2 / n),
                )
            except Exception:
                return None

        for pdf in batches:
            out = {
                "doc_id": [], "valid": [], "n_samples": [], "sample_rate": [],
                "duration_ms": [], "mean": [], "rms": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                r = decode(buf)
                out["doc_id"].append(doc_id)
                out["valid"].append(r is not None)
                for col, j in (
                    ("n_samples", 0), ("sample_rate", 1),
                    ("duration_ms", 2), ("mean", 3), ("rms", 4),
                ):
                    out[col].append(r[j] if r else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=_WAV_SCHEMA)


def media_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real-audio path: synthesize RIFF/WAVE files → parse
    them back with the stdlib chunk-walking decoder → duration/mean/
    RMS, ordered. The audio twin of media_ppm_decode (q96)."""
    return (
        decode_wav_features(synthesize_wav_media(spark, sf_dir))
        .orderBy("doc_id")
    )


_PNG_SCHEMA = (
    "doc_id long, valid boolean, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec §9.4 Paeth predictor (left, up, upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synthesize_png_media(
    spark: SparkSession, sf_dir: str, width: int = 16, height: int = 8
) -> DataFrame:
    """Deterministic REAL PNG files: 8-bit RGB, non-interlaced, pixel
    stream value(k) = (doc_id·37 + k) mod 256, one zlib-compressed
    IDAT with correct CRC32s. Each scanline uses filter type
    (doc_id + row) mod 5, so across the corpus ALL FIVE PNG filters
    (None/Sub/Up/Average/Paeth) are encoded forward here and must be
    inverted by the decoder — a filter-math bug cannot cancel out,
    because the oracle replays the RAW pixel spec, never the bytes."""
    import struct
    import zlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + ctype
                + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        def encode(doc_id: int) -> bytes:
            stride = width * 3
            raw_rows = [
                bytes(
                    (doc_id * 37 + row * stride + i) % 256 for i in range(stride)
                )
                for row in range(height)
            ]
            scanlines = bytearray()
            for row, raw in enumerate(raw_rows):
                prior = raw_rows[row - 1] if row else bytes(stride)
                ft = (doc_id + row) % 5
                scanlines.append(ft)
                for i in range(stride):
                    left = raw[i - 3] if i >= 3 else 0
                    up = prior[i]
                    ul = prior[i - 3] if i >= 3 else 0
                    if ft == 0:
                        pred = 0
                    elif ft == 1:
                        pred = left
                    elif ft == 2:
                        pred = up
                    elif ft == 3:
                        pred = (left + up) >> 1
                    else:
                        pred = _paeth(left, up, ul)
                    scanlines.append((raw[i] - pred) & 0xFF)
            ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
            return (
                _PNG_SIG
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode(int(d)) for d in pdf["doc_id"]],
                }
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(gen, schema="doc_id long, payload binary")


def decode_png_features(df: DataFrame) -> DataFrame:
    """A REAL image codec, stdlib only (struct + zlib): verify the
    8-byte signature, walk the chunk list CHECKING EVERY CRC32, parse
    IHDR (require 8-bit/RGB/deflate/adaptive-filter/non-interlaced),
    concatenate IDATs, inflate, then invert the per-scanline adaptive
    filter — all five types, Paeth included — and emit per-channel
    means. Filters make this a genuinely stateful decode (each row
    reconstructs against the previous RECONSTRUCTED row), so this is
    the closest a stdlib codec gets to the PIL/libpng path the
    container lacks; a library build swaps into the same mapInPandas
    stage and schema.

    One-poisoned-row policy: bad signature, CRC mismatch, truncated
    or inconsistent chunks, unsupported bit depth / color type /
    interlace, wrong inflated length, unknown filter type → all yield
    valid=false + NULL features, never a job failure."""
    import struct
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(buf):
            try:
                if not isinstance(buf, (bytes, bytearray)):
                    return None
                buf = bytes(buf)
                if buf[:8] != _PNG_SIG:
                    return None
                i, ihdr, idat, ended = 8, None, b"", False
                while i + 12 <= len(buf):
                    (ln,) = struct.unpack_from(">I", buf, i)
                    ctype = buf[i + 4 : i + 8]
                    data = buf[i + 8 : i + 8 + ln]
                    if len(data) != ln:
                        return None
                    (crc,) = struct.unpack_from(">I", buf, i + 8 + ln)
                    if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                        return None
                    if ctype == b"IHDR":
                        ihdr = struct.unpack(">IIBBBBB", data)
                    elif ctype == b"IDAT":
                        idat += data
                    elif ctype == b"IEND":
                        ended = True
                        break
                    i += 12 + ln
                if ihdr is None or not idat or not ended:
                    return None
                w, h, depth, color, comp, filt, interlace = ihdr
                if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                    return None
                if w <= 0 or h <= 0:
                    return None
                stride = w * 3
                raw = zlib.decompress(idat)
                if len(raw) != h * (1 + stride):
                    return None
                sums = [0, 0, 0]
                prior = bytes(stride)
                for row in range(h):
                    base = row * (1 + stride)
                    ft = raw[base]
                    line = raw[base + 1 : base + 1 + stride]
                    recon = bytearray(stride)
                    for i2 in range(stride):
                        left = recon[i2 - 3] if i2 >= 3 else 0
                        up = prior[i2]
                        ul = prior[i2 - 3] if i2 >= 3 else 0
                        if ft == 0:
                            pred = 0
                        elif ft == 1:
                            pred = left
                        elif ft == 2:
                            pred = up
                        elif ft == 3:
                            pred = (left + up) >> 1
                        elif ft == 4:
                            pred = _paeth(left, up, ul)
                        else:
                            return None
                        recon[i2] = (line[i2] + pred) & 0xFF
                        sums[i2 % 3] += recon[i2]
                    prior = bytes(recon)
                n = w * h
                return (w, h, sums[0] / n, sums[1] / n, sums[2] / n)
            except Exception:
                return None

        for pdf in batches:
            out = {
                "doc_id": [], "valid": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                r = decode(buf)
                out["doc_id"].append(doc_id)
                out["valid"].append(r is not None)
                for col, j in (
                    ("width", 0), ("height", 1),
                    ("mean_r", 2), ("mean_g", 3), ("mean_b", 4),
                ):
                    out[col].append(r[j] if r else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=_PNG_SCHEMA)


def media_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real-PNG path: synthesize signed/CRC'd/deflated PNG
    files (all five adaptive filters across the corpus) → parse them
    back with the stdlib decoder → per-channel means, ordered. Oracle
    side replays the closed-form pixel spec, never the bytes."""
    return (
        decode_png_features(synthesize_png_media(spark, sf_dir))
        .orderBy("doc_id")
    )


def media_resize(spark: SparkSession, sf_dir: str, out_len: int = 16) -> DataFrame:
    """Resize plumbing for opaque media: nearest-neighbor resample of
    the payload to a fixed ``out_len`` bytes — the 1-D stand-in for
    image thumbnailing, as pure column algebra (sequence → transform →
    substring → join) so it never leaves codegen. A real pixel-space
    resize swaps into the mapInPandas stage (see extract_features)
    with this same fixed-size output contract; fixed-size outputs are
    what keep downstream batch shapes uniform at 100 TB. ASCII fixture
    ⇒ char ops ≡ byte ops on both engines (DuckDB md5 is VARCHAR-only,
    reference: task.ts has no media path at all — SURVEY §2.3)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= out_len
    )
    resized = F.expr(
        f"array_join(transform(sequence(0, {out_len - 1}), "
        f"i -> substring(text, CAST(floor(i * length(text) / {out_len}) AS INT) + 1, 1)"
        f"), '')"
    )
    return d.select(
        "doc_id",
        resized.alias("resized"),
        F.md5(resized.cast("binary")).alias("resized_md5"),
    ).orderBy("doc_id")
