"""Boundary-document parity: the fixture corpus is uniform word soup
(~100+ tokens/doc), so the short-doc / empty-doc / degenerate-repeat
branches of the text operators never fire in the standard parity run.
This suite builds a tiny synthetic documents table full of exactly
those boundaries, registers it as the DuckDB `documents` view, and
re-runs the SAME registry oracles against it — Spark and DuckDB must
still agree bit-for-bit on the edges.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_geonet_quakes_spark.queries import SPECS

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "edge"),  # empty document
    (1, "one", "en", "edge"),  # single token (< shingle width)
    (2, "two tokens", "en", "edge"),  # below 3-gram width
    (3, "exactly three tokens", "en", "edge"),  # one shingle exactly
    (4, " ".join(f"w{i}" for i in range(15)), "de", "edge"),  # < chunk overlap
    (5, " ".join(f"w{i}" for i in range(16)), "de", "edge"),  # == overlap
    (6, " ".join(f"w{i}" for i in range(17)), "de", "edge"),  # overlap + 1
    (7, " ".join(f"w{i}" for i in range(64)), "fr", "edge"),  # == chunk size
    (8, " ".join(f"w{i}" for i in range(65)), "fr", "edge"),  # chunk + 1
    (9, "spam ham " * 40 + "spam ham", "es", "edge"),  # degenerate repeat
    (10, "exactly three tokens", "en", "edge"),  # exact dup of doc 3
    # PII-bearing docs (the real fixture corpus carries no PII)
    (11, "contact john.doe@example.com or call 0211234567 ref 123456789012", "en", "edge"),
    (12, "email a@b.co twice a@b.co short digits 12345678", "en", "edge"),
    (13, "Reach John.Doe@Example.COM or 123456789@mail.com now", "en", "edge"),
]

# Edge-safe queries whose oracles only touch `documents`
EDGE_QUERIES = [
    "q90_chunking",
    "q91_repetition_score",
    "q39_dedup_simhash",
    "q29_fingerprint_winnow",
    "q41_dedup_exact",
    "q46_stratified_sample",
    "q47_corpus_dedup_pipeline",
    "q25_fingerprint",
    "q22_token_stats",
    "q23_quality_score",
    "q24_language_id",
    "q26_token_frequency_topk",
    "q27_tfidf_top_terms",
    "q28_regex_tokens",
    "q30_doc_stats_by_source",
    "q31_media_byte_stats",
    "q32_media_features",
    "q33_media_frame_sample",
    "q34_media_resize",
    "q38_dedup_minhash_lsh",
    "q40_dedup_ngram_jaccard",
    "q45_dedup_clusters",
    "q89_decontamination",
    "q92_redact_pii",
    "q93_dedup_keep_canonical",
    "q94_pack_sequences",
    "q95_vocab_coverage",
    "q96_media_ppm_decode",
    "q97_media_wav_decode",
    # round-4 documents-based additions: PNG codec (doc_id-driven
    # payloads), weighted sampling (empty doc has n_chars=0 → the
    # w>0 guard fires), BM25 (no query term appears in the edge
    # corpus → both engines must return an EMPTY result, not error)
    "q98_media_png_decode",
    "q100_weighted_sample",
    "q101_bm25_topk",
    # round-5 documents-based additions: AND retrieval (no doc holds
    # all query terms -> empty result, not error), token entropy
    # (empty/1-token docs fall under min_tokens), hash reservoir
    # (single source, fewer docs than k branches), bigram-LM scoring
    # (0- and 1-token docs produce no bigram evidence and must be
    # EXCLUDED identically), bounded BFS (doc 0 is the only seed).
    "q132_retrieval_and",
    "q133_token_entropy",
    "q134_group_reservoir",
    "q147_perplexity_score",
    "q146_graph_bfs",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("edge_corpus"))
    rows = [
        (doc_id, text, lang, source, len(text))
        for doc_id, text, lang, source in EDGE_DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def edge_ddb(edge_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_dir, edge_ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, edge_dir)
    cols = sorted(sdf.columns)
    key = lambda row: tuple((v is None, repr(v)) for v in row)  # noqa: E731
    s = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
    res = edge_ddb.sql(spec.oracle)
    idx = {c: i for i, c in enumerate(res.columns)}
    d = sorted((tuple(r[idx[c]] for c in cols) for r in res.fetchall()), key=key)
    assert cols == sorted(res.columns), f"{name}: column mismatch"
    assert s == d, f"{name}: edge-corpus divergence; first spark rows {s[:3]}"


UNICODE_DOCS = [
    # (doc_id, text, lang, source) — 1/2/3/4-byte UTF-8 mixes: the
    # byte-level oracles (q31 sizes/hashes, q32 mean byte value) must
    # agree with Spark on real multi-byte payloads, not just the
    # ASCII fixture corpus where codepoint == byte
    (0, "plain ascii baseline", "en", "uni"),
    (1, "héllo wörld – naïve café", "fr", "uni"),
    (2, "日本語のテキストです", "ja", "uni"),
    (3, "emoji mix 🎉🚀🌍 done", "en", "uni"),
    (4, "mixed ñ 中 🎉 ascii", "es", "uni"),
    (5, "", "en", "uni"),
]

# Queries whose semantics are defined over UTF-8 BYTES end-to-end
# (q33/q34 stay out: their oracles are deliberately char-based and
# documented ASCII-equivalent, Spark slices the binary payload)
UNICODE_BYTE_QUERIES = ["q31_media_byte_stats", "q32_media_features"]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("unicode_corpus"))
    rows = [
        (doc_id, text, lang, source, len(text))
        for doc_id, text, lang, source in UNICODE_DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def unicode_ddb(unicode_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{unicode_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", UNICODE_BYTE_QUERIES)
def test_unicode_corpus_matches_oracle(name, spark, unicode_dir, unicode_ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, unicode_dir)
    cols = sorted(sdf.columns)
    key = lambda row: tuple((v is None, repr(v)) for v in row)  # noqa: E731
    s = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
    res = unicode_ddb.sql(spec.oracle)
    idx = {c: i for i, c in enumerate(res.columns)}
    d = sorted((tuple(r[idx[c]] for c in cols) for r in res.fetchall()), key=key)
    assert cols == sorted(res.columns), f"{name}: column mismatch"
    assert s == d, f"{name}: unicode divergence; first spark rows {s[:3]}"


def test_unicode_feat_mean_matches_python(spark, unicode_dir):
    """Ground-truth anchor: both engines must equal Python's own UTF-8
    encoder, not merely each other."""
    from etl_geonet_quakes_spark.llm import multimodal

    out = {r["doc_id"]: r for r in multimodal.media_features(spark, unicode_dir).collect()}
    for doc_id, text, _, _ in UNICODE_DOCS:
        b = text.encode("utf-8")
        expect = float(sum(b)) / len(b) if b else 0.0
        assert out[doc_id]["n_bytes"] == len(b)
        assert abs(out[doc_id]["feat_mean"] - expect) < 1e-12, (doc_id, text)


def test_edge_chunking_tiles_exactly(spark, edge_dir):
    from pyspark.sql import functions as F
    from etl_geonet_quakes_spark.llm import corpus

    rows = corpus.chunk_documents(spark, edge_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text, _, _ in EDGE_DOCS:
        toks = text.split(" ")
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert chunks, f"doc {doc_id} produced no chunks"
        end = max(r["chunk_idx"] * 48 + r["chunk_len"] for r in chunks)
        assert end == len(toks)


def test_edge_repetition_flags_degenerate_doc(spark, edge_dir):
    from etl_geonet_quakes_spark.llm import corpus

    out = {r["doc_id"]: r for r in corpus.repetition_score(spark, edge_dir).collect()}
    # doc 9 is "spam ham" repeated: 'ham spam' and 'spam ham' dominate
    assert out[9]["top_2gram_frac"] > 0.4
    assert out[9]["dup_token_frac"] > 0.9
    # doc 7 is all-distinct tokens: no repetition at all
    assert out[7]["dup_token_frac"] == 0.0
    assert out[7]["top_2gram_frac"] < 0.05


@pytest.fixture(scope="module")
def edge_vec_dir(spark, tmp_path_factory) -> str:
    import random

    random.seed(3)
    path = str(tmp_path_factory.mktemp("edge_vectors"))

    def vec(f):
        return [float(f(i)) for i in range(64)]

    rows = [
        (0, "a", vec(lambda i: 0.0)),  # zero-norm: must be excluded
        (1, "a", vec(lambda i: 1.0)),  # constant vector
        (2, "a", vec(lambda i: 1.0)),  # exact duplicate (cosine 1.0)
        (3, "b", vec(lambda i: (-1.0) ** i)),  # alternating signs
        (4, "b", vec(lambda i: random.gauss(0, 1))),
        (5, "b", vec(lambda i: random.gauss(0, 1))),
    ] + [
        (vid, "c", vec(lambda i: random.gauss(0, 1))) for vid in range(6, 12)
    ]
    spark.createDataFrame(
        rows, "vec_id: long, label: string, embedding: array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


@pytest.fixture(scope="module")
def edge_vec_ddb(edge_vec_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{edge_vec_dir}/embeddings.parquet/*.parquet')"
    )
    return con


VECTOR_QUERIES = [
    "q20_embedding_norms",
    "q42_dedup_embedding_cosine",
    "q43_similarity_bruteforce",
    "q44_similarity_lsh",
    "q21_similarity_ivf",
    # round-4 embedding queries: the zero-norm exclusion guard and
    # the constant/duplicate/alternating vectors exercise the
    # assignment + quantization edges (constant vector quantizes with
    # zero error; duplicates must land in the same k-means cell)
    "q102_kmeans_step",
    "q107_embedding_quantize",
    # round-5: power iteration must exclude the zero vector on both
    # engines and converge identically from the edge fixture
    "q152_power_iteration",
]


@pytest.mark.parametrize("name", VECTOR_QUERIES)
def test_edge_vectors_match_oracle(name, spark, edge_vec_dir, edge_vec_ddb):
    """Zero-norm vectors must not crash (ANSI 0/0) nor diverge between
    engines — similarity ops exclude them; norms keep them."""
    spec = SPECS[name]
    sdf = spec.fn(spark, edge_vec_dir)
    cols = sorted(sdf.columns)
    key = lambda row: tuple((v is None, repr(v)) for v in row)  # noqa: E731
    s = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
    res = edge_vec_ddb.sql(spec.oracle)
    idx = {c: i for i, c in enumerate(res.columns)}
    d = sorted((tuple(r[idx[c]] for c in cols) for r in res.fetchall()), key=key)
    assert cols == sorted(res.columns), f"{name}: column mismatch"
    assert s == d, f"{name}: edge-vector divergence; first spark rows {s[:3]}"


def test_edge_vectors_zero_norm_excluded_from_similarity(spark, edge_vec_dir):
    from etl_geonet_quakes_spark.llm import similarity

    out = similarity.topk_bruteforce(spark, edge_vec_dir).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert 0 not in ids  # the zero vector has no direction
    # exact duplicates must surface as cosine 1.0 neighbors
    dup = [r for r in out if r["query_id"] == 1 and r["neighbor_id"] == 2]
    assert dup and dup[0]["cos"] == 1.0 and dup[0]["rnk"] == 1


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory) -> str:
    """Synthetic events with the hostile rows production streams carry:
    malformed JSON props, missing/non-numeric keys, identical
    timestamps for one user (tie-break determinism), single-event
    users. Written via pyarrow with timestamp[ns] to match the real
    fixture's physical type (io.load_table's ns handling must fire)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("edge_events"))
    base = 1704067200 * 10**9  # 2024-01-01T00:00:00Z in ns
    m = 60 * 10**9
    rows = [
        # user 1: click → purchase within 10 min, well-formed props
        (0, base + 1 * m, 1, "click", 10.0, '{"k": 5}'),
        (1, base + 5 * m, 1, "purchase", 99.99, '{"k": 7}'),
        # user 1 much later: second session
        (2, base + 200 * m, 1, "view", 1.5, '{"k": 1}'),
        # user 2: two events at the IDENTICAL instant (tie-break)
        (3, base + 2 * m, 2, "click", 3.0, '{"k": 2}'),
        (4, base + 2 * m, 2, "click", 4.0, '{"k": 3}'),
        # user 3: single event, malformed JSON props
        (5, base + 3 * m, 3, "signup", 0.0, "{not json"),
        # user 4: props missing k / non-numeric k
        (6, base + 4 * m, 4, "view", 2.0, "{}"),
        (7, base + 6 * m, 4, "error", 5.0, '{"k": "abc"}'),
        # user 5: purchase with no preceding click (as-of NULL)
        (8, base + 7 * m, 5, "purchase", 49.5, '{"k": 9}'),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")
    return path


@pytest.fixture(scope="module")
def edge_events_ddb(edge_events_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{edge_events_dir}/events.parquet')"
    )
    return con


# Events queries whose oracles stay well-defined on the hostile rows
# (q15 VARIANT / q79 JSON are checked Spark-side below instead: DuckDB
# json_extract ERRORS on malformed JSON, so no cross-engine oracle)
EDGE_EVENT_QUERIES = [
    "q50_sessionization",
    "q16_window_ignore_nulls",
    "q81_time_window_tumbling",
    "q78_case_when_buckets",
    "q49_join_asof",
    # round-5 events-based additions: identical-instant rows exercise
    # the (ts, event_id) tie-breaks in path assembly and frame order;
    # single-event users hit the 1-row frame / 1-step path branches;
    # interp must pass observed days through and bridge the 200-min
    # gap user linearly.
    "q128_session_paths",
    "q143_window_distinct",
    "q145_interp_gapfill",
    "q149_rolling_median",
]


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_match_oracle(name, spark, edge_events_dir, edge_events_ddb):
    spec = SPECS[name]
    sdf = spec.fn(spark, edge_events_dir)
    cols = sorted(sdf.columns)
    key = lambda row: tuple((v is None, repr(v)) for v in row)  # noqa: E731
    s = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
    res = edge_events_ddb.sql(spec.oracle)
    idx = {c: i for i, c in enumerate(res.columns)}
    d = sorted((tuple(r[idx[c]] for c in cols) for r in res.fetchall()), key=key)
    assert cols == sorted(res.columns), f"{name}: column mismatch"
    assert s == d, f"{name}: edge-events divergence; first spark rows {s[:3]}"


def test_edge_events_poisoned_json_yields_nulls(spark, edge_events_dir):
    """Malformed props and non-numeric keys must become NULLs, never
    runtime errors — the one-poisoned-row policy."""
    from etl_geonet_quakes_spark.operators import relational as rel

    v = {r["event_id"]: r for r in rel.variant_ops(spark, edge_events_dir).collect()}
    assert v[5]["k"] is None  # malformed JSON row survived as NULL
    assert v[6]["k"] is None  # missing key
    assert v[7]["k"] is None  # non-numeric k
    assert v[0]["k"] == 5 and v[0]["k_mod7"] == 5  # good rows intact

    agg = {r["event_type"]: r for r in rel.json_extraction(spark, edge_events_dir).collect()}
    assert agg["signup"]["n"] == 0  # the malformed row counts nothing
    assert agg["error"]["n"] == 0  # non-numeric k ignored
    assert agg["click"]["n"] == 3


CLIQUE_N = 200  # one boilerplate near-dup clique (round-4 scale item)
STAR_LEAVES = 8  # skew probe: hub similar to every leaf, leaves not to each other


@pytest.fixture(scope="module")
def clique_dir(spark, tmp_path_factory) -> str:
    """Adversarial dedup-graph shapes a real 100 TB corpus always has:
    a ~200-doc near-identical boilerplate CLIQUE (every pair Jaccard
    1.0) plus a hub-and-spoke STAR (hub ≥ 0.8-similar to each leaf,
    leaves pairwise 0.76 < τ — possible because Jaccard is not
    transitive), plus isolated docs. The clique makes any un-oriented
    wedge join blow up; the star makes per-vertex deg² blow up at the
    hub even when triangles are zero."""
    path = str(tmp_path_factory.mktemp("clique_corpus"))
    clique_text = " ".join(f"boiler{i}" for i in range(40))
    hub_toks = [f"star{i}" for i in range(100)]
    rows = [(i, clique_text, "en", "cliq") for i in range(CLIQUE_N)]
    rows.append((1000, " ".join(hub_toks), "en", "star"))
    for j in range(STAR_LEAVES):
        # leaf j drops a distinct 12-token block: J(hub, leaf) = 88/100
        # = 0.88 ≥ τ; J(leaf_i, leaf_j) = 76/100 = 0.76 < τ
        keep = [t for k, t in enumerate(hub_toks) if not (12 * j <= k < 12 * j + 12)]
        rows.append((1001 + j, " ".join(keep), "en", "star"))
    rows.append((2000, "an unrelated isolated document", "en", "iso"))
    rows.append((2001, "another genuinely unique text body", "en", "iso"))
    rows = [(doc_id, text, lang, source, len(text)) for doc_id, text, lang, source in rows]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_clique_corpus_triangle_census_matches_oracle(spark, clique_dir):
    """Cross-engine check ON the adversarial shape: the degree-oriented
    Spark join must produce the identical census to DuckDB's naive
    canonical 3-way join — closed-form expected values pinned too."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{clique_dir}/documents.parquet/*.parquet')"
    )
    spec = SPECS["q115_graph_triangles"]
    s = SPECS["q115_graph_triangles"].fn(spark, clique_dir).collect()[0]
    d = con.sql(spec.oracle).fetchall()[0]
    dcols = con.sql(spec.oracle).columns
    drow = dict(zip(dcols, d))
    for c in ("n_vertices", "n_edges", "n_wedges", "n_triangles"):
        assert s[c] == drow[c], (c, s[c], drow[c])
    n = CLIQUE_N
    assert s["n_vertices"] == n + 1 + STAR_LEAVES
    assert s["n_edges"] == n * (n - 1) // 2 + STAR_LEAVES
    assert s["n_triangles"] == n * (n - 1) * (n - 2) // 6
    expected_wedges = n * ((n - 1) * (n - 2) // 2) + STAR_LEAVES * (STAR_LEAVES - 1) // 2
    assert s["n_wedges"] == expected_wedges
    assert float(s["global_clustering"]) == round(
        3.0 * s["n_triangles"] / expected_wedges, 6
    )


def test_clique_corpus_orientation_bounds_wedge_work(spark, clique_dir):
    """THE scale invariant the orientation buys (round-4 finding): the
    wedge rows the oriented join generates are Σ C(out-deg, 2). On the
    clique that is exactly C(n,3) — every candidate IS a triangle,
    zero wasted rows (the un-oriented Σ C(deg,2) form generates 3×
    that). On the star it is ZERO: the hub is every edge's HEAD (max
    degree), leaves have out-degree 1 — whereas an un-oriented join
    pivots C(8,2)=28 dead wedges through the hub. Pinned exactly."""
    from pyspark.sql import functions as F
    from etl_geonet_quakes_spark.llm import dedup as dd

    o = dd.oriented_dedup_edges(spark, clique_dir)
    out_deg = o.groupBy("src").agg(F.count("*").alias("od"))
    work = out_deg.agg(
        F.sum(F.expr("od * (od - 1) div 2")).alias("wedge_rows"),
        F.max("od").alias("max_out_deg"),
    ).collect()[0]
    n = CLIQUE_N
    assert work["wedge_rows"] == n * (n - 1) * (n - 2) // 6  # == n_triangles
    # orientation caps out-degree at the clique's chain max (n-1 for
    # the first vertex in the total order — within one clique the
    # (deg,id) order is a chain), never the hub's full degree
    hub_out = o.filter(F.col("src") == 1000).count()
    assert hub_out == 0  # all 8 star edges point INTO the max-degree hub
    # star contributes zero wedge rows: every leaf has out-degree 1
    star_srcs = o.filter(F.col("dst") == 1000).select("src").collect()
    assert len(star_srcs) == STAR_LEAVES


DUP_COPIES = 600  # adversarial: one document repeated 600×


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory) -> str:
    """Saturated-bucket stress corpus: 600 byte-identical copies of
    one document (every LSH band-bucket and every ngram size-block
    holds all 600) plus 30 unique docs. The exact pair contract is
    C(600,2)=179,700 pairs — the chaining mode must collapse that to
    599 star pairs without touching the unique docs."""
    import random

    path = str(tmp_path_factory.mktemp("dup_corpus"))
    random.seed(7)
    text = " ".join(f"dup{i}" for i in range(60))
    rows = [(i, text, "en", "web") for i in range(DUP_COPIES)]
    for i in range(DUP_COPIES, DUP_COPIES + 30):
        rows.append(
            (i, " ".join(f"u{i}w{j}r{random.randrange(10**6)}" for j in range(60)),
             "en", "web")
        )
    rows = [(d, t, lg, s, len(t)) for d, t, lg, s in rows]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(4).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_saturated_bucket_chaining_is_linear_and_verified(spark, dup_dir):
    """With the cap set, a saturated clique emits exactly n−1 star
    pairs (linear, rep = min doc_id), every pair still exact-verified
    at Jaccard 1.0, and the transitive closure over the star equals
    the closure over the full C(n,2) listing — the cluster result is
    preserved while the pair volume drops 300×."""
    from etl_geonet_quakes_spark.llm import dedup as dd

    for fn, kw in (
        (dd.dedup_minhash_lsh, {"threshold": 0.7, "saturated_bucket_cap": 50}),
        (dd.dedup_ngram_jaccard, {"threshold": 0.8, "saturated_block_cap": 50}),
    ):
        rows = fn(spark, dup_dir, **kw).collect()
        assert len(rows) == DUP_COPIES - 1, (fn.__name__, len(rows))
        assert all(r["doc_a"] == 0 for r in rows), fn.__name__
        assert all(r["jaccard"] == 1.0 for r in rows), fn.__name__
        assert {r["doc_b"] for r in rows} == set(range(1, DUP_COPIES)), fn.__name__


def test_saturated_bucket_cap_off_or_unsaturated_is_exact(spark, dup_dir, sf_dir):
    """Cap semantics: a cap no bucket reaches must produce the
    byte-identical pair set to exact mode on the real fixture (code
    path equivalence), and on the dup corpus the default exact mode
    must still emit the full quadratic listing (the contract q38/q40's
    oracles pin)."""
    from etl_geonet_quakes_spark.llm import dedup as dd

    exact = {(r["doc_a"], r["doc_b"], r["jaccard"])
             for r in dd.dedup_minhash_lsh(spark, sf_dir).collect()}
    capped = {(r["doc_a"], r["doc_b"], r["jaccard"])
              for r in dd.dedup_minhash_lsh(spark, sf_dir, saturated_bucket_cap=10**9).collect()}
    assert exact == capped
    exact_ng = {(r["doc_a"], r["doc_b"], r["jaccard"])
                for r in dd.dedup_ngram_jaccard(spark, sf_dir).collect()}
    capped_ng = {(r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in dd.dedup_ngram_jaccard(spark, sf_dir, saturated_block_cap=10**9).collect()}
    assert exact_ng == capped_ng
    # exact mode on the clique: the full quadratic listing
    n_exact = dd.dedup_ngram_jaccard(spark, dup_dir).count()
    assert n_exact == DUP_COPIES * (DUP_COPIES - 1) // 2 + 0


def test_edge_redact_pii_semantics(spark, edge_dir):
    from etl_geonet_quakes_spark.llm import corpus

    out = {r["doc_id"]: r for r in corpus.redact_pii(spark, edge_dir).collect()}
    r11 = out[11]
    assert r11["n_emails"] == 1 and r11["n_number_runs"] == 2
    assert "<EMAIL>" in r11["clean_text"] and "<NUMBER>" in r11["clean_text"]
    assert "example.com" not in r11["clean_text"]
    assert "0211234567" not in r11["clean_text"]
    r12 = out[12]
    assert r12["n_emails"] == 2
    assert r12["n_number_runs"] == 0  # 8 digits is below the 9+ threshold
    assert "12345678" in r12["clean_text"]  # short runs untouched
    # clean docs pass through verbatim
    assert out[3]["clean_text"] == "exactly three tokens"
    assert out[3]["n_emails"] == 0 and out[3]["n_number_runs"] == 0
    # uppercase emails are PII too, and digits consumed by an email
    # match must not double-count as a number run (counts reconcile
    # with the placeholders actually emitted)
    r13 = out[13]
    assert r13["n_emails"] == 2 and r13["n_number_runs"] == 0
    assert r13["clean_text"] == "Reach <EMAIL> or <EMAIL> now"


# PPJoin positional-filter probe (round-6 item): boilerplate docs are
# a common 72-word block (70 shared shingles, df = n_docs, so they
# sort LAST in the prefix order) preceded by u_d globally-unique
# words (u_d doc-unique shingles, df = 1, sorting FIRST). Every pair
# shares common-shingle #1 inside both prefixes, so plain SSJoin
# emits ALL pairs as candidates; true Jaccard = 70/(u_a + u_b + 70)
# ≥ 0.7 iff u_a + u_b ≤ 30, and the pair-level positional bound
# 1 + min(n_a − min_i, n_b − min_j) = 70 ≥ α = ⌈0.7(n_a+n_b)/1.7⌉
# reduces to exactly the same inequality — on this corpus the
# positional filter prunes every false candidate before verify.
PPJOIN_U = [0, 5, 10, 15, 20, 25, 30]


@pytest.fixture(scope="module")
def boilerplate_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("ppjoin_corpus"))
    common = " ".join(f"c{k}" for k in range(72))
    rows = []
    for d, u in enumerate(PPJOIN_U):
        text = " ".join(f"u{d}w{k}" for k in range(u))
        text = (text + " " + common).strip()
        rows.append((d, text, "en", "boiler", len(text)))
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_ppjoin_positional_filter_prunes_and_is_complete(spark, boilerplate_dir):
    from etl_geonet_quakes_spark.llm import dedup as dd

    plain = {
        (r["doc_a"], r["doc_b"])
        for r in dd.prefix_filter_candidates(
            spark, boilerplate_dir, positional=False
        ).collect()
    }
    pos = {
        (r["doc_a"], r["doc_b"])
        for r in dd.prefix_filter_candidates(
            spark, boilerplate_dir, positional=True
        ).collect()
    }
    n = len(PPJOIN_U)
    true_pairs = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if PPJOIN_U[a] + PPJOIN_U[b] <= 30
    }
    # plain SSJoin: every pair is a candidate (21 of them)
    assert plain == {(a, b) for a in range(n) for b in range(a + 1, n)}
    # positional filter: exactly the true pairs survive (12) — a
    # pinned 9-candidate reduction on this corpus
    assert pos == true_pairs
    assert len(plain) - len(pos) == 9
    # completeness + final answer unchanged: verify returns exactly
    # the true pairs with exact Jaccard
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.dedup_prefix_filter(spark, boilerplate_dir).collect()
    }
    assert set(got) == true_pairs
    for (a, b), j in got.items():
        expect = 70 / (PPJOIN_U[a] + PPJOIN_U[b] + 70)
        assert j == round(expect, 6), (a, b, j, expect)


def test_ppjoin_positional_filter_on_clique_corpus(spark, clique_dir):
    """On the adversarial clique/star corpus the positional filter
    must lose NOTHING: near-identical docs pass the bound at every
    match, so candidates and verified pairs are identical with the
    filter on and off."""
    from etl_geonet_quakes_spark.llm import dedup as dd

    plain = {
        (r["doc_a"], r["doc_b"])
        for r in dd.prefix_filter_candidates(
            spark, clique_dir, positional=False
        ).collect()
    }
    pos = {
        (r["doc_a"], r["doc_b"])
        for r in dd.prefix_filter_candidates(
            spark, clique_dir, positional=True
        ).collect()
    }
    assert pos <= plain
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_prefix_filter(spark, clique_dir).collect()
    }
    assert verified <= pos  # completeness: no true pair was pruned
