"""Semantic tests for the LLM-data operators that have no SQL oracle
(sketches, ANN, mapInPandas) — these carry the correctness story the
driver's rows-only check can't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_geonet_quakes_spark.llm import dedup, multimodal, similarity


def test_minhash_matches_exact_shingle_jaccard(spark, sf_dir):
    """Ground truth: exact all-pairs shingle Jaccard (brute force is
    affordable at test scale). MinHash-LSH emits a verified subset
    (precision 1.0 by construction) with probabilistic recall."""
    from pyspark.sql import functions as F
    from etl_geonet_quakes_spark.llm.dedup import shingles_str

    thr = 0.5
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", shingles_str(F.col("text"), 3).alias("toks"))
    )
    a, b = d.alias("a"), d.alias("b")
    jac = F.size(F.array_intersect("a.toks", "b.toks")).cast("double") / F.size(
        F.array_union("a.toks", "b.toks")
    )
    exact_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("j"),
        )
        .filter(F.col("j") >= thr)
        .collect()
    }
    lsh_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash_lsh(spark, sf_dir, threshold=thr).collect()
    }
    assert lsh_pairs <= exact_pairs  # precision 1.0
    if exact_pairs:
        recall = len(lsh_pairs) / len(exact_pairs)
        assert recall > 0.5, f"LSH recall too low: {recall:.2f}"


def test_simhash_pairs_have_small_hamming(spark, sf_dir):
    out = dedup.dedup_simhash(spark, sf_dir, max_hamming=3)
    rows = out.collect()
    assert all(0 <= r["hamming"] <= 3 for r in rows)


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """ANN results must be a plausible subset: every returned neighbor
    either appears in the exact top-5 or is ranked by true cosine —
    measure recall and require it nonzero (one 8-bit table keeps the
    fixture query cheap; recall rises with more tables)."""
    exact = similarity.topk_bruteforce(spark, sf_dir, n_queries=5, k=5)
    ann = similarity.topk_lsh(spark, sf_dir, n_queries=5, k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert ann_pairs, "LSH returned nothing"
    recall = len(ann_pairs & exact_pairs) / len(exact_pairs)
    assert recall > 0.0


def test_multimodal_feature_extraction_fake(spark, sf_dir):
    out = multimodal.media_features(spark, sf_dir)
    rows = out.limit(5).collect()
    assert rows and all(r["feat_dim"] == 1 for r in rows)
    # deterministic fake: mean byte value of the UTF-8 payload
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()
    }
    for r in rows:
        if r["doc_id"] in docs:
            b = docs[r["doc_id"]].encode("utf-8")
            assert r["n_bytes"] == len(b)
            assert abs(r["feat_mean"] - sum(b) / len(b)) < 1e-9


def test_multimodal_real_decode_is_stubbed(spark, sf_dir):
    df = multimodal.documents_as_media(spark, sf_dir)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.extract_features(df, fake=False).limit(1).collect()


def test_bruteforce_topk_is_descending(spark, sf_dir):
    out = similarity.topk_bruteforce(spark, sf_dir, n_queries=3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["cos"]))
    for q, pairs in by_q.items():
        pairs.sort()
        scores = [c for _, c in pairs]
        assert scores == sorted(scores, reverse=True)
        assert len(pairs) == 5


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=n_cells is EXHAUSTIVE (every cell probed), so
    its top-k must equal brute force exactly; a partial probe must be
    a subset-with-nonzero-recall like any ANN."""
    exact = similarity.topk_bruteforce(spark, sf_dir, n_queries=3, k=5)
    full = similarity.topk_ivf(spark, sf_dir, n_queries=3, k=5, n_cells=8, nprobe=8)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    full_pairs = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_pairs == exact_pairs, "exhaustive probe must match brute force"
    ann = similarity.topk_ivf(spark, sf_dir, n_queries=3, k=5, n_cells=8, nprobe=2)
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert ann_pairs, "IVF returned nothing"
    assert len(ann_pairs & exact_pairs) / len(exact_pairs) > 0.0


def test_ivf_cell_score_margins_dwarf_float_error():
    """q21's cell scores come from a numpy matmul whose summation
    order is BLAS/SIMD/FMA-dependent, so negdot values can differ by
    ~dim·eps·Σ|terms| across platforms. q21 sits in the pinned
    hash-checked driver window, so a near-tie flipping an (integer)
    argmin assignment or a probe-set boundary on other hardware would
    silently diverge from the oracle. Pin the safety margin at the two
    DECISION boundaries the output depends on — the argmin gap
    (best vs second-best cell, every corpus vector) and the probe-set
    boundary (nprobe-th vs next cell, query vectors) — requiring each
    to exceed the accumulated-error bound by ≥4 orders of magnitude
    (round-4 advisor item, similarity.py:212). Measured: the tightest
    decision gap across all three sfs is 8.2e-6 (sf0.1 argmin) vs a
    1.5e-11 worst-case reorder bound — ratio ~5e5."""
    import numpy as np
    import pyarrow.parquet as pq

    cents = np.asarray(similarity._centroids(16), dtype=np.float64)
    # error bound for a 64-term float64 dot product, |v_i|,|c_i| ≲ 4
    # in the fixture: n·eps·Σ|v_i·c_i| ≤ 64·2.3e-16·(64·16) ≈ 1.5e-11
    err_bound = 64 * np.finfo(np.float64).eps * 64 * 16
    n_queries, nprobe = 5, 4  # q21 defaults (the hash-checked entry)
    for sf in ("0.001", "0.01", "0.1"):
        tbl = pq.read_table(
            f"/root/testdata/sf{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        vid = np.asarray(tbl["vec_id"].to_pylist())
        v = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        nz = np.linalg.norm(v, axis=1) > 0  # topk_ivf drops zero-norm
        v, vid = v[nz], vid[nz]
        scores = np.sort(-(v @ cents.T), axis=1)  # negdot, ascending
        argmin_gap = float((scores[:, 1] - scores[:, 0]).min())
        q = vid < n_queries
        probe_gap = float((scores[q, nprobe] - scores[q, nprobe - 1]).min())
        for label, gap in (("argmin", argmin_gap), ("probe", probe_gap)):
            assert gap > 1e4 * err_bound, (
                f"sf{sf}: {label} cell-score gap {gap:.3e} too close to "
                f"float-error bound {err_bound:.3e} — assignment could flip "
                f"under a different BLAS summation order"
            )


def test_kmeans_train_converges_and_matches_numpy(spark, sf_dir):
    """Independent ground-truth anchor for q118 (beyond the DuckDB
    oracle): an in-process numpy replay of the same 5 Lloyd rounds
    must land on the same trained centroids, the per-round max
    centroid shift must collapse after round 1 and end small
    (convergence), every cell must stay non-empty on the fixtures,
    and every round's argmin decision gap must dwarf float error so
    the cross-engine assignment can never flip (measured trajectories:
    shift 0.34→0.012 over 5 rounds; min gap 1.2e-6 vs 1.5e-11 bound)."""
    import numpy as np
    import pyarrow.parquet as pq

    n_cells, n_iters = 8, 5
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    v = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    v = v[np.linalg.norm(v, axis=1) > 0]
    cents = np.asarray(similarity._centroids(n_cells), dtype=np.float64)
    err_bound = 64 * np.finfo(np.float64).eps * 64 * 16
    shifts = []
    counts = None
    for _ in range(n_iters):
        scores = -(v @ cents.T)
        srt = np.sort(scores, axis=1)
        assert (srt[:, 1] - srt[:, 0]).min() > 1e4 * err_bound
        assign = np.argmin(scores, axis=1)  # first occurrence = min cell
        new = cents.copy()
        counts = [int((assign == c).sum()) for c in range(n_cells)]
        assert min(counts) > 0, "empty cell on fixture corpus"
        for c in range(n_cells):
            m = assign == c
            if m.any():
                new[c] = np.round(v[m].mean(axis=0), 6)
        shifts.append(float(np.abs(new - cents).max()))
        cents = new
    assert shifts[0] > 10 * shifts[-1], shifts  # round 1 does the big move
    assert shifts[-1] < 0.05, shifts  # settled
    rows = similarity.kmeans_train(spark, sf_dir, n_cells, n_iters).collect()
    assert len(rows) == n_cells * 64
    got = np.zeros((n_cells, 64))
    n_by_cell = {}
    for r in rows:
        got[r["cell"], r["dim"]] = r["c_trained"]
        n_by_cell[r["cell"]] = r["n_members"]
    # 2e-6 absorbs a 6dp rounding-boundary flip from avg fold order
    assert np.abs(got - cents).max() < 2e-6
    assert [n_by_cell[c] for c in range(n_cells)] == counts
    assert sum(counts) == len(v)


def test_streaming_minhash_equals_batch_pairs(spark, sf_dir, tmp_path):
    """Batch ≡ incremental: three micro-batches through the streaming
    band-bucket index must union to EXACTLY the one-shot q38 pair set
    (ids and jaccard values), with every pair emitted exactly once —
    at the batch where its later member arrives."""
    from etl_geonet_quakes_spark.llm import dedup
    from etl_geonet_quakes_spark.streaming.dedup_stream import StreamingMinHashIndex

    batch_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert batch_pairs, "fixture must contain near-dups"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    idx = StreamingMinHashIndex(str(tmp_path / "state"))
    got: set = set()
    n_emitted = 0
    for lo, hi in ((0, 150), (150, 320), (320, 10**9)):
        out = idx.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        ).collect()
        n_emitted += len(out)
        got |= {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out}
    assert got == batch_pairs
    assert n_emitted == len(got), "a pair was emitted in more than one batch"


def test_streaming_minhash_file_stream_drive(spark, sf_dir, tmp_path):
    """The same equivalence through a REAL file stream: one parquet
    file per micro-batch (availableNow + maxFilesPerTrigger=1),
    foreachBatch feeding the incremental index — the reference's
    schedule-tick contract (task.ts:142-143) at corpus scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_geonet_quakes_spark.llm import dedup
    from etl_geonet_quakes_spark.streaming.dedup_stream import run_dedup_stream

    batch_pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    thirds = [docs[i::3] for i in range(3)]
    for i, chunk in enumerate(thirds):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                }
            ),
            str(feed / f"b{i}.parquet"),
        )
    emitted = []
    epochs = run_dedup_stream(
        spark,
        str(feed),
        str(tmp_path / "sstate"),
        pair_handler=lambda rows, epoch: emitted.append((epoch, rows)),
    )
    assert len(epochs) == 3, "maxFilesPerTrigger=1 must yield one batch per file"
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"]) for _, rows in emitted for r in rows
    }
    assert got == batch_pairs


def test_winnow_fingerprint_invariants(spark, sf_dir):
    """Winnowing guarantees (SIGMOD'03): fingerprints are a subset of
    shingle hashes, nonempty for docs with >= k+w-1 tokens, and the
    count is bounded by the window count yet >= ceil(windows / w)
    (at least one fingerprint per w consecutive windows)."""
    from etl_geonet_quakes_spark.llm import text as t

    k, w = 3, 4
    out = t.fingerprint_winnow(spark, sf_dir, k=k, w=w).collect()
    assert out
    for r in out[:200]:
        n_wins = r["n_shingles"] - (w - 1)
        if n_wins >= 1:
            assert 1 <= r["n_fingerprints"] <= n_wins
            assert r["n_fingerprints"] * w >= n_wins  # coverage bound
            assert r["min_fp"] is not None


def test_winnow_matches_python_model_on_tiny_doc(spark, sf_dir):
    """Cross-check the windowed-min structure against a pure-Python
    model using Spark's own shingle hashes as input (hash function
    identity is not the claim; the winnowing algebra is)."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.llm import text as t
    from etl_geonet_quakes_spark.llm.dedup import md5_feature_hash

    k, w = 3, 4
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text").first()
    toks = doc["text"].split(" ")
    grams_df = spark.createDataFrame([(toks,)], "toks: array<string>").select(
        F.transform(
            F.sequence(F.lit(1), F.lit(len(toks) - k + 1)),
            lambda i: md5_feature_hash(
                F.concat_ws(" ", F.slice(F.col("toks"), i, k))
            ),
        ).alias("grams")
    )
    grams = grams_df.first()["grams"]
    expect = sorted(
        {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}
    )
    got = (
        t.fingerprint_winnow(spark, sf_dir, k=k, w=w)
        .filter(F.col("doc_id") == doc["doc_id"])
        .first()
    )
    assert got["n_fingerprints"] == len(expect)
    assert got["min_fp"] == expect[0]


def test_dedup_clusters_consistent(spark, sf_dir):
    """Cluster labels must be consistent with the pair graph: every
    near-dup pair lands in one cluster, every rep is its own cluster's
    minimum member (canonical labeling), singletons label themselves."""
    out = dedup.dedup_clusters(spark, sf_dir).collect()
    lbl = {r["doc_id"]: r["cluster_rep"] for r in out}
    pairs = dedup.dedup_ngram_jaccard(spark, sf_dir, 0.8).collect()
    for r in pairs:
        assert lbl[r["doc_a"]] == lbl[r["doc_b"]]
    members: dict[int, list[int]] = {}
    for doc, rep in lbl.items():
        members.setdefault(rep, []).append(doc)
    for rep, docs in members.items():
        assert rep == min(docs)
    sizes = {r["doc_id"]: r["cluster_size"] for r in out}
    for rep, docs in members.items():
        assert all(sizes[d] == len(docs) for d in docs)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    """The oracle replays the same hash formula, so it cannot catch a
    rate bug — check independently that per-language keep rates land
    near the configured 0.1/0.3/0.5 (binomial 4-sigma) and that the
    kept set is identical across runs (the whole point vs df.sample)."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.llm import corpus

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    run1 = corpus.stratified_sample(spark, sf_dir).collect()
    run2 = corpus.stratified_sample(spark, sf_dir).collect()
    assert [tuple(r) for r in run1] == [tuple(r) for r in run2]

    kept: dict[str, int] = {}
    for r in run1:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    rates = {"en": 0.1, "de": 0.3}
    for lang, n_total in totals.items():
        p = rates.get(lang, 0.5)
        got = kept.get(lang, 0)
        sigma = (n_total * p * (1 - p)) ** 0.5
        assert abs(got - n_total * p) <= 4 * sigma + 1, (
            f"{lang}: kept {got}/{n_total}, expected ~{p}"
        )


def test_corpus_pipeline_accounting_invariants(spark, sf_dir):
    """Stage attribution must partition the corpus: docs = exact-removed
    + low-quality-removed + kept, per language; kept tokens bounded by
    corpus tokens; exact-removed consistent with the dedup operator."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.llm import corpus, dedup

    rows = corpus.corpus_dedup_pipeline(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] == r["n_exact_removed"] + r["n_lowq_removed"] + r["n_kept"]
        assert 0 <= r["tokens_kept"]
    n_docs_total = sum(r["n_docs"] for r in rows)
    n_exact_total = sum(r["n_exact_removed"] for r in rows)
    clusters = dedup.dedup_exact(spark, sf_dir).collect()
    assert n_exact_total == n_docs_total - len(clusters)


def test_chunking_covers_every_token(spark, sf_dir):
    """Chunk windows must tile each document: chunk i starts at token
    i*stride, the last chunk reaches the final token, lengths match
    the declared chunk_len, and stride overlap is consistent."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.llm import corpus

    chunk_tokens, stride = 64, 48
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").limit(30).collect()
    }
    rows = (
        corpus.chunk_documents(spark, sf_dir, chunk_tokens, stride)
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in docs.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        covered_until = 0
        for r in chunks:
            start = r["chunk_idx"] * stride
            expect = toks[start : start + chunk_tokens]
            assert r["chunk_text"] == " ".join(expect)
            assert r["chunk_len"] == len(expect)
            covered_until = max(covered_until, start + len(expect))
        assert covered_until == len(toks), f"doc {doc_id} not fully covered"


def test_array_agg_ordered_array_variant(spark, sf_dir):
    """The array-typed collect_list surface (the registry serves the
    string-serialized variant to hash-based harnesses; this keeps the
    array API covered and the two variants consistent)."""
    from etl_geonet_quakes_spark.operators import relational as rel

    arr = {r["o_custkey"]: r for r in rel.array_agg_ordered(spark, sf_dir).collect()}
    s = {r["o_custkey"]: r for r in rel.array_agg_ordered_str(spark, sf_dir).collect()}
    assert arr.keys() == s.keys() and arr
    for k, r in arr.items():
        assert r["order_keys"] == sorted(r["order_keys"])  # sorted contract
        assert ",".join(str(x) for x in r["order_keys"]) == s[k]["order_keys"]
        assert r["n"] == s[k]["n"]


def test_pack_sequences_conservation_invariants(spark, sf_dir):
    """Packing must conserve the token stream exactly: total packed
    tokens == total corpus tokens, every sequence except the last
    holds exactly seq_len, sequence ids are dense from 0, and doc
    ranges tile monotonically."""
    from etl_geonet_quakes_spark.llm import corpus
    from etl_geonet_quakes_spark.llm.text import tokens

    seq_len = 256
    rows = corpus.pack_sequences(spark, sf_dir, seq_len=seq_len).collect()
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["n_tokens"] for r in rows) == total
    ids = [r["seq_id"] for r in rows]
    assert ids == list(range(len(rows)))  # dense, ordered
    for r in rows[:-1]:
        assert r["n_tokens"] == seq_len, r
    assert 0 < rows[-1]["n_tokens"] <= seq_len
    # doc ranges are monotone and overlap only at boundaries
    for prev, cur in zip(rows, rows[1:]):
        assert prev["first_doc"] <= prev["last_doc"]
        assert cur["first_doc"] >= prev["last_doc"] - 0  # straddle allowed
        assert cur["first_doc"] >= prev["first_doc"]


def test_pack_sequences_bucket_boundary_exact(spark, tmp_path):
    """The two-phase prefix sum must be seamless across prefix-bucket
    boundaries: force multiple tiny buckets and compare against a
    directly computed global cumsum."""
    import math

    docs = [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 13)), "en", "s")
            for i in range(50)]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(d, t, l, s, len(t)) for d, t, l, s in docs],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).write.parquet(f"{path}/documents.parquet")

    from etl_geonet_quakes_spark.llm import corpus

    out = {r["seq_id"]: r for r in
           corpus.pack_sequences(spark, path, seq_len=16, prefix_bucket=8).collect()}
    # python reference: straightforward global concat-and-split
    lens = [len(t.split(" ")) for _, t, _, _ in docs]
    total = sum(lens)
    n_seqs = math.ceil(total / 16)
    assert set(out) == set(range(n_seqs))
    start = 0
    ref: dict[int, set] = {}
    for (doc_id, _, _, _), n in zip(docs, lens):
        for s in range(start // 16, (start + n - 1) // 16 + 1):
            ref.setdefault(s, set()).add(doc_id)
        start += n
    for s, members in ref.items():
        assert out[s]["n_docs"] == len(members), s
        assert out[s]["first_doc"] == min(members)
        assert out[s]["last_doc"] == max(members)


def test_keep_canonical_partitions_corpus(spark, sf_dir):
    """Keep-list invariants: reps are self-representing cluster
    minima, n_merged sums to the corpus size, and no two kept docs
    are near-dup pairs of each other (the whole point)."""
    from etl_geonet_quakes_spark.llm import dedup as dd

    kept = dd.dedup_keep_canonical(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_merged"] for r in kept) == n_docs
    kept_ids = {r["doc_id"] for r in kept}
    pairs = dd.dedup_ngram_jaccard(spark, sf_dir).collect()
    for p in pairs:
        assert not (p["doc_a"] in kept_ids and p["doc_b"] in kept_ids), p


def test_ppm_decoder_rejects_malformed_payloads(spark):
    """The real decoder must honor the one-poisoned-row policy: bad
    magic, truncated raster, unsupported maxval and non-numeric
    header all yield valid=false + NULL features, never an error."""
    from etl_geonet_quakes_spark.llm import multimodal

    good = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    cases = [
        (0, good, True),
        (1, b"P5\n2 1\n255\n" + bytes(6), False),  # wrong magic
        (2, b"P6\n2 1\n255\n" + bytes(5), False),  # truncated raster
        (3, b"P6\n2 1\n65535\n" + bytes(12), False),  # 16-bit maxval
        (4, b"P6\n2 x\n255\n" + bytes(6), False),  # non-numeric dim
        (5, b"", False),  # empty blob
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in cases], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in multimodal.decode_ppm_features(df).collect()}
    for i, _, ok in cases:
        assert out[i]["valid"] is ok, i
        if not ok:
            assert out[i]["mean_r"] is None
    assert out[0]["width"] == 2 and out[0]["height"] == 1
    assert out[0]["mean_r"] == (10 + 40) / 2.0
    assert out[0]["mean_g"] == (20 + 50) / 2.0
    assert out[0]["mean_b"] == (30 + 60) / 2.0


def test_wav_decoder_rejects_malformed_payloads(spark):
    """RIFF chunk-walker must reject non-RIFF blobs, missing chunks,
    stereo/compressed/8-bit formats and truncated data with
    valid=false, and decode a hand-built good file exactly."""
    import struct

    from etl_geonet_quakes_spark.llm import multimodal

    def wav(samples, audio_fmt=1, channels=1, rate=8000, bits=16, trunc=0):
        data = struct.pack("<%dh" % len(samples), *samples)
        if trunc:
            data = data[:-trunc]
        fmt = struct.pack("<HHIIHH", audio_fmt, channels, rate, rate * 2, 2, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(samples) * 2) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    cases = [
        (0, wav([100, -100, 300, -300]), True),
        (1, b"OggS" + bytes(40), False),  # not RIFF
        (2, wav([1, 2], audio_fmt=3), False),  # float PCM
        (3, wav([1, 2], channels=2), False),  # stereo
        (4, wav([1, 2], bits=8), False),  # 8-bit
        (5, wav([1, 2, 3, 4], trunc=3), False),  # truncated data
        (6, b"RIFF\x04\x00\x00\x00WAVE", False),  # no chunks at all
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in cases], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in multimodal.decode_wav_features(df).collect()}
    for i, _, ok in cases:
        assert out[i]["valid"] is ok, i
        if not ok:
            assert out[i]["rms"] is None
    import math
    g = out[0]
    assert g["n_samples"] == 4 and g["sample_rate"] == 8000
    assert g["duration_ms"] == 0.5
    assert g["mean"] == 0.0
    assert g["rms"] == math.sqrt((100**2 + 100**2 + 300**2 + 300**2) / 4)


def test_png_decoder_rejects_malformed_payloads(spark):
    """The real PNG decoder must honor the one-poisoned-row policy:
    bad signature, corrupted CRC, unsupported color type, truncated
    IDAT, missing IEND and unknown filter types all yield valid=false
    + NULL features, never an error — and a hand-built good file
    (Paeth-filtered row included) decodes exactly."""
    import struct
    import zlib

    from etl_geonet_quakes_spark.llm import multimodal

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # 2x2 RGB raw rows; row 0 unfiltered, row 1 Paeth-filtered
    row0 = bytes([10, 20, 30, 40, 50, 60])
    row1_raw = bytes([70, 80, 90, 100, 110, 120])
    filt1 = bytearray([4])
    for i in range(6):
        left = row1_raw[i - 3] if i >= 3 else 0
        up = row0[i]
        ul = row0[i - 3] if i >= 3 else 0
        filt1.append((row1_raw[i] - multimodal._paeth(left, up, ul)) & 0xFF)
    scan = b"\x00" + row0 + bytes(filt1)
    good = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")

    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    gray_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # grayscale
    gray = sig + chunk(b"IHDR", gray_ihdr) + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    short = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan[:-3])) + chunk(b"IEND", b"")
    no_end = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scan))
    bad_filter = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x07" + row0 + b"\x00" + row1_raw)
    ) + chunk(b"IEND", b"")

    cases = [
        (0, good, True),
        (1, b"\x89PNV" + good[4:], False),  # bad signature
        (2, bytes(bad_crc), False),  # CRC mismatch
        (3, gray, False),  # unsupported color type
        (4, short, False),  # inflated length mismatch
        (5, no_end, False),  # missing IEND
        (6, bad_filter, False),  # unknown filter type 7
        (7, b"", False),  # empty blob
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _ in cases], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in multimodal.decode_png_features(df).collect()}
    for i, _, ok in cases:
        assert out[i]["valid"] is ok, i
        if not ok:
            assert out[i]["mean_r"] is None
    assert out[0]["width"] == 2 and out[0]["height"] == 2
    assert out[0]["mean_r"] == (10 + 40 + 70 + 100) / 4.0
    assert out[0]["mean_g"] == (20 + 50 + 80 + 110) / 4.0
    assert out[0]["mean_b"] == (30 + 60 + 90 + 120) / 4.0


def test_png_synthesizer_covers_all_five_filters(spark, sf_dir):
    """The corpus must actually exercise every PNG filter type in the
    encode→decode loop: with filter = (doc_id + row) % 5 and 8 rows,
    every document touches all five — spot-check the wire bytes of a
    few payloads directly."""
    import struct
    import zlib

    from etl_geonet_quakes_spark.llm import multimodal

    rows = (
        multimodal.synthesize_png_media(spark, sf_dir)
        .limit(3)
        .collect()
    )
    for r in rows:
        buf = bytes(r["payload"])
        # IDAT payload starts after sig(8) + IHDR chunk(12+13)
        (ln,) = struct.unpack_from(">I", buf, 33)
        assert buf[37:41] == b"IDAT"
        raw = zlib.decompress(buf[41 : 41 + ln])
        fts = {raw[row * 49] for row in range(8)}  # 1 + 16*3 stride
        assert fts == {0, 1, 2, 3, 4}, (r["doc_id"], fts)


def test_bloom_semi_join_superset_invariant(spark, sf_dir):
    """Bloom membership can only over-approximate: per priority,
    bloom_pass >= exact_pass, and every priority with exact matches
    appears. (Value equality vs the replayed bit set is the oracle's
    job; this pins the structural FP-only guarantee.)"""
    from etl_geonet_quakes_spark.operators import relational as rel

    rows = rel.bloom_semi_join(spark, sf_dir).collect()
    assert rows, "bloom semi-join returned no priorities"
    for r in rows:
        assert r["bloom_pass"] >= r["exact_pass"], r


def test_weighted_sample_deterministic_and_biased(spark, sf_dir):
    """A-ES sampling must be (a) exactly reproducible call-over-call
    (hash-derived u, no RNG) and (b) genuinely weighted: the sampled
    mean n_chars must exceed the corpus mean (selection is
    length-proportional)."""
    from etl_geonet_quakes_spark.llm import corpus as cp

    s1 = [r["doc_id"] for r in cp.weighted_sample(spark, sf_dir, k=50).collect()]
    s2 = [r["doc_id"] for r in cp.weighted_sample(spark, sf_dir, k=50).collect()]
    assert s1 == s2
    sample_mean = (
        cp.weighted_sample(spark, sf_dir, k=50)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    corpus_mean = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_bm25_scores_positive_and_term_bound(spark, sf_dir):
    """Lucene-form idf is always positive, so every emitted score is
    > 0; every returned doc must actually contain at least one query
    term; scores are non-increasing in rank order."""
    from etl_geonet_quakes_spark.llm import text as tx

    out = tx.bm25_topk(spark, sf_dir).collect()
    assert 0 < len(out) <= 10
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    ids = [r["doc_id"] for r in out]
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(ids))
        .collect()
    }
    for i in ids:
        toks = set(docs[i].split(" "))
        assert toks & {"spark", "hash", "join", "window"}, i


def test_kmeans_step_partitions_corpus(spark, sf_dir):
    """Every (cell, dim) has the same member count within a cell, the
    per-cell counts sum to the nonzero-vector corpus size, and every
    non-empty cell emits exactly 64 dims."""
    from etl_geonet_quakes_spark.llm import similarity as sim

    rows = sim.kmeans_step(spark, sf_dir).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    total = 0
    for cell, rs in by_cell.items():
        assert len(rs) == 64, (cell, len(rs))
        counts = {r["n_members"] for r in rs}
        assert len(counts) == 1, (cell, counts)
        total += counts.pop()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from pyspark.sql import functions as FF
    nonzero = e.filter(
        FF.aggregate(
            FF.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            FF.lit(0.0), lambda a, x: a + x,
        ) > 0
    ).count()
    assert total == nonzero, (total, nonzero)


def test_funnel_monotone_and_headed(spark, sf_dir):
    """Funnel counts must be non-increasing stage over stage and the
    head stage converts at exactly 1.0."""
    from etl_geonet_quakes_spark.operators import relational as rel

    rows = sorted(rel.funnel_conversion(spark, sf_dir).collect(), key=lambda r: r["stage_idx"])
    assert [r["stage_idx"] for r in rows] == [1, 2, 3]
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True), ns
    assert rows[0]["conversion"] == 1.0


def test_retention_offset_zero_is_cohort_size(spark, sf_dir):
    """Every cohort has an offset-0 row (a user is active in their own
    first week by definition) and no later offset exceeds it."""
    from etl_geonet_quakes_spark.operators import relational as rel

    rows = rel.retention_cohorts(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offs in by_cohort.items():
        assert 0 in offs, cohort
        assert all(n <= offs[0] for n in offs.values()), (cohort, offs)


def test_rolling_window_counts_self_and_bounds(spark, sf_dir):
    """Every event's trailing frame includes at least itself, and no
    frame exceeds the user's total event count."""
    from etl_geonet_quakes_spark.operators import relational as rel

    out = rel.rolling_time_window(spark, sf_dir).collect()
    totals = {}
    for r in out:
        totals[r["user_id"]] = totals.get(r["user_id"], 0) + 1
    for r in out:
        assert 1 <= r["n_trailing"] <= totals[r["user_id"]], r


def test_event_transitions_normalized(spark, sf_dir):
    """Per-from probabilities sum to ~1 and transition counts sum to
    (total events - one terminal event per user)."""
    from etl_geonet_quakes_spark.operators import relational as rel
    import math

    rows = rel.event_transitions(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, rs in by_from.items():
        assert math.isclose(sum(r["p"] for r in rs), 1.0, rel_tol=1e-9), ft
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users


def test_quantize_error_bounded(spark, sf_dir):
    """Half-up rounding puts every per-element quantization error at
    <= scale/2, so err_l2 <= scale * sqrt(64)/2 = 4*scale; scale must
    be positive for every (nonzero) vector."""
    from etl_geonet_quakes_spark.llm import similarity as sim

    for r in sim.embedding_quantize(spark, sf_dir).collect():
        assert r["scale"] > 0, r
        assert r["err_l2"] <= 4.0 * r["scale"] + 1e-9, r


def test_resample_spine_contiguous_and_filled(spark, sf_dir):
    """Every user's spine is contiguous daily (span length == row
    count), gap rows carry n_events=0, and filled_value is never NULL
    (the first spine day always has data by construction)."""
    from etl_geonet_quakes_spark.operators import relational as rel

    rows = rel.resample_gapfill(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        days = [r["day"] for r in rs]
        assert (max(days) - min(days)).days + 1 == len(rs), uid
        assert len(set(days)) == len(days), uid
        for r in rs:
            assert r["filled_value"] is not None, r
            if r["is_gap"]:
                assert r["n_events"] == 0, r


def test_fingerprint_is_order_and_partitioning_invariant(spark, sf_dir):
    """THE property of the commutative hash sum: recomputing the
    fingerprint from an arbitrarily repartitioned/shuffled copy of
    the table yields identical segment fingerprints."""
    from pyspark.sql import functions as FF

    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.operators import relational as rel

    base = {
        (r["segment"]): (r["n_rows"], r["fingerprint"])
        for r in rel.table_fingerprint(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").repartition(7, "o_orderstatus")
    row_str = FF.concat_ws(
        "|",
        FF.col("o_orderkey").cast("string"),
        FF.col("o_custkey").cast("string"),
        FF.coalesce(FF.col("o_orderstatus"), FF.lit("<NULL>")),
        FF.coalesce(FF.col("o_orderpriority"), FF.lit("<NULL>")),
        FF.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        FF.round(FF.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h = FF.conv(FF.substring(FF.md5(row_str), 1, 15), 16, 10).cast("long")
    again = {
        r["segment"]: (r["n_rows"], r["fingerprint"])
        for r in o.groupBy(FF.year("o_orderdate").cast("int").alias("segment"))
        .agg(
            FF.count("*").alias("n_rows"),
            FF.sum(h.cast("decimal(38,0)")).cast("string").alias("fingerprint"),
        )
        .collect()
    }
    assert base == again


def test_scd2_intervals_tile_timeline(spark, sf_dir):
    """SCD2 invariants: exactly one open (current) version per user,
    each version's effective_to equals the next version's
    effective_from (no gaps, no overlaps), and no two consecutive
    versions carry the same value (duplicate suppression)."""
    from etl_geonet_quakes_spark.operators import relational as rel

    rows = rel.scd2_intervals(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["effective_from"])
        assert sum(1 for r in rs if r["is_current"]) == 1, uid
        assert rs[-1]["effective_to"] is None, uid
        for a, b in zip(rs, rs[1:]):
            assert a["effective_to"] == b["effective_from"], (uid, a, b)
            assert a["attr_value"] != b["attr_value"], (uid, a, b)


def test_inverted_index_postings_consistent(spark, sf_dir):
    """df <= n_postings for every token, posting counts sum to the
    scanned token volume, and posting strings are sorted by
    (doc_id, pos)."""
    from etl_geonet_quakes_spark.llm import text as tx

    rows = tx.inverted_index(spark, sf_dir).collect()
    total = 0
    for r in rows:
        assert r["df"] <= r["n_postings"], r["token"]
        parts = [tuple(map(int, p.split(":"))) for p in r["postings"].split(",")]
        assert len(parts) == r["n_postings"], r["token"]
        assert parts == sorted(parts), r["token"]
        total += r["n_postings"]
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as FF
    expect = (
        d.filter(FF.col("doc_id") < 50)
        .select(FF.size(FF.split("text", " ")).alias("n"))
        .agg(FF.sum("n"))
        .collect()[0][0]
    )
    assert total == expect, (total, expect)


def test_triangle_census_bounds(spark, sf_dir):
    """Structural sanity: vertices <= 2*edges, wedges = Σ C(deg,2) ≥
    3·triangles (every triangle closes exactly 3 wedges), the
    clustering coefficient is a true ratio in [0, 1], and
    triangles_per_edge reproduces 3·tri/edges."""
    from etl_geonet_quakes_spark.llm import dedup as dd

    r = dd.graph_triangles(spark, sf_dir).collect()[0]
    assert r["n_vertices"] <= 2 * r["n_edges"]
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["global_clustering"] <= 1.0
    assert abs(r["global_clustering"] - round(3.0 * r["n_triangles"] / r["n_wedges"], 6)) < 1e-12
    assert abs(r["triangles_per_edge"] - round(3.0 * r["n_triangles"] / r["n_edges"], 6)) < 1e-12


def test_semdedup_margins_dwarf_float_error():
    """q119's keep/drop verdicts sit on two float boundaries: the
    argmin cell assignment (numpy matmul, BLAS-order-dependent) and
    the round-to-6dp cosine vs τ=0.4 compare. Both are inside an
    oracle-hash-checked entry, so pin each margin far above its error
    scale at every sf, q21-style."""
    import numpy as np
    import pyarrow.parquet as pq

    cents = np.asarray(similarity._centroids(8), dtype=np.float64)
    err_bound = 64 * np.finfo(np.float64).eps * 64 * 16
    for sf in ("0.001", "0.01", "0.1"):
        tbl = pq.read_table(
            f"/root/testdata/sf{sf}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        v = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        v = v[np.linalg.norm(v, axis=1) > 0]
        scores = np.sort(-(v @ cents.T), axis=1)
        argmin_gap = float((scores[:, 1] - scores[:, 0]).min())
        assert argmin_gap > 1e4 * err_bound, (sf, argmin_gap)
        # threshold margin: every within-cell pair cosine stays clear
        # of τ by orders of magnitude more than cross-engine fold
        # drift (both engines fold the dot left-to-right in double —
        # worst-case reorder error ~1e-13 — and round to 6dp before
        # comparing, so only a cosine within ~1e-13 of a 6dp rounding
        # boundary ADJACENT to τ could flip). Measured floors:
        # 5.6e-4 (sf0.001), 5.2e-4 (sf0.01), 2.5e-5 (sf0.1) — the
        # tightest is still ~8 orders above the drift bound.
        cells = (v @ cents.T).argmax(1)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        margins = []
        for c in range(8):
            m = vn[cells == c]
            if len(m) < 2:
                continue
            cos = (m @ m.T)[np.triu_indices(len(m), 1)]
            margins.append(np.abs(cos - 0.4).min())
        assert min(margins) > 1e-5, (sf, min(margins))


def test_semdedup_keeps_canonical_and_covers_corpus(spark, sf_dir):
    """Structural invariants: exactly one row per non-zero-norm vector;
    every dropped vector has a kept-or-dropped lower-id cell-mate with
    cosine ≥ τ; the lowest id of every cell is always kept."""
    from etl_geonet_quakes_spark.llm.dedup import dedup_semantic

    rows = dedup_semantic(spark, sf_dir).collect()
    n_nonzero = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0
        )
        .count()
    )
    assert len(rows) == n_nonzero
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        lowest = min(m["vec_id"] for m in members)
        assert next(m for m in members if m["vec_id"] == lowest)["keep"] == 1, cell


def test_cms_never_underestimates(spark, sf_dir):
    """The provable count-min invariant q120's oracle validity rests
    on: for EVERY distinct shingle, the sketch estimate (min over
    depth counters) is ≥ its exact count — so thresholding estimates
    can only admit false positives, which the exact-confirm tier then
    removes. Replays the sketch with the same hashes and checks all
    ~16k keys."""
    from etl_geonet_quakes_spark.llm.text import heavy_hitters, ngram_join, tokens

    import math

    phi_inv, depth = 5000, 4
    width = math.ceil(2 * math.e * phi_inv)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens(F.col("text"))
    occ = d.filter(F.size(toks) >= 3).select(
        F.explode(ngram_join(toks, 3)).alias("s")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                F.pmod(F.xxhash64(F.col("s"), F.lit(i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )
    sketch = (
        occ.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = occ.groupBy("s").agg(F.count("*").alias("n"))
    est = (
        exact.select("s", "n", F.explode(cells).alias("c"))
        .join(
            F.broadcast(sketch),
            (F.col("c.d") == F.col("d")) & (F.col("c.bucket") == F.col("bucket")),
        )
        .groupBy("s", "n")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("n")).count()
    assert bad == 0
    # and the operator's output is exactly the true heavy-hitter set
    total = occ.count()
    true_hh = {
        r["s"]: r["n"]
        for r in exact.filter(F.col("n") * phi_inv >= F.lit(total)).collect()
    }
    got = {r["shingle"]: r["n_occurrences"] for r in heavy_hitters(spark, sf_dir).collect()}
    assert got == true_hh


def test_pagerank_mass_and_floor(spark, sf_dir):
    """Power-iteration invariants: rank mass stays ≈ 1 (per-round 6dp
    rounding bounds drift by n·5e-7 per round), every vertex holds at
    least the teleport floor (1−d)/n, and rank is monotone-consistent
    with degree at the extremes (the max-rank vertex cannot have the
    minimum degree in a connected-ish dup graph)."""
    from etl_geonet_quakes_spark.llm.dedup import graph_pagerank

    rows = graph_pagerank(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 5 * n * 5e-7, total
    floor = (1.0 - 0.85) / n
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    top = max(rows, key=lambda r: r["pagerank"])
    assert top["deg"] > min(r["deg"] for r in rows) or n == 1


def test_ewma_band_margin_and_recursion(spark, sf_dir):
    """q123's anomaly flag compares |round6(resid)| to band=150 — pin
    the fixture's minimum margin far above the 1e-6 rounding quantum
    (measured 2.44 at sf0.001, 4.2e-3 at sf0.01), and anchor the
    distributed recursion against an independent in-process replay."""
    from etl_geonet_quakes_spark.io import load_table
    from etl_geonet_quakes_spark.operators.relational import ewma_anomaly

    rows = ewma_anomaly(spark, sf_dir).collect()
    margin = min(
        abs(abs(r["resid"]) - 150.0) for r in rows if r["resid"] is not None
    )
    assert margin > 1e-3, margin
    # independent replay: group on the driver, run the recursion
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(r)
    expect = {}
    for uid, rs in series.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        prev = None
        for r in rs:
            if prev is None:
                prev = r["value"]
                expect[r["event_id"]] = (prev, None)
            else:
                resid = r["value"] - prev
                prev = 0.3 * r["value"] + (1 - 0.3) * prev
                expect[r["event_id"]] = (prev, resid)
    for r in rows:
        ew, resid = expect[r["event_id"]]
        assert abs(r["ewma"] - round(ew, 6)) < 2e-6, r
        if resid is None:
            assert r["resid"] is None and r["is_anomaly"] == 0
        else:
            assert abs(r["resid"] - round(resid, 6)) < 2e-6, r
            assert r["is_anomaly"] == int(abs(r["resid"]) > 150.0)


def test_mixture_sample_margin_and_bias(spark, sf_dir):
    """q124's keep decision compares a 2^-32-quantized hash to a
    pow-derived rate: pin the minimum |h − r_s| margin far above
    double error at every sf, and check the temperature bias
    direction — the smallest source keeps everything (rate 1.0) and
    observed keep fractions do not exceed their rates by more than
    sampling noise allows in expectation terms."""
    import pyarrow.parquet as pq

    from etl_geonet_quakes_spark.llm.corpus import mixture_sample

    for sf in ("0.001", "0.01", "0.1"):
        tbl = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet",
            columns=["doc_id", "source"],
        ).to_pydict()
        counts: dict[str, int] = {}
        for s in tbl["source"]:
            counts[s] = counts.get(s, 0) + 1
        n_min = min(counts.values())
        margin = min(
            abs(((i * 2654435761) % 4294967296) / 4294967296.0
                - (n_min / counts[s]) ** 0.5)
            for i, s in zip(tbl["doc_id"], tbl["source"])
        )
        assert margin > 1e-8, (sf, margin)
    rows = mixture_sample(spark, sf_dir).collect()
    assert rows
    kept: dict[str, int] = {}
    rate: dict[str, float] = {}
    nsrc: dict[str, int] = {}
    for r in rows:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
        rate[r["source"]] = r["keep_rate"]
        nsrc[r["source"]] = r["n_source"]
    smallest = min(nsrc, key=lambda s: nsrc[s])
    assert rate[smallest] == 1.0
    assert kept[smallest] == nsrc[smallest]


def test_zorder_buckets_are_bounded_rectangles(spark, sf_dir):
    """The data-skipping contract q126 demonstrates: a top-20-bit
    z-bucket fixes the 10 high bits of BOTH dims, so every bucket's
    min/max span sits inside one 64-aligned window per dimension —
    the rectangle bound that makes z-ordered file metadata prunable
    on either column. Also require the fixture actually splits into
    many buckets (the audit is vacuous on one mega-bucket)."""
    from etl_geonet_quakes_spark.operators.relational import zorder_layout

    rows = zorder_layout(spark, sf_dir).collect()
    assert len(rows) > 10, len(rows)
    for r in rows:
        assert r["max_cust"] - r["min_cust"] <= 63, r
        assert r["max_day"] - r["min_day"] <= 63, r
        assert r["min_cust"] // 64 == r["max_cust"] // 64, r
        assert r["min_day"] // 64 == r["max_day"] // 64, r


def test_power_iteration_rayleigh_quotient_is_monotone(spark, sf_dir):
    """What fixed-round power iteration GUARANTEES (independent of the
    spectral gap — the near-isotropic fixture's gap is tiny, so
    alignment-with-SVD is NOT a valid invariant here): each iterate's
    Rayleigh quotient xᵀAᵀAx is non-decreasing, so the 3-round result
    must beat both the uniform start vector and the mean eigenvalue;
    and the emitted loading vector is unit-norm. Replayed against an
    independent numpy implementation of the same contract (same x0,
    same 6dp inter-round rounding) — the iterates must agree."""
    import numpy as np

    from etl_geonet_quakes_spark.llm import similarity

    rows = similarity.power_iteration(spark, sf_dir).collect()
    x = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert abs(np.linalg.norm(x) - 1.0) < 1e-4
    vecs = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        ],
        dtype=np.float64,
    )
    vecs = vecs[(vecs * vecs).sum(axis=1) > 0]
    A = vecs.T @ vecs
    x0 = np.full(64, 0.125)
    rq = lambda v: float(v @ A @ v) / float(v @ v)  # noqa: E731
    assert rq(x) >= rq(x0) - 1e-6
    assert rq(x) >= np.trace(A) / 64  # beats the average eigenvalue
    # independent replay of the exact contract
    xi = x0
    for k in range(3):
        y = A @ xi
        xi = np.array([round(v, 6) for v in y / np.linalg.norm(y)])
    assert np.max(np.abs(xi - x)) < 2e-6
