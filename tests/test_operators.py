"""Known-answer tests for dedup / similarity / text / multimodal operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ dedup

def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        (1, "alpha beta gamma", "en", "s1"),
        (2, "alpha  beta \t gamma", "en", "s1"),   # same after normalization
        (3, "totally different text", "en", "s1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    docs.createOrReplaceTempView("_tmp")
    from hadoop_etl_udfs_spark.functions.text import fingerprint

    out = (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
        .collect()
    )
    by_keep = {r["keep"]: r["n"] for r in out}
    assert by_keep == {1: 2, 3: 1}


def test_minhash_finds_planted_neardup(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " xx yy"  # ~95% same shingles
    far = " ".join(f"other{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base, "en", "s"), (2, near, "en", "s"), (3, far, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    sig = dedup.minhash_signatures(docs)
    assert sig.count() == 3
    # near-dup pair must share at least one LSH band; far pair must not
    import hadoop_etl_udfs_spark.operators.dedup as dd

    n_bands = dd.N_PERM // dd.BAND_ROWS
    bands = F.array(
        *[
            dd._hash64(
                [F.col(f"mh{b * dd.BAND_ROWS + r}") for r in range(dd.BAND_ROWS)], b
            )
            for b in range(n_bands)
        ]
    )
    sigs = {r["doc_id"]: r["b"] for r in sig.select("doc_id", bands.alias("b")).collect()}
    shared_12 = len(set(sigs[1]) & set(sigs[2]))
    shared_13 = len(set(sigs[1]) & set(sigs[3]))
    assert shared_12 > 0 and shared_13 == 0


def test_simhash_identical_texts_equal(spark):
    out = dedup.simhash64(spark, SF)
    assert out.count() == 500
    # deterministic across runs
    a = {r["doc_id"]: r["simhash"] for r in out.collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(spark, SF).collect()}
    assert a == b


@pytest.mark.parametrize("method,n_bits", [("xxhash64", 64), ("md5", 32)])
def test_simhash_packed_lanes_match_unpacked_reference(spark, method, n_bits):
    """Round 9: simhash's per-bit ones counts ride two-per-aggregate in
    32-bit lanes (half the aggregate expressions — the profiled hot term).
    Every simhash value must equal the straightforward one-sum-per-bit
    form, for BOTH hash methods (the md5/32 pair is the in-gate
    simhash_checked configuration)."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).withColumn("h", dedup._hash64([F.col("tok")], 0, method))
    ones = [
        F.sum(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1)).alias(f"o{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy("doc_id").agg(*ones, F.count("*").alias("_n"))
    ref = None
    for b in range(n_bits):
        bit = F.when(
            2 * F.col(f"o{b}") > F.col("_n"), F.lit(1).cast("long")
        ).otherwise(0)
        term = F.shiftleft(bit, b)
        ref = term if ref is None else ref.bitwiseXOR(term)
    want = {
        r["doc_id"]: r["simhash"]
        for r in agg.select("doc_id", ref.alias("simhash")).collect()
    }
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash64(spark, SF, method=method, n_bits=n_bits).collect()
    }
    assert got == want


def test_star_ops_window_form_matches_join_form(spark):
    """Round 9: _large_star/_small_star compute the per-node minimum via a
    window over hashpartitioning(u) instead of groupBy + join-back (one
    exchange and no join per star op). The edge algebra must be EXACTLY
    Kiveris et al.'s — pin the window form against the former join form
    on random graphs (chains, stars and cliques all arise at 400 edges
    over 300 nodes)."""
    import random

    rng = random.Random(7)

    def large_star_join(e):
        sym = dedup._sym(e)
        m = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("mv", F.col("u")).alias("m"))
        return dedup._canon_edges(
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star_join(e):
        le = dedup._sym(e).filter(F.col("v") < F.col("u"))
        m = le.groupBy("u").agg(F.min("v").alias("m"))
        children = (
            le.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        selfs = m.select("u", F.col("m").alias("v"))
        return dedup._canon_edges(children.union(selfs))

    for trial in range(2):
        edges = [
            (rng.randint(0, 300), rng.randint(0, 300)) for _ in range(400)
        ]
        e = dedup._canon_edges(
            spark.createDataFrame(edges, "u long, v long")
        ).localCheckpoint()
        for new, old in (
            (dedup._large_star, large_star_join),
            (dedup._small_star, small_star_join),
        ):
            a, b = new(e), old(e)
            assert a.exceptAll(b).count() == 0
            assert b.exceptAll(a).count() == 0


def test_ngram_jaccard_exact_value(spark):
    t1 = "a b c d e f"        # shingles: abc bcd cde def (4)
    t2 = "a b c d x y"        # shingles: abc bcd cdx dxy (4), intersect 2
    docs = spark.createDataFrame(
        [(1, t1, "en", "s"), (2, t2, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    sh = dedup._shingles(docs)
    from pyspark.sql import Window  # noqa: F401

    rows = sh.collect()
    s1 = {r["shingle"] for r in rows if r["doc_id"] == 1}
    s2 = {r["shingle"] for r in rows if r["doc_id"] == 2}
    assert len(s1 & s2) == 2 and len(s1 | s2) == 6  # jaccard = 1/3


# -------------------------------------------------------------- similarity

def test_cosine_topk_matches_numpy(spark):
    out = similarity.cosine_topk(spark, SF, query_vec_id=0, k=5).collect()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(t.column("vec_id").to_pylist())
    q = vecs[ids == 0][0]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = [
        int(i) for i in ids[np.lexsort((ids, -np.round(sims, 4)))] if i != 0
    ][:5]
    assert [r["vec_id"] for r in out] == order


def test_lsh_recall_reasonable(spark):
    exact = {r["vec_id"] for r in similarity.cosine_topk(spark, SF, 0, 10).collect()}
    approx = {r["vec_id"] for r in similarity.cosine_topk_lsh(spark, SF, 0, 10).collect()}
    # LSH candidates all come from the query's bucket; whatever it returns
    # must be a subset of genuinely-scored vectors and deterministic
    again = {r["vec_id"] for r in similarity.cosine_topk_lsh(spark, SF, 0, 10).collect()}
    assert approx == again
    assert len(approx) >= 1


# -------------------------------------------------------------- multimodal

def test_multimodal_features_deterministic(spark):
    out = multimodal.multimodal_features_demo(spark, SF)
    rows = out.limit(5).collect()
    assert all(r["magic"] == "html" for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    again = out.limit(5).collect()
    assert rows == again


def test_multimodal_real_decoder_is_stubbed(spark):
    from hadoop_etl_udfs_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 10, seed=1)
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(pages, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_offsets_and_padding(spark):
    """Frame sampling: evenly spaced windows, last flush with the tail,
    short blobs collapse to one whole-blob frame, real decode stubbed."""
    rows = [("a", bytes(range(200))), ("b", b"xy"), ("c", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = multimodal.frame_sample(df, n_frames=4, frame_bytes=64).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["url"], []).append(r)
    a = sorted(by_key["a"], key=lambda r: r["frame_no"])
    assert [r["frame_off"] for r in a] == [0, 45, 90, 136]  # (i*136)//3
    assert all(r["frame_len"] == 64 for r in a)
    assert bytes(a[3]["frame"]) == bytes(range(136, 200))
    (b,) = by_key["b"]
    assert b["frame_off"] == 0 and bytes(b["frame"]) == b"xy" and b["frame_len"] == 2
    (c,) = by_key["c"]  # null payload -> one empty frame, not a crash
    assert c["frame_len"] == 0
    with pytest.raises(Exception):
        multimodal.frame_sample(df, use_real_decoder=True).collect()
    # n_frames=1 on a long blob: single head frame, no division by zero
    one = multimodal.frame_sample(df, n_frames=1, frame_bytes=64).collect()
    assert len(one) == 3
    a1 = next(r for r in one if r["url"] == "a")
    assert a1["frame_off"] == 0 and a1["frame_len"] == 64
    with pytest.raises(ValueError, match="n_frames"):
        multimodal.frame_sample(df, n_frames=0)


def test_frame_sample_vectorized_matches_reference_loop(spark):
    """Batch-shape test for the cumsum-scatter kernel: one Arrow batch
    mixing long / exactly-frame_bytes / short / empty / null blobs must
    produce exactly what the straightforward per-blob loop produces —
    same (key, frame_no) multiset, same offsets/lengths/bytes."""
    import random

    rng = random.Random(7)
    n_frames, fb = 3, 16
    rows = []
    for i in range(40):
        L = rng.choice([0, 1, fb - 1, fb, fb + 1, rng.randrange(2 * fb, 200)])
        rows.append((f"k{i:02d}", bytes(rng.randrange(256) for _ in range(L))))
    rows.append(("knull", None))

    expected = []
    for key, payload in rows:
        p = payload or b""
        L = len(p)
        offs = (
            [0]
            if L <= fb
            else [(i * (L - fb)) // (n_frames - 1) for i in range(n_frames)]
        )
        for i, off in enumerate(offs):
            win = p[off : off + fb]
            expected.append((key, i, off, len(win), win))

    df = spark.createDataFrame(rows, "url string, html binary").coalesce(1)
    got = [
        (r["url"], r["frame_no"], r["frame_off"], r["frame_len"], bytes(r["frame"]))
        for r in multimodal.frame_sample(df, n_frames=n_frames, frame_bytes=fb).collect()
    ]
    assert sorted(got) == sorted(expected)


def test_resize_grayscale_block_means(spark):
    """Resize kernel: first src bytes as a bitmap, zero-padded, block-mean
    pooled — exact expected values, vectorized scatter path."""
    img = bytes(range(16))            # 4x4: rows [0..3],[4..7],[8..11],[12..15]
    short = bytes([100, 200])         # pads 14 zeros
    df = spark.createDataFrame(
        [("full", img), ("short", short)], "url string, html binary"
    )
    out = {
        r["url"]: list(r["pixels"])
        for r in multimodal.resize_grayscale(df, src=(4, 4), dst=(2, 2)).collect()
    }
    assert out["full"] == [
        (0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4,
        (8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4,
    ]
    assert out["short"] == [(100 + 200) / 4, 0.0, 0.0, 0.0]


def test_ivf_deterministic_and_partitions_all_vectors(spark):
    a = similarity.ivf_assignments(spark, SF).collect()
    b = similarity.ivf_assignments(spark, SF).collect()
    assert a == b
    assert len(a) == 500 and all(0 <= r["cell"] < similarity.N_CELLS for r in a)
    topk = similarity.cosine_topk_ivf(spark, SF).collect()
    assert len(topk) == 10


def test_ivf_recall_rises_with_n_probe_and_is_exact_at_full_probe(spark):
    """The property the IVF recall harness exists to measure: mean recall@k
    is non-decreasing in n_probe, and probing EVERY cell reproduces the
    exact ranking (recall 1.0 for every query) — the harness's own
    correctness anchor (an approximate index that misses neighbors at
    exhaustive probe has a broken candidate path, not a tuning problem)."""
    means = []
    for n_probe in (1, 4, similarity.N_CELLS):
        rows = similarity.ann_recall_at_k_ivf(spark, SF, n_probe=n_probe).collect()
        assert len(rows) == 5
        means.append(sum(r["recall"] for r in rows) / len(rows))
    assert means == sorted(means)
    assert means[-1] == 1.0


def test_recall_query_sample_is_capped(spark):
    """The recall harnesses' eval sample is bounded ABSOLUTELY (r7 verdict
    watch item: the bare stride grew Q — and the IVF harness's driver-side
    probe collect — linearly with the corpus). With query_every=1 every
    vec_id qualifies; the cap must keep exactly the q_max lowest q_ids,
    in both harnesses."""
    for fn in (similarity.ann_recall_at_k, similarity.ann_recall_at_k_ivf):
        rows = fn(spark, SF, query_every=1, k=3, q_max=4).collect()
        assert [r["q_id"] for r in rows] == [0, 1, 2, 3]
    # and the default cap leaves the gate-scale sample (500/100 = 5 queries,
    # far under RECALL_Q_MAX) untouched
    assert similarity.ann_recall_at_k_ivf(spark, SF).count() == 5


def test_ngram_shingle_df_cap_bounds_join(spark, tmp_path):
    """Planted stopword-heavy corpus: a shingle appearing in every doc is a
    quadratic join bomb — the DF cap must drop it from the shingle universe,
    and results must be unchanged when no shingle exceeds the cap."""
    stop = "the quick brown"  # appears in ALL docs -> df = n_docs
    rows = [
        (i, f"{stop} unique{i} tail{i} end{i} more{i}", "en", "s")
        for i in range(20)
    ]
    # plus one genuine near-dup pair sharing non-stopword shingles
    rows += [
        (100, "alpha beta gamma delta epsilon zeta", "en", "s"),
        (101, "alpha beta gamma delta epsilon eta", "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    corpus_dir = str(tmp_path / "ngram_cap")
    docs.write.mode("overwrite").parquet(corpus_dir + "/documents.parquet")
    # cap below the stopword df: the all-docs shingle is dropped, the planted
    # pair (whose shared shingles have df=2) still surfaces
    capped = dedup.ngram_jaccard_pairs(
        spark, corpus_dir, threshold=0.1, max_shingle_df=5
    ).collect()
    pair_ids = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (100, 101) in pair_ids
    # the stopword shingle links every doc pair; without the cap the join
    # would emit >= C(20,2)=190 intersecting pairs — with it, none of the
    # filler docs pair up (their only shared shingles contain the stopword)
    assert all(a >= 100 for a, b in pair_ids)
    # results unchanged below the cap: raising the cap far above every df
    # changes nothing for the planted pair's jaccard
    uncapped = dedup.ngram_jaccard_pairs(
        spark, corpus_dir, threshold=0.1, max_shingle_df=10_000
    ).collect()
    j_capped = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped}
    j_full = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in uncapped}
    assert j_full[(100, 101)] == j_capped[(100, 101)]


def test_embedding_neardup_bucket_cap(spark):
    """A bucket over max_bucket is skipped entirely; results are unchanged
    when every bucket is under the cap."""
    norm = similarity.embedding_neardup_pairs(spark, SF, threshold=0.5)
    base = {(r["vec_a"], r["vec_b"]) for r in norm.collect()}
    same = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_neardup_pairs(
            spark, SF, threshold=0.5, max_bucket=10_000
        ).collect()
    }
    assert base == same  # sf0.001 buckets are all far under the default cap
    # cap of 1 skips every bucket with >= 2 members -> no pairs at all
    none = similarity.embedding_neardup_pairs(
        spark, SF, threshold=0.0, max_bucket=1
    ).count()
    assert none == 0


def test_ivf_kernel_matches_expression_tree(spark):
    """The vectorized pandas-UDF cell assignment must agree with the
    Catalyst expression tree it replaced (round-2 verdict top item) — same
    float64 left-to-right arithmetic, same first-min tie-break. The oracle
    SQL mirrors the expression tree, so kernel==tree keeps the oracle green."""
    kernel = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assignments(spark, SF).collect()
    }
    import os

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    tree = {
        r["vec_id"]: r["cell"]
        for r in similarity._with_cell_expr(
            emb, "embedding", similarity.quantizer_centroids()
        ).select("vec_id", "cell").collect()
    }
    assert kernel == tree


def test_lsh_kernel_matches_expression_tree(spark):
    """The round-7 vectorized sign-bit bucket kernel must agree with the
    Catalyst expression tree it replaced (r6 verdict top item — the last
    hot-path interpreted HOF). Same float64 left-to-right dot-product fold,
    so the DuckDB list_dot_product oracle stays green by transitivity."""
    import os

    planes = similarity._planes()
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    kernel = {
        r["vec_id"]: r["bucket"]
        for r in similarity.lsh_buckets(spark, SF).collect()
    }
    tree = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id",
            similarity.lsh_bucket_expr(F.col("embedding"), planes).alias(
                "bucket"
            ),
        ).collect()
    }
    assert kernel == tree and len(kernel) == 500


def test_lsh_kernel_zero_dot_edge(spark):
    """A zero vector dots to EXACTLY 0.0 against every plane; `-0.0 >= 0`
    and `0.0 >= 0` are both true in numpy and the JVM, so both paths must
    set every bit (bucket = 2^n_planes - 1)."""
    planes = similarity._planes()
    zeros = spark.createDataFrame(
        [(0, [0.0] * similarity.DIM)], "vec_id long, embedding array<float>"
    )
    k = similarity._with_lsh_bucket(zeros, "embedding", planes).collect()[0]
    t = zeros.select(
        similarity.lsh_bucket_expr(F.col("embedding"), planes).alias("bucket")
    ).collect()[0]
    assert k["bucket"] == t["bucket"] == (1 << similarity.N_PLANES) - 1


def test_lsh_and_ivf_kernels_null_embedding_matches_expression(spark):
    """A NULL embedding must not crash the Arrow kernels: the LSH
    expression tree yields bucket 0 (every NULL-dot bit is 0) and the IVF
    tree yields cell NULL — the kernels must match both (r7 review)."""
    planes = similarity._planes()
    cents = similarity.quantizer_centroids()
    df = spark.createDataFrame(
        [(1, [1.0] * similarity.DIM), (2, None), (3, [0.5] * similarity.DIM)],
        "vec_id long, embedding array<float>",
    )
    kb = {r["vec_id"]: r["bucket"]
          for r in similarity._with_lsh_bucket(df, "embedding", planes).collect()}
    tb = {r["vec_id"]: r["bucket"]
          for r in df.select(
              "vec_id",
              similarity.lsh_bucket_expr(F.col("embedding"), planes).alias("bucket"),
          ).collect()}
    assert kb == tb and kb[2] == 0
    kc = {r["vec_id"]: r["cell"]
          for r in similarity._with_cell(df, "embedding", cents).select(
              "vec_id", "cell").collect()}
    tc = {r["vec_id"]: r["cell"]
          for r in similarity._with_cell_expr(df, "embedding", cents).select(
              "vec_id", "cell").collect()}
    assert kc == tc and kc[2] is None


def test_minhash_stringfree_base_hash_semantics(spark, tmp_path):
    """The r7 string-free production shingle hash preserves the membership
    semantics of the string path: identical docs share ALL signature
    values, a near-dup pair shares most, whitespace-only/NULL docs emit NO
    signature row, and short (<k words) docs still emit one."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),          # identical to 1
        (3, "alpha beta gamma delta zeta"),              # near-dup of 1
        (4, "   "),                                      # whitespace-only
        (5, None),                                       # NULL text
        (6, "one two"),                                  # < k words
        (7, "completely different words here entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures(docs).collect()
    by_id = {r["doc_id"]: [r[f"mh{p}"] for p in range(dedup.N_PERM)]
             for r in sig}
    assert set(by_id) == {1, 2, 3, 6, 7}  # 4 and 5 emit no row
    assert by_id[1] == by_id[2]
    shared_13 = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared_13 > dedup.N_PERM // 4    # near-dups share many mins
    assert by_id[1] != by_id[7]
    # ...and the banded pipeline still pairs the identical/near-dup docs
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.minhash_lsh_pairs(spark, str(tmp_path)).collect()}
    assert (1, 2) in pairs


def test_ivf_missing_query_vec_raises_loud(spark):
    """An absent query vec_id must raise a descriptive ValueError, not a
    bare IndexError from collect()[0] (r6 advice)."""
    import pytest

    with pytest.raises(ValueError, match="not found"):
        similarity.cosine_topk_ivf(spark, SF, query_vec_id=10**9).collect()


def test_minhash_mix_params_domain():
    """The ANSI-overflow safety argument: a1, a2 < 2^29 and b < 2^61-1 keep
    every mix term under 2^62 and their sum under 2^63 (no long overflow in
    Spark 4 ANSI mode); all three are strictly deterministic."""
    p1 = dedup._mix_params()
    p2 = dedup._mix_params()
    assert p1 == p2 and len(p1) == dedup.N_PERM
    for a1, a2, b in p1:
        assert 1 <= a1 < (1 << 29) and 1 <= a2 < (1 << 29)
        assert 0 <= b < dedup._MIX_PRIME
        assert a1 * ((1 << 32) - 1) + a2 * ((1 << 32) - 1) + b < (1 << 63)


def test_minhash_band_bucket_cap(spark, tmp_path):
    """A class of K identical docs shares every band signature -> K^2
    candidate rows without a bound. The band-bucket cap must drop over-cap
    buckets (round-2 verdict item 3) while a genuine near-dup pair in a
    small bucket still surfaces."""
    K = 20
    dup = " ".join(f"tok{i}" for i in range(40))
    rows = [(i, dup, "en", "s") for i in range(K)]
    near_a = " ".join(f"uniq{i}" for i in range(40))
    near_b = " ".join(f"uniq{i}" for i in range(38)) + " xx yy"
    rows += [(100, near_a, "en", "s"), (101, near_b, "en", "s")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    corpus = str(tmp_path / "mh_cap")
    docs.write.mode("overwrite").parquet(corpus + "/documents.parquet")
    capped = dedup.minhash_lsh_pairs(spark, corpus, max_band_bucket=8).collect()
    pair_ids = {(r["doc_a"], r["doc_b"]) for r in capped}
    # every band bucket of the identical class has size K=20 > 8 -> skipped;
    # the near-dup pair's buckets have size <= 2 -> kept
    assert (100, 101) in pair_ids
    assert all(a >= 100 for a, _ in pair_ids)
    # without the cap the identical class floods in: C(20,2) pairs, each
    # sharing all 8 bands — exactly the quadratic blowup the cap prevents
    full = dedup.minhash_lsh_pairs(spark, corpus, max_band_bucket=10_000)
    full_rows = full.collect()
    dup_pairs = [r for r in full_rows if r["doc_a"] < K]
    assert len(dup_pairs) == K * (K - 1) // 2
    assert all(r["n_shared_bands"] == 8 for r in dup_pairs)


def test_train_ivf_centroids_sampled_and_deterministic(spark):
    import os

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    c1 = similarity.train_ivf_centroids(emb, sample_rows=256)
    c2 = similarity.train_ivf_centroids(emb, sample_rows=256)
    assert c1.shape == (similarity.N_CELLS, similarity.DIM)
    assert (c1 == c2).all()
    # trained quantizer plugs into the same assignment path
    out = similarity.ivf_assignments(spark, SF, centroids=c1)
    assert out.count() == 500
    cells = {r["cell"] for r in out.collect()}
    assert cells <= set(range(similarity.N_CELLS)) and len(cells) > 1


def test_duplicate_clusters_label_propagation(spark):
    """Connected components over planted pair graphs: a diameter-4 chain
    (multi-round propagation), an isolated pair, and a triangle all resolve
    to their component-min representative with correct sizes; an
    unconverged run raises instead of returning split clusters."""
    from hadoop_etl_udfs_spark.operators.dedup import duplicate_clusters

    # chain 10-11-12-13-14 (diameter 4), pair 20-21, triangle 30-31-32
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (20, 21),
         (30, 31), (31, 32), (30, 32)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r for r in duplicate_clusters(pairs).collect()}
    assert {d: r["cluster_rep"] for d, r in out.items()} == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30,
    }
    assert all(out[d]["cluster_size"] == 5 for d in (10, 11, 12, 13, 14))
    assert out[20]["cluster_size"] == 2 and out[30]["cluster_size"] == 3
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=2)  # diameter-4 chain needs more


def test_containment_pairs_planted_excerpt(spark, tmp_path):
    """containment_pairs' reason to exist: a short doc EMBEDDED in a long
    one has containment ~1 on the short side but Jaccard far below the 0.1
    pair threshold (the union is the long doc). Planted data + in-test
    DuckDB mini-oracle (the synthetic corpus carries only one organic
    overlap pair, per CLAUDE.md's planted-data rule)."""
    import duckdb

    long_words = [f"w{i}" for i in range(200)]
    excerpt = long_words[40:60]  # 20 contiguous words => 18 shared shingles
    rows = [
        (1, " ".join(long_words), "en", "s"),
        (2, " ".join(excerpt), "en", "s"),
        (3, "totally unrelated content with different words", "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    corpus = str(tmp_path / "cont")
    docs.write.parquet(corpus + "/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
        for r in dedup.containment_pairs(spark, corpus).collect()
    }
    assert (1, 2) in got
    ca, cb = got[(1, 2)]
    assert cb == 1.0          # every excerpt shingle is in the long doc
    assert ca < 0.15          # ...but covers <15% of the long doc
    # Jaccard misses this pair at its threshold
    jac = {(r["doc_a"], r["doc_b"])
           for r in dedup.ngram_jaccard_pairs(spark, corpus).collect()}
    assert (1, 2) not in jac
    # in-test DuckDB mini-oracle for the exact values
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus}/documents.parquet/*.parquet'"
    )
    import __spark_entry__ as entrymod

    oracle = con.execute(entrymod.oracle_sql()["containment_pairs"]).fetchall()
    assert [(r[0], r[1], r[2], r[3]) for r in oracle] == [
        (a, b, *got[(a, b)]) for (a, b) in sorted(got)
    ]
