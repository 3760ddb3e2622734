"""Training-corpus curation operators (operators/curation.py): stratified
quota sampling, token-budget shard packing (distributed prefix sum), and
best-in-cluster dedup resolution. Driver-facing value agreement is oracle-
checked via check_correctness; these tests pin the operator INVARIANTS and
planted-data behaviors the synthetic corpus can't prove."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_etl_udfs_spark.operators import curation

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_deterministic_and_growth_stable(spark, tmp_path):
    """Membership is a pure function of doc_id: identical across runs, and
    sampling a SUBSET corpus yields exactly the subset of the full sample
    (growing the corpus never resamples old docs)."""
    full = {r["doc_id"] for r in curation.stratified_sample(spark, SF_DIR).collect()}
    again = {r["doc_id"] for r in curation.stratified_sample(spark, SF_DIR).collect()}
    assert full == again and len(full) > 0

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half.write.parquet(str(tmp_path / "documents.parquet"))
    sub = {
        r["doc_id"]
        for r in curation.stratified_sample(spark, str(tmp_path)).collect()
    }
    assert sub == {d for d in full if d % 2 == 0}


def test_stratified_sample_respects_language_quotas(spark):
    """Per-language keep rates track the configured ppm — the md5 gate is
    uniform, so at 500 docs each language lands within a generous
    binomial-noise band of its quota."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in
            curation.stratified_sample(spark, SF_DIR)
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lg, tot in totals.items():
        frac = curation.SAMPLE_PPM.get(lg, curation.SAMPLE_DEFAULT_PPM) / 1e6
        got = kept.get(lg, 0) / tot
        # 4 sigma of binomial noise at n=tot
        sigma = (frac * (1 - frac) / tot) ** 0.5
        assert abs(got - frac) < 4 * sigma + 0.02, (lg, got, frac, tot)


def test_pack_corpus_shards_matches_naive_global_prefix_sum(spark):
    """The two-level (bucket window + stitched offsets) prefix sum equals
    the naive single-ordering cumsum — computed independently in pandas
    over the same (bucket, h, doc_id) total order."""
    got = curation.pack_corpus_shards(spark, SF_DIR).toPandas()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from hadoop_etl_udfs_spark.functions import text as T
    from hadoop_etl_udfs_spark.operators.dedup import _hash64

    h = _hash64([F.col("doc_id")], curation.PACK_SEED, "md5")
    raw = docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        h.alias("h"),
        F.pmod(h, F.lit(curation.PACK_BUCKETS)).alias("bucket"),
    ).toPandas()
    raw = raw.sort_values(["bucket", "h", "doc_id"]).reset_index(drop=True)
    raw["start"] = raw["n_tokens"].cumsum() - raw["n_tokens"]
    raw["shard_id"] = raw["start"] // curation.PACK_BUDGET_TOKENS

    merged = got.merge(raw[["doc_id", "shard_id"]], on="doc_id",
                       suffixes=("", "_naive"))
    assert len(merged) == len(got) == len(raw)
    assert (merged["shard_id"] == merged["shard_id_naive"]).all()


def test_pack_corpus_shards_greedy_budget_invariants(spark):
    """Shards are contiguous from 0; every shard's token sum stays under
    budget + its largest doc (greedy overrun bound); totals add up."""
    got = curation.pack_corpus_shards(spark, SF_DIR).toPandas()
    shards = sorted(got["shard_id"].unique())
    assert shards[0] == 0
    assert shards == list(range(len(shards)))  # no gaps (docs < budget)
    per = got.groupby("shard_id")["n_tokens"].agg(["sum", "max"])
    # greedy segment bound: a doc overrunning a boundary extends its own
    # shard and shortens the next, so every non-last shard's token sum
    # lies within one max-doc of the budget on either side
    mx = got["n_tokens"].max()
    b = curation.PACK_BUDGET_TOKENS
    assert (per["sum"][:-1] >= b - mx).all() and (per["sum"][:-1] <= b + mx).all()
    assert per["sum"].sum() == got["n_tokens"].sum()


def test_pack_token_sequences_tiling_on_planted_data(spark):
    """Fixed-length sequence packing (round 8) on plants that heat every
    branch — a doc spanning >=3 windows, a doc exactly one window long, a
    zero-token doc, and small docs that co-pack — with the driver oracle
    run as an in-test DuckDB mini-oracle on the same rows. The tiling
    invariants are the operator's contract: per sequence the spans cover
    [0, L) exactly (final partial sequence excepted), per document they
    cover [0, n_tokens) exactly."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    L = curation.SEQ_LEN
    mk = lambda i, n: (i, " ".join(f"d{i}w{j}" for j in range(n)))
    rows = [
        mk(0, 2 * L + 37),  # straddles >= 3 windows
        mk(1, 5),
        mk(2, 120),
        mk(3, L),           # exactly one window of tokens
        (4, ""),            # zero tokens -> places nothing
        mk(5, 259),
        mk(6, 1),
    ]
    n_tok = {i: (len(t.split()) if t else 0) for i, t in rows}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        tuple(r) for r in curation.pack_token_sequences_df(docs).collect()
    )

    assert not any(r[1] == 4 for r in out)          # empty doc placed nothing
    assert len({r[0] for r in out if r[1] == 0}) >= 3  # big doc straddles

    by_doc: dict[int, list] = {}
    by_seq: dict[int, list] = {}
    for seq_id, doc_id, doc_off, seq_off, n in out:
        by_doc.setdefault(doc_id, []).append((doc_off, n))
        by_seq.setdefault(seq_id, []).append((seq_off, n))
    for doc_id, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a, an), (bo, _) in zip(spans, spans[1:]):
            assert a + an == bo, (doc_id, spans)
        assert sum(n for _, n in spans) == n_tok[doc_id]
    last_seq = max(by_seq)
    assert set(by_seq) == set(range(last_seq + 1))   # contiguous windows
    for seq_id, spans in by_seq.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a, an), (bo, _) in zip(spans, spans[1:]):
            assert a + an == bo, (seq_id, spans)
        total = sum(n for _, n in spans)
        assert total == L if seq_id < last_seq else 0 < total <= L

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(
            entry.oracle_sql()["pack_token_sequences"]
        ).fetchall()
    )
    assert oracle == out


def test_dedup_keep_best_prefers_quality_on_planted_near_dups(spark, tmp_path):
    """Planted near-dup cluster where the naive smallest-id rep is the LOW
    quality copy: keep_best must pick the high-quality one instead, emit
    exactly one keep per cluster, and label sizes correctly."""
    base = (
        "the quick brown fox jumps over the lazy dog while many other "
        "common words fill this perfectly ordinary sentence. it continues "
        "with more of the usual text, and the final words are here."
    )
    # doc 0: near-dup with a trailing punctuation blob — one extra token,
    #        so it shares almost every word shingle with doc 1, but the
    #        punct_ratio quality penalty trips (low quality)
    # doc 1: clean copy with one word changed (same shingle mass -> same
    #        cluster, high quality)
    # doc 2: unrelated singleton (no pair -> absent from output)
    rows = [
        (0, base + " " + ";;;!!???::::....,,,," * 5, "en"),
        (1, base.replace("ordinary", "everyday"), "en"),
        (2, "totally different content about ships and harbors and tides "
            "that shares nothing with the fox sentence at all beyond common "
            "the and words appearing throughout this unrelated passage.", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: r for r in
           curation.dedup_keep_best(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}  # the singleton needs no decision
    assert out[0]["cluster_size"] == out[1]["cluster_size"] == 2
    assert out[0]["cluster_rep"] == out[1]["cluster_rep"] == 0
    assert out[1]["quality"] > out[0]["quality"]
    assert out[1]["keep"] == 1 and out[0]["keep"] == 0


def test_dedup_keep_best_one_survivor_per_cluster(spark):
    """On the real corpus: exactly one keep per cluster, and the survivor
    is argmax(quality, tie -> min doc_id) within its cluster."""
    df = curation.dedup_keep_best(spark, SF_DIR).toPandas()
    if df.empty:
        pytest.skip("no near-dup pairs at this SF")
    per = df.groupby("cluster_rep")
    assert (per["keep"].sum() == 1).all()
    for _, g in per:
        best = g.sort_values(["quality", "doc_id"],
                             ascending=[False, True]).iloc[0]
        assert g.loc[g["keep"] == 1, "doc_id"].iloc[0] == best["doc_id"]


def test_curate_corpus_composition_and_shard_readback(spark, tmp_path):
    """The END-TO-END curation composition (r6 verdict item 4): sample ->
    keep-best near-dup resolution -> shard packing -> shard-clustered
    chunk sink, then ONE shard read back through the cluster-stamp-pruned
    decode path must return exactly that shard's documents (the layout
    jobs/curate_job.py writes)."""
    from hadoop_etl_udfs_spark.operators.encode import encode_pages
    from hadoop_etl_udfs_spark.plans.lineage import (
        decode_chunks_where_clustered,
        write_encoded,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    cur = curation.curate_corpus(docs, method="md5").localCheckpoint()
    # funnel invariants: every curated doc was sampled; near-dup LOSERS
    # (keep=0 labels) are gone, keepers survive
    sampled = {
        r["doc_id"]
        for r in curation.stratified_sample_df(docs).select("doc_id").collect()
    }
    labels = {
        r["doc_id"]: r["keep"]
        for r in curation.dedup_keep_best_df(
            curation.stratified_sample_df(docs), method="md5"
        ).collect()
    }
    got_ids = {r["doc_id"] for r in cur.select("doc_id").collect()}
    assert got_ids <= sampled
    assert sampled - got_ids == {d for d, k in labels.items() if k == 0}

    out = str(tmp_path / "curated_sink")
    laid_out = cur.repartitionByRange(4, "shard_id").sortWithinPartitions(
        "shard_id", "doc_id"
    )
    write_encoded(
        encode_pages(laid_out, shuffle=False, cluster_by="shard_id"), out
    )
    n_shards = cur.agg(F.max("shard_id")).collect()[0][0] + 1
    # greedy packing may skip shard ids — probe the first POPULATED shard
    # at/after the midpoint (always exists: the max id is populated)
    mid = int(cur.filter(
        F.col("shard_id") >= int(n_shards) // 2
    ).agg(F.min("shard_id")).collect()[0][0])
    back = decode_chunks_where_clustered(
        spark, out, lo=mid, hi=mid, schema=curation.CURATED_SCHEMA
    ).filter(F.col("shard_id") == mid)
    want = {
        (r["doc_id"], r["text"]) for r in cur.filter(
            F.col("shard_id") == mid
        ).select("doc_id", "text").collect()
    }
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == want and len(got) > 0


def test_curate_corpus_boilerplate_stage(spark):
    """The boilerplate stage of the composed pipeline (round 8; this stage
    stays OFF in the driver's curate_corpus_checked — its oracle twin
    would need full cleaned-text reconstruction in SQL, so the composition
    is pinned here instead). Three proofs on a planted corpus where the
    stage is HOT: (1) slotting boilerplate_clean_df into the chain equals
    hand-composing it around the (idempotent) sample gate; (2) the cleaned
    TEXT flowing downstream hashes to exactly the oracle-checked
    boilerplate_removal clean_md5 per doc; (3) the all-boilerplate doc is
    dropped and carriers lose the shared segment (n_tokens shrink)."""
    import hashlib

    from hadoop_etl_udfs_spark.operators import textstats

    B = " ".join(f"boiler{j}" for j in range(textstats.SEGMENT_WORDS))
    rows = []
    for i in range(12):  # carrier docs: boiler segment + unique tail
        uniq = " ".join(f"carrier{i}w{j}" for j in range(10))
        rows.append((1000 + i, f"{B} {uniq}", "zh", "s1"))
    rows.append((2000, B, "zh", "s1"))  # all-boilerplate doc
    for i in range(6):
        rows.append(
            (3000 + i, " ".join(f"plain{i}w{j}" for j in range(20)), "zh", "s2")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sampled = curation.stratified_sample_df(docs).localCheckpoint()
    sampled_ids = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    carriers = {d for d in sampled_ids if 1000 <= d < 2000}
    assert len(carriers) >= textstats.BOILERPLATE_MIN_DOCS  # stage is hot

    got = curation.curate_corpus(
        docs, method="md5", boilerplate=True
    ).localCheckpoint()
    expected = curation.curate_corpus(
        textstats.boilerplate_clean_df(sampled), method="md5"
    )
    cols = ["doc_id", "text", "lang", "source", "n_tokens", "shard_id"]
    snap = lambda df: sorted(tuple(r) for r in df.select(*cols).collect())
    assert snap(got) == snap(expected)

    got_rows = {r["doc_id"]: r for r in got.collect()}
    assert 2000 not in got_rows  # all-boilerplate doc dropped
    md5s = {
        r["doc_id"]: r["clean_md5"]
        for r in textstats.boilerplate_removal_df(sampled).collect()
    }
    for d, r in got_rows.items():
        # the text each downstream stage consumed IS the oracle-checked
        # cleaned text
        assert hashlib.md5(r["text"].encode()).hexdigest() == md5s[d]
        if d in carriers:
            assert "boiler0" not in r["text"]
            assert r["n_tokens"] == 10  # the unique tail only


def test_curate_corpus_repetition_stage(spark):
    """The repetition-filter stage of the composed pipeline (round 8; like
    the boilerplate stage it stays OFF in the driver's
    curate_corpus_checked — the signal operator has its OWN oracle row and
    planted mini-oracle test, the composition is pinned here). Proofs on a
    planted corpus where the stage is HOT: (1) slotting the stage into the
    chain equals hand-composing the anti-join around the (idempotent)
    sample gate; (2) every repetition_flag doc is gone downstream; (3)
    clean docs flow through untouched."""
    from hadoop_etl_udfs_spark.operators import textstats

    seg = " ".join(f"r{j}" for j in range(textstats.SEGMENT_WORDS))
    rows = []
    for i in range(10):  # repetition-dominated: one segment x4 + unique tail
        rows.append((1000 + i, f"{seg} {seg} {seg} {seg} tail{i}", "zh", "s1"))
    for i in range(10):
        rows.append(
            (3000 + i, " ".join(f"p{i}w{j}" for j in range(25)), "zh", "s2")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sampled = curation.stratified_sample_df(docs).localCheckpoint()
    flags = {
        r["doc_id"]: r["repetition_flag"]
        for r in textstats.repetition_signals_df(sampled).collect()
    }
    hot = {d for d, f in flags.items() if f}
    assert hot and all(1000 <= d < 2000 for d in hot)  # stage is hot
    assert all(f for d, f in flags.items() if 1000 <= d < 2000)

    got = curation.curate_corpus(
        docs, method="md5", repetition_filter=True
    ).localCheckpoint()
    hand = sampled.join(
        spark.createDataFrame([(d,) for d in hot], "doc_id long"),
        "doc_id",
        "left_anti",
    )
    expected = curation.curate_corpus(hand, method="md5")
    cols = ["doc_id", "text", "lang", "source", "n_tokens", "shard_id"]
    snap = lambda df: sorted(tuple(r) for r in df.select(*cols).collect())
    assert snap(got) == snap(expected)

    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert not (got_ids & hot)            # flagged docs dropped
    assert got_ids and min(got_ids) >= 3000  # survivors are the clean docs


def test_curate_corpus_lm_order2_stage(spark):
    """The bigram variant of the LM stage (round 8, ``lm_order=2``; the
    checked twin and its oracle stay on order 1 — the bigram operator has
    its OWN oracle row and planted mini-oracle test, the composition is
    pinned here). Plants: repeated-bigram docs and a lex-first filler doc
    whose singleton bigrams fill the top-K table (all conditional-p=1 hit
    pairs, NLL 0 — kept), and junk chain docs whose bigrams lose the
    lexicographic tie at the cnt-1 cut AND whose words are OOV, so every
    pair takes the backoff-to-floor path (flagged, dropped). Slotting the
    stage into the chain must equal hand-composing the anti-join around
    the (idempotent) sample gate. Also pins the loud-validation paths:
    lm_order outside {1, 2} and lm_drop_frac without lm_filter raise."""
    import pytest

    from hadoop_etl_udfs_spark.operators import textstats

    rows = []
    for i in range(5):     # repeated-bigram docs: hit path, NLL 0
        rows.append((1000 + i, ("ca cb " * 30).strip(), "zh", "s1"))
    # lex-first filler: 47 words -> 46 singleton bigrams, all of which WIN
    # the (w1, w2) tie at the cnt-1 cut (LM2_TOP_K=48 = 2 repeated + 46)
    rows.append((2000, " ".join(f"a{j:02d}" for j in range(47)), "zh", "s1"))
    for i in range(10):    # junk chains: pairs past the cut, words OOV
        rows.append(
            (3000 + i, " ".join(f"z{i}w{j}" for j in range(25)), "zh", "s2")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    sampled = curation.stratified_sample_df(docs).localCheckpoint()
    flags = {
        r["doc_id"]: r["lm2_flag"]
        for r in textstats.lm_bigram_scores_df(sampled).collect()
    }
    hot = {d for d, f in flags.items() if f}
    assert hot and all(3000 <= d for d in hot)       # stage is hot
    assert all(f for d, f in flags.items() if d >= 3000)
    assert not any(f for d, f in flags.items() if d < 3000)

    got = curation.curate_corpus(
        docs, method="md5", lm_filter=True, lm_order=2
    ).localCheckpoint()
    hand = sampled.join(
        spark.createDataFrame([(d,) for d in hot], "doc_id long"),
        "doc_id",
        "left_anti",
    )
    expected = curation.curate_corpus(hand, method="md5")
    cols = ["doc_id", "text", "lang", "source", "n_tokens", "shard_id"]
    snap = lambda df: sorted(tuple(r) for r in df.select(*cols).collect())
    assert snap(got) == snap(expected)
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert not (got_ids & hot)

    with pytest.raises(ValueError, match="lm_order"):
        curation.curate_corpus(docs, lm_filter=True, lm_order=3)
    with pytest.raises(ValueError, match="lm_drop_frac"):
        curation.curate_corpus(docs, lm_drop_frac=0.5)


def test_source_quota_cap_matches_naive_window_on_skewed_plant(spark, tmp_path):
    """Two-phase distributed top-k == the naive per-source window, proven
    on a planted SKEWED corpus (one source far over the cap — the case the
    two-phase exists for — one exactly at it, one under): the in-test
    DuckDB mini-oracle runs the driver oracle (the naive window) on the
    same rows. Under-cap sources keep every doc with dense ranks."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    rows = (
        [(i, f"t{i}", "en", "hot") for i in range(100)]
        + [(200 + i, f"u{i}", "en", "at_cap")
           for i in range(curation.SOURCE_CAP)]
        + [(300 + i, f"v{i}", "en", "cold") for i in range(3)]
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = curation.source_quota_cap(spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["hot"]) == curation.SOURCE_CAP      # capped
    assert len(by_src["at_cap"]) == curation.SOURCE_CAP   # kept whole
    assert len(by_src["cold"]) == 3                       # kept whole
    for members in by_src.values():
        assert sorted(r["rk"] for r in members) == list(
            range(1, len(members) + 1)
        )

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"]),
    )
    got = con.execute(entry.oracle_sql()["source_quota_cap"]).fetchall()
    cols = [dsc[0] for dsc in con.description]
    spark_rows = sorted(
        [tuple(r[c] for c in cols) for r in out]
    )
    assert spark_rows == sorted(got)
