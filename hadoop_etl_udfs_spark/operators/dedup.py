"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard. All single-pass DataFrame compositions (map-side
combinable aggregates; no per-row Python).

No reference counterpart (the reference moves data, it never dedups) — these
are the "beyond the reference" training-data operators the engine needs at
10^12-doc scale, where exact dedup is a hash shuffle and near-dup must be
candidate-generated (LSH bands) rather than all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: keep the smallest doc_id
    per fingerprint. At scale: one hash shuffle on the fingerprint (map-side
    partial min), no sort."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_doc_id")
    )


def _shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) word k-grams via array ops (no Python)."""
    w = F.split(F.trim(F.col("text")), r"\s+")
    sh = F.expr(
        f"transform(sequence(0, greatest(size({'w'}), {k}) - {k}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {k})))"
    )
    return (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.explode(sh).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


N_PERM = 32
BAND_ROWS = 4  # 8 bands x 4 rows

_SEP = "\x1f"  # unit separator between hash-input fields

# --- universal-hash permutation mixes (round 7) -----------------------------
# The signature stage used to evaluate n_perm FULL string hashes per shingle
# row (32 xxhash64/md5 calls each re-hashing the whole shingle) — 61% of the
# measured dedup-pipeline wall. Standard MinHash practice hashes the shingle
# ONCE and derives the permutations with a 2-universal integer family:
#     mix_p(h) = (a1_p * hi(h) + a2_p * lo(h) + b_p) mod (2^61 - 1)
# over the base hash's 32-bit halves — same MinHash guarantees, ~n_perm×
# less string hashing, and every term stays under 2^62 so Spark 4's ANSI
# long arithmetic cannot overflow (a1,a2 < 2^29; hi,lo < 2^32). The split
# into halves is what makes the multiply ANSI-safe: a*h on the raw 64-bit
# value would overflow and THROW. All operands are non-negative
# (shiftrightunsigned / masked low bits), so `%` == pmod in both engines.
# DuckDB reproduces the mix exactly on BIGINT — the oracle generator in
# __spark_entry__ imports these SAME constants (CLAUDE.md anti-drift rule).
_MIX_PRIME = (1 << 61) - 1
_MIX_SEED = 20240817


def _mix_params(n_perm: int = N_PERM, seed: int = _MIX_SEED) -> list[tuple[int, int, int]]:
    """Deterministic (a1, a2, b) per permutation: a1, a2 in [1, 2^29),
    b in [0, 2^61-1). Pure function of the seed — the DuckDB oracle embeds
    the same literals."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_perm):
        a1 = int(rng.integers(1, 1 << 29))
        a2 = int(rng.integers(1, 1 << 29))
        b = int(rng.integers(0, _MIX_PRIME))
        out.append((a1, a2, b))
    return out


def _mix_expr(h, a1: int, a2: int, b: int):
    """The Spark column form of mix_p over a non-negative-or-signed 64-bit
    base hash column ``h`` (hi/lo extraction is unsigned, so the mix input
    is always non-negative even for raw xxhash64 values)."""
    hi = F.shiftrightunsigned(h, 32)
    lo = h.bitwiseAND(F.lit((1 << 32) - 1))
    return (F.lit(a1) * hi + F.lit(a2) * lo + F.lit(b)) % F.lit(_MIX_PRIME)


def _hash64(cols: list, seed: int, method: str = "xxhash64"):
    """64-bit-ish hash column. ``xxhash64`` is the production path (fastest,
    JVM-native); ``md5`` derives a 60-bit value from the md5 hex prefix —
    slower, but expressible in DuckDB 1.0, so the *_checked query variants
    can be oracle-verified end-to-end with identical values."""
    if method == "xxhash64":
        return F.xxhash64(*cols, F.lit(seed))
    s = F.concat_ws(_SEP, *[c.cast("string") for c in cols], F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# string-free shingle base hashes for the PRODUCTION signature path: one
# xxhash64 over the k-gram's WORDS directly (tokens never contain the split
# whitespace, so hashing the 3 fields distinguishes exactly the triples the
# concat string did). F.get past the array end yields NULL, which xxhash64
# skips — short docs (< k words) hash their available words, same membership
# as the string path's partial concat. k=3 pinned like _shingles.
_BASE_HASH_SQL = (
    "transform(sequence(0, greatest(size(w), 3) - 3), "
    "i -> xxhash64(get(w, i), get(w, i + 1), get(w, i + 2), 0))"
)


def _shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) rows where ``sh`` = xxhash64 of the word k-gram — the
    string-free analog of :func:`_shingles` (same ``_BASE_HASH_SQL``
    kernel the minhash rewrite measured at 4x the string path).

    Distinct-shingle semantics carry over 1:1 up to 64-bit hash
    collisions (p ≈ n²·2⁻⁶⁴ per doc pair — negligible at any corpus
    size; the same standing approximation as minhash banding itself), so
    the shingle-JOIN operators (jaccard, containment, decontamination)
    keep their string-based DuckDB oracles: intersection/size counts over
    hashes equal those over strings. What changes at scale: no shingle
    string is ever built (the profiled 5.3-of-7.3s term) and the join/
    shuffle keys are 8-byte longs instead of ~20-byte strings."""
    return (
        docs.filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .select("doc_id", F.explode(F.expr(_BASE_HASH_SQL)).alias("sh"))
    )


def minhash_signatures(
    docs: DataFrame, n_perm: int = N_PERM, method: str = "xxhash64"
) -> DataFrame:
    """One row per doc with n_perm minhash values: single explode + one
    groupBy with n_perm min() aggregates (map-side combine keeps the shuffle
    at n_perm longs per doc).

    Round 7, two-level rewrite of the signature stage (was 61% of the
    measured dedup-pipeline wall):

    1. ONE base hash per shingle + n_perm 2-universal integer mixes
       (:func:`_mix_params`) instead of n_perm full string hashes.
    2. For the production method the base hash never BUILDS the shingle
       string at all: profiling at 205k docs put the stage at 7.3 s of
       which 5.3 s was the slice+concat_ws string construction (explode +
       shuffle + 32 min aggregates cost only ~0.9 s), so ``_BASE_HASH_SQL``
       hashes the k-gram's words in place inside codegen — measured
       1.8 s for the identical signature output shape, 4x.

    The md5 method keeps the ``*_checked`` oracle contract: it still
    builds shingle strings exactly as the DuckDB oracle does and derives
    the same base hash + mixes value-for-value (correctness path — runs
    on driver-gate tables, never the corpus hot path).

    Scale note: a stopword shingle adds one exploded row per doc it appears
    in — LINEAR in corpus size, combined map-side before any shuffle (unlike
    a shingle-equality join, where a hot shingle is quadratic — see
    ngram_jaccard_pairs' document-frequency cap). MinHash semantics need the
    full shingle multiset, so no cap is applied here."""
    if method == "xxhash64":
        # whitespace-only docs have no shingles in the string path (its ''
        # filter) — the pre-filter preserves that; NULL text filters out in
        # both paths
        sh = (
            docs.filter(F.trim(F.col("text")) != "")
            .select(
                "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
            )
            .select("doc_id", F.explode(F.expr(_BASE_HASH_SQL)).alias("_h"))
        )
    else:
        sh = _shingles(docs).withColumn(
            "_h", _hash64([F.col("shingle")], 0, method)
        )
    mins = [
        F.min(_mix_expr(F.col("_h"), a1, a2, b)).alias(f"mh{p}")
        for p, (a1, a2, b) in enumerate(_mix_params(n_perm))
    ]
    return sh.groupBy("doc_id").agg(*mins)


MAX_BAND_BUCKET = 64  # band buckets bigger than this are skipped entirely


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, n_perm: int = N_PERM,
    band_rows: int = BAND_ROWS, method: str = "xxhash64",
    max_band_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    shingle -> minhash -> band signatures -> self-join on (band, signature).
    The join key is the band signature, so candidate generation is a hash
    join on a small projected table — never an all-pairs comparison.

    ``max_band_bucket`` bounds the degenerate case: a class of K identical
    documents shares ALL band signatures, so without a cap one hot bucket
    yields K² candidate rows. Buckets larger than the cap are skipped
    (documented approximation, mirroring similarity.embedding_neardup_pairs'
    MAX_BUCKET): members of an over-cap bucket are overwhelmingly
    byte-identical copies, which belong to exact_dedup — run it first, as
    textstats.corpus_filter_pipeline does. Results are exact whenever every
    band bucket is under the cap. The bucket-size filter is an aggregate +
    re-join on the same (band, sig) key — co-partitioned with the pair join,
    NOT broadcast (the bucket list scales with the corpus)."""
    return minhash_lsh_pairs_df(
        _docs(spark, sf_dir), n_perm, band_rows, method, max_band_bucket
    )


def minhash_lsh_pairs_df(
    docs: DataFrame, n_perm: int = N_PERM,
    band_rows: int = BAND_ROWS, method: str = "xxhash64",
    max_band_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """:func:`minhash_lsh_pairs` over an arbitrary (doc_id, text) DataFrame —
    the composable form bench.py's end-to-end dedup-pipeline run feeds with
    the 1.8M-doc synthesized pages table."""
    sig = minhash_signatures(docs, n_perm, method=method)
    return lsh_band_pairs(sig, n_perm, band_rows, method, max_band_bucket)


def lsh_band_pairs(
    sig: DataFrame, n_perm: int = N_PERM,
    band_rows: int = BAND_ROWS, method: str = "xxhash64",
    max_band_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Band-explode + capped bucket self-join over a PRECOMPUTED signature
    DataFrame (``minhash_signatures`` output: doc_id, mh0..mh{n_perm-1}).

    Split out of :func:`minhash_lsh_pairs_df` (round 6) so callers that need
    per-stage cost attribution — bench.py's dedup-pipeline entry times
    signature computation, band-pair generation, and CC contraction as
    separate materializations — can checkpoint the signature stage between
    the two. Semantics are unchanged: composing this with
    ``minhash_signatures`` is exactly ``minhash_lsh_pairs_df``."""
    n_bands = n_perm // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _hash64(
                    [F.col(f"mh{b * band_rows + r}") for r in range(band_rows)],
                    b,
                    method,
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    # Round 9 restructure (guide §2.4/§3.3): the former cap filter was an
    # aggregate + RE-JOIN on (band, sig) followed by a bucket SELF-join —
    # four evaluations of the whole signature subtree in one plan (the
    # sf0.1 physical plan showed 4 parquet scans, 8 exchanges and 3
    # joins; plans/r09/minhash_lsh_pairs_before.txt). Instead: ONE pass —
    # a window count on the same (band, sig) partitioning replaces the
    # count-join (WindowExec spills gracefully on a degenerate bucket),
    # then each surviving bucket collects its doc ids (bounded by the cap
    # — the array only materializes AFTER the filter) and emits each
    # unordered pair exactly once via an index-offset transform. Same
    # pairs, same n_shared_bands (= co-occurring buckets), one subtree:
    # 1 scan, 4 exchanges, joins eliminated (…_after.txt).
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "sig")
    kept = (
        buckets.withColumn("_bn", F.count("*").over(w))
        .filter(
            (F.col("_bn") <= max_band_bucket) & (F.col("_bn") >= 2)
        )
        .drop("_bn")
    )
    grouped = kept.groupBy("band", "sig").agg(
        F.collect_list("doc_id").alias("ids")
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> "
                "struct(least(x, y) as doc_a, greatest(x, y) as doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


def simhash64(
    spark: SparkSession, sf_dir: str, method: str = "xxhash64", n_bits: int = 64
) -> DataFrame:
    """n_bits-bit SimHash per document: token hash bit-votes, one pass.

    Conditional-sum aggregates (all map-side combinable) then bit
    reassembly — stays in whole-stage codegen, no explode-per-bit. The
    ``md5`` method (with n_bits <= 32, inside the md5-derived 60-bit value)
    is the DuckDB-expressible checked variant."""
    if method == "md5" and n_bits > 60:
        raise ValueError(
            "md5-derived hashes carry 60 bits; bits above that would vote "
            "constant -1 and silently zero the simhash head — use n_bits<=60"
        )
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).withColumn("h", _hash64([F.col("tok")], 0, method))
    # per-bit ONE counts instead of ±1 votes: the ±1 sum equals
    # 2*ones - n, so vote>0 ⇔ 2*ones > n — same simhash, but each
    # aggregate is a bare bitop sum (no CASE branch).
    #
    # Round 9: TWO bit-counts ride in ONE sum aggregate via 32-bit lanes —
    # bit b accumulates in the low lane, bit b+half in the high lane
    # (sum(lo_bit + hi_bit<<32)). Profiled at sf0.1: the per-aggregate
    # input projection dominates this stage (64 one-expression aggregates
    # 2.26 s vs 32 packed 0.83 s vs 64 aggregates of ONE shared expression
    # 0.63 s — the distinct shift expressions are the cost, the buffer
    # updates are not), so halving the aggregate count halves the hot
    # term. Lanes cannot collide under ANSI: a doc's text is one Spark
    # string (< 2^31 bytes), so per-doc token counts are < 2^30 and the
    # packed sum stays below 2^30·(2^32+1) < 2^63. Unpacking uses
    # shiftrightunsigned / bitwiseAND, so the per-bit ones counts — and
    # therefore every simhash bit — are identical to the unpacked form
    # (tests/test_dedup.py parity test).
    half = (n_bits + 1) // 2
    packed = []
    for b in range(half):
        lo = F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1)
        hi_bit = b + half
        if hi_bit < n_bits:
            hi = F.shiftrightunsigned(F.col("h"), hi_bit).bitwiseAND(1)
            expr = lo + F.shiftleft(hi, 32)
        else:  # odd n_bits: the last lane carries only its low bit
            expr = lo
        packed.append(F.sum(expr).alias(f"p{b}"))
    agg = tok.groupBy("doc_id").agg(*packed, F.count("*").alias("_n"))
    _LANE_MASK = F.lit((1 << 32) - 1)

    def _ones(b: int):
        if b < half:
            return F.col(f"p{b}").bitwiseAND(_LANE_MASK)
        return F.shiftrightunsigned(F.col(f"p{b - half}"), 32)

    sim = None
    for b in range(n_bits):
        bit = F.when(2 * _ones(b) > F.col("_n"), F.lit(1).cast("long")).otherwise(0)
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return agg.select("doc_id", sim.alias("simhash")).orderBy("doc_id")


def minhash_lsh_pairs_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked twin of minhash_lsh_pairs: identical banding pipeline,
    md5-derived hashes DuckDB can reproduce value-for-value."""
    return minhash_lsh_pairs(spark, sf_dir, method="md5")


def simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked twin of simhash64: same vote/reassembly pipeline over
    32 bits of the md5-derived hash."""
    return simhash64(spark, sf_dir, method="md5", n_bits=32)


def duplicate_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate pairs — the step that
    turns pairwise evidence into dedup DECISIONS: each document's
    ``cluster_rep`` is the smallest doc_id reachable through the pair
    graph (keep the rep, drop the rest), plus the cluster's size.

    Algorithm: iterative min-label propagation. Each round is ONE join of
    the (undirected) edge list against current labels + a map-side
    combinable min aggregate; labels converge after ``diameter`` rounds,
    and LSH candidate clusters are star-like (diameter ~2-4), so 3-5
    rounds in practice. ``localCheckpoint`` after each round truncates the
    growing plan (iterative self-joins otherwise stack lineage); the loop
    stops at the first round with zero label changes and raises if
    ``max_iter`` rounds were not enough (a silently unconverged labeling
    would split clusters). At adversarial diameters (long chains) switch
    to large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014) — same join primitive, O(log n)
    rounds. Only documents that appear in some pair are returned
    (singletons need no dedup decision)."""
    # materialize the pairs projection ONCE: `pairs` is usually a lazy
    # minhash/band-join plan, and the symmetrizing union below would
    # otherwise evaluate that whole upstream twice inside one job (union
    # branches share no exchange) — measured 7x on the bench's 205k-doc
    # pipeline before the round-6 fix
    e = pairs.select(
        F.col(src).alias("x"), F.col(dst).alias("y")
    ).localCheckpoint()
    edges = (
        e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select("x").distinct().withColumn("rep", F.col("x"))
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("x").alias("y"), F.col("rep").alias("nrep")
                ),
                "y",
            )
            .groupBy("x")
            .agg(F.min("nrep").alias("nmin"))
        )
        new = labels.join(nbr, "x", "left").select(
            "x",
            F.least(F.col("rep"), F.coalesce("nmin", F.col("rep"))).alias("rep"),
        ).localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "x")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds — "
            "the pair graph has a longer diameter than expected; raise "
            "max_iter or use a large-star/small-star implementation"
        )
    sizes = labels.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "rep")
        .select(
            F.col("x").alias("doc_id"),
            F.col("rep").alias("cluster_rep"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, no self-loops."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris et al. large-star: every node u links each LARGER neighbor to
    min(Γ(u) ∪ {u}) — long tails collapse toward small labels.

    Round 9 (guide §2.4): the per-node minimum rides a WINDOW over the
    same hashpartitioning(u) instead of a groupBy + self-JOIN back — the
    aggregate and its consumer share one exchange, removing a join and an
    exchange per star op. Exact same edge algebra (window parity pinned
    by test_star_ops_window_form_matches_join_form); measured 6.6 s ->
    4.3 s for the full contraction at 451k candidate edges (interleaved
    minima, alternation count unchanged)."""
    from pyspark.sql import Window as W

    sym = _sym(e)
    m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
    return _canon_edges(
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris et al. small-star: every node u rewires its SMALLER
    neighbors (and itself) to their minimum — stars flatten to the true
    component minimum. Same one-exchange window form as
    :func:`_large_star` (round 9)."""
    from pyspark.sql import Window as W

    le = _sym(e).filter(F.col("v") < F.col("u"))
    le = le.withColumn("m", F.min("v").over(W.partitionBy("u")))
    children = le.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfs = le.select("u", F.col("m").alias("v")).distinct()
    return _canon_edges(children.union(selfs))


def duplicate_clusters_star(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 25, stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    2014) — the adversarial-diameter escape ``duplicate_clusters``' min-label
    propagation documents: propagation needs O(diameter) rounds (a 200-node
    chain = 200 rounds), star contraction needs O(log n) ALTERNATIONS
    regardless of diameter, with the same join+min primitive per round.
    Same output contract as ``duplicate_clusters``: (doc_id, cluster_rep =
    component minimum, cluster_size) for every document in some pair.
    ``stats``, when passed, receives {"alternations", "n_edges"} — bench.py
    uses it to report the measured O(log n) round count."""
    # materialize the pairs projection ONCE at entry: the canon-edge
    # checkpoint and the node-universe job below would otherwise EACH
    # re-evaluate the caller's lazy upstream (typically the full
    # minhash/band-join pipeline) — 3 evaluations total, measured 7x on
    # the bench's 205k-doc pipeline before the round-6 fix
    raw = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    e = _canon_edges(raw).localCheckpoint()
    if stats is not None:
        stats["n_edges"] = e.count()
    # node universe from the RAW pairs: a self-paired doc is a singleton
    # cluster of itself (canon drops the self-loop, not the node)
    all_nodes = _sym(raw).select("u").distinct().localCheckpoint()
    prev = None
    for it in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev:
            if stats is not None:
                stats["alternations"] = it + 1
            break
        prev = cur
    else:
        raise RuntimeError(
            f"duplicate_clusters_star did not converge in {max_iter} "
            "alternations — not expected for any graph of < 2^25 nodes"
        )
    # fixpoint edges are stars (component_min, child): children label to the
    # center, centers label to themselves, and every original node is one
    # of the two
    labels = (
        e.select(F.col("v").alias("x"), F.col("u").alias("rep"))
        .union(
            all_nodes.join(
                e.select(F.col("v").alias("u")), "u", "left_anti"
            ).select(F.col("u").alias("x"), F.col("u").alias("rep"))
        )
    )
    sizes = labels.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "rep")
        .select(
            F.col("x").alias("doc_id"),
            F.col("rep").alias("cluster_rep"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


def dedup_clusters_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: connected components over the oracle-checked MinHash
    candidate pairs — the full near-dup resolution pipeline (pairs ->
    clusters -> representative), value-verified against a DuckDB recursive
    CTE over the same md5 banding SQL."""
    return duplicate_clusters(minhash_lsh_pairs_checked(spark, sf_dir))


def dedup_clusters_star_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the star-contraction algorithm over the SAME checked
    pairs — both component algorithms are held to the same DuckDB
    transitive-closure oracle."""
    return duplicate_clusters_star(minhash_lsh_pairs_checked(spark, sf_dir))


MAX_SHINGLE_DF = 50  # shingles in more docs than this are stopword phrases
CONTAINMENT_THRESHOLD = 0.5


def _blocked_shingle_inter(
    docs: DataFrame, max_shingle_df: int
) -> tuple[DataFrame, DataFrame]:
    """The blocked shingle-overlap machinery shared by
    :func:`ngram_jaccard_pairs` and :func:`containment_pairs` (their
    oracles already share one CTE generator — the Spark side must too, so
    a cap/blocking change can never desync them): distinct per-doc hashed
    shingles joined with the (lang, source) block, stopword-phrase DF cap,
    then (inter, sizes) — pairwise intersection counts over ``doc_a <
    doc_b`` within a block, and per-doc shingle-set sizes."""
    sh = _shingle_hashes(docs).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    sh = sh.dropDuplicates(["doc_id", "sh"])
    # Round 9 restructure, the lsh_band_pairs pattern (guide §2.4): the
    # former rare-filter aggregate + RE-JOIN followed by a shingle
    # self-join evaluated the whole hashed-shingle subtree four times.
    # One pass instead: a window count on sh applies the
    # document-frequency cap (same distinct-per-doc counting — the
    # dropDuplicates above runs first either way), each surviving
    # (sh, lang, source) bucket collects its cap-bounded doc ids
    # (hashpartitioning(sh) already clusters the superset key — no new
    # exchange), pairs explode once per co-occurring shingle, and sizes
    # come from the SAME grouped table (explode + per-doc count) instead
    # of a second subtree evaluation. Intersections and set sizes are
    # identical by construction; both oracle-gated consumers stay green.
    from pyspark.sql import Window as W

    kept = (
        sh.withColumn("_df", F.count("*").over(W.partitionBy("sh")))
        .filter(F.col("_df") <= max_shingle_df)
        .drop("_df")
    )
    grouped = kept.groupBy("sh", "lang", "source").agg(
        F.collect_list("doc_id").alias("ids")
    ).localCheckpoint()  # 2 consumers: pair explode + sizes explode
    sizes = (
        grouped.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    inter = (
        grouped.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), y -> "
                    "struct(least(x, y) as doc_a, greatest(x, y) as doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return inter, sizes


def containment_pairs(
    spark: SparkSession, sf_dir: str,
    threshold: float = CONTAINMENT_THRESHOLD,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Shingle CONTAINMENT near-dup pairs, blocked by (lang, source):
    ``containment(A in B) = |sh(A) ∩ sh(B)| / |sh(A)|`` — the asymmetric
    measure Jaccard misses: a short document quoted inside a long one has
    near-zero Jaccard (the union is huge) but containment ≈ 1, and
    training pipelines drop exactly those embedded copies (Broder's
    containment, the resemblance paper's second measure). One row per
    unordered pair with BOTH directions; kept when either side crosses
    ``threshold``.

    Same plan shape and ``max_shingle_df`` stopword-phrase cap as
    ngram_jaccard_pairs (shingle-equality self-join is quadratic in a hot
    shingle's document frequency — capped identically), so the 100 TB
    scaling argument carries over unchanged (the machinery IS shared:
    :func:`_blocked_shingle_inter`, hashed shingles — no string
    construction, 8-byte keys; counts equal the string semantics up to
    negligible collisions, so the string-based oracle still gates the
    values)."""
    docs = _docs(spark, sf_dir)
    inter, sizes = _blocked_shingle_inter(docs, max_shingle_df)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment_a", F.round(F.col("n_inter") / F.col("na"), 4))
        .withColumn("containment_b", F.round(F.col("n_inter") / F.col("nb"), 4))
        .filter(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
        .select("doc_a", "doc_b", "containment_a", "containment_b")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.1,
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """n-gram Jaccard over candidate pairs blocked by (lang, source).

    Blocking bounds the pair count; the shingle sets stay distributed
    (explode + join + count) — no collect, no per-row Python.

    ``max_shingle_df`` caps the scale-killer: a shingle occurring in N docs
    contributes N^2 rows to the equality self-join, so stopword phrases make
    the hot-shingle head quadratic at 100 TB. Shingles with document
    frequency above the cap are dropped from the shingle universe BEFORE
    sizes and intersections (a consistent approximation: Jaccard over the
    sub-stopword shingle sets; exact whenever no shingle exceeds the cap).

    Round 7: shingles join as 64-bit HASHES via the shared
    :func:`_blocked_shingle_inter` machinery (no string construction,
    8-byte join/shuffle keys); set sizes and intersections equal the
    string semantics up to negligible collisions, so the string-based
    oracle still gates the values."""
    docs = _docs(spark, sf_dir)
    inter, sizes = _blocked_shingle_inter(docs, max_shingle_df)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
