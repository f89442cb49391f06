"""Relational query suite over the driver's TPC-H-ish testdata tables.

Two families, each entry paired with an ANSI-SQL oracle (DuckDB) in
``__spark_entry__.py``:

1. The reference pipeline's aggregation/join/window operators
   re-expressed relationally (SURVEY.md §2 cross-checks): zero-DM sum
   (A1), SK grouped estimator (A6), tumbling decimation (A8),
   mask-interval join (J1), union-distinct (J2), lower-middle median
   (A3), trimmed mid-fraction stats (A4), plus classic scan-agg and
   broadcast-join engine sanity queries.

2. Training-data-pipeline operators over ``documents``/``embeddings``:
   exact dedup, MinHash-LSH candidate pairs, n-gram Jaccard near-dup,
   brute-force cosine top-k, sign-LSH embedding bucketing, text quality
   scoring, token counting, document fingerprinting.

Determinism rules (so the Spark result value-hashes equal the DuckDB
oracle): money-like sums go through DECIMAL(18,2) (exact in both
engines) and are cast to double at the end; float expressions are
written with identical operation order; every float output column is
``round(x, 6)``; ties in top-k/window ordering are broken by a key
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col):
    return F.col(col).cast("decimal(18,2)")


# --------------------------------------------------------------------------
# Engine sanity: scan-aggregate and broadcast-join chains
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style scan-agg on lineitem; exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")) \
        .cast("decimal(18,2)")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(_dec("l_extendedprice")).cast("double")
                  .alias("sum_base_price"),
                 F.sum(disc_price).cast("double").alias("sum_disc_price"),
                 F.count(F.lit(1)).alias("count_order")))


def q_revenue_by_nation(spark, sf_dir):
    """orders |x| customer |x| nation |x| region with the dims broadcast
    (the engine's only join shapes are broadcast joins, SURVEY.md §2.3)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (o.join(c, o.o_custkey == c.c_custkey)
             .join(n, c.c_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .where(F.col("r_name").isin("ASIA", "EUROPE"))
             .groupBy("n_name")
             .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
                  F.count(F.lit(1)).alias("n_orders")))


# --------------------------------------------------------------------------
# Pipeline operators, relationally (events as the dynamic spectrum:
# user_id ~ channel, event_id bucket ~ time interval, value ~ power)
# --------------------------------------------------------------------------

def _bucket(col, width):
    return F.floor(F.col(col) / width).cast("bigint")


def q_zero_dm_sum(spark, sf_dir):
    """A1 zero-DM series: sum over 'channels' per time bucket
    (mask.c:582-588 relationally)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(_bucket("event_id", 100).alias("t_bucket"))
            .agg(F.sum(_dec("value")).cast("double").alias("zero_dm"),
                 F.count(F.lit(1)).alias("n")))


def q_sk_estimator(spark, sf_dir):
    """A6 spectral-kurtosis grouped aggregate (skz.c:460-480):
    per (channel=user_id, interval), sk = (m*nd+1)/(m-1)*(m*s2/s1^2-1);
    partial+final aggregation is automatic in Spark."""
    e = _t(spark, sf_dir, "events")
    nd = 12.0
    g = (e.groupBy(F.col("user_id").alias("chan"),
                   _bucket("event_id", 100).alias("t_bucket"))
         .agg(F.sum(_dec("value")).cast("double").alias("s1"),
              F.sum((_dec("value") * _dec("value"))).cast("double")
               .alias("s2"),
              F.count(F.lit(1)).alias("m")))
    m = F.col("m").cast("double")
    sk = (m * nd + 1.0) / (m - 1.0) * (m * F.col("s2")
                                       / (F.col("s1") * F.col("s1")) - 1.0)
    # `+ 0.0` normalizes ROUND's -0.0 to +0.0 — DuckDB's C round keeps
    # the sign of a tiny negative, Spark's HALF_UP does not (the
    # zero-sign class the sf0.1 bit sweep caught on windowed_stats'
    # identical formula); the oracle applies the same normalization.
    return (g.where((F.col("m") > 1) & (F.col("s1") != 0.0))
            .select("chan", "t_bucket", "m",
                    (F.round(sk, 6) + F.lit(0.0)).alias("sk"),
                    ((sk < 0.8) | (sk > 1.2)).cast("int").alias("masked")))


def q_tumbling_decimate(spark, sf_dir):
    """A8 time decimation: tumbling-window mean (skz.c:420-438)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(_bucket("event_id", 8).alias("t_bucket"))
            .agg(F.round(F.sum(_dec("value")).cast("double")
                         / F.count(F.lit(1)), 6).alias("dec_mean"),
                 F.count(F.lit(1)).alias("m")))


def q_interval_mask_join(spark, sf_dir):
    """J1 block x mask-interval join (mask.c:418-513): intervals whose
    error count >= 3 are 'zap_ints'; count events falling in them via a
    broadcast semi-join."""
    e = _t(spark, sf_dir, "events")
    eb = e.withColumn("t_bucket", _bucket("event_id", 100))
    zap = (eb.where(F.col("event_type") == "error")
           .groupBy("t_bucket").agg(F.count(F.lit(1)).alias("n_err"))
           .where(F.col("n_err") >= 3).select("t_bucket"))
    return (eb.join(F.broadcast(zap), "t_bucket")
            .groupBy("t_bucket").agg(F.count(F.lit(1)).alias("n_masked")))


def q_union_distinct_channels(spark, sf_dir):
    """J2 sorted union-distinct of channel lists (mask.c:528-553)."""
    e = _t(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "error").select("user_id")
    b = e.where(F.col("event_type") == "click").select("user_id")
    return a.union(b).distinct()


def q_robust_stats(spark, sf_dir):
    """A3 + A4 robust statistics in one relation (r5 gate
    consolidation of the former ``median_lower`` and ``trimmed_stats``
    entries — both derive from the SAME ranked ordering, which Spark's
    exchange reuse shuffles once):

    * lower-middle median = element at 0-based index (n-1)//2 of the
      ascending order (mask.c:22-79) — NOT the two-element average;
    * mid-fraction trimmed mean (mask.c:300-325): keep the middle
      len = floor(n*0.8 + 0.5) elements from start = (n-len)/2."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (e.select("event_type", "value", "event_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("event_type"))))
    med = (ranked
           .where(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1)
           .select("event_type", F.col("value").alias("median_value"),
                   "n"))
    ln = F.floor(F.col("n") * 0.8 + 0.5)
    start = F.floor((F.col("n") - ln) / 2)
    trm = (ranked.where((F.col("rn") > start) & (F.col("rn") <= start + ln))
           .groupBy("event_type")
           .agg(F.round(F.sum(_dec("value")).cast("double")
                        / F.count(F.lit(1)), 6).alias("trimmed_avg"),
                F.count(F.lit(1)).alias("n_kept")))
    return med.join(trm, "event_type")


# --------------------------------------------------------------------------
# Training-data operators: documents
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on md5(text), survivor = min(doc_id)."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy(F.md5("text").alias("fingerprint"))
            .agg(F.min("doc_id").alias("survivor_doc_id"),
                 F.count(F.lit(1)).alias("n_docs")))


def _shingles(col="text"):
    """Word 3-gram shingles: shingle i (1-based) = words i..i+2 joined
    by ' '.  Guarded for docs with < 3 words (Spark's sequence()
    descends when start > stop)."""
    arr = F.split(F.col(col), " ")
    n = F.size(arr)
    return F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.slice(arr, i, 3)))
    ).otherwise(F.array().cast("array<string>"))


_N_MINHASH = 8
_N_BANDS = 4     # bands of 2 hashes each


def _minhash_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # No distinct: min over the shingle multiset == min over the set,
    # so the dedup shuffle is pure overhead here (the oracle keeps its
    # DISTINCT — results are identical).
    sh = d.select("doc_id", F.explode(_shingles()).alias("s"))
    aggs = [F.min(F.md5(F.concat(F.col("s"), F.lit(f":{k}"))))
            .alias(f"h{k}") for k in range(_N_MINHASH)]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_rows(mh: DataFrame) -> DataFrame:
    """(doc_id, band index, bucket value) rows from a minhash frame —
    one ``posexplode`` of the band array (not a band-count-way union),
    so every consumer joins against the SAME aggregation subplan and
    Spark's exchange reuse computes the shingle->minhash pass once."""
    band_arr = F.array(*[
        F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}"))
        for b in range(_N_BANDS)])
    return mh.select("doc_id", F.posexplode(band_arr).alias("b", "v"))


def _lsh_candidate_pairs(mh: DataFrame) -> DataFrame:
    """Banded bucket self-join over a minhash DataFrame -> distinct
    candidate pairs (doc_a < doc_b).

    Both sides of the self-join share the SAME minhash aggregation
    subplan (``_band_rows``), whose shuffle Spark's exchange reuse
    computes once — no persist needed."""
    bands = _band_rows(mh)
    a = bands.alias("a")
    c = bands.alias("c")
    return (a.join(c, (F.col("a.b") == F.col("c.b"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"))
            .distinct())


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH near-dup candidates: shingle -> 8 minhashes ->
    4 bands of 2 -> bucket self-join -> distinct candidate pairs."""
    return _lsh_candidate_pairs(_minhash_df(spark, sf_dir))


def q_dedup_jaccard(spark, sf_dir):
    """Exact 3-shingle Jaccard >= 0.5 over the LSH candidate pairs:
    shingle SETS kept as per-doc arrays (``array_distinct``, a per-row
    JVM op — no explode/distinct shuffle) and intersected JVM-side
    (``array_intersect``) after joining each candidate pair to its two
    docs' sets.

    Scale shape: the only shuffles are the minhash aggregation (its
    exchange reused across both sides of the bucket self-join) and the
    candidate-pair distinct; the two cand->sets joins broadcast the
    (small) candidate side under AQE.  Nothing is persisted — nothing
    leaks into the session cache (r2 verdict) — and each task holds at
    most two documents' shingle arrays."""
    d = _t(spark, sf_dir, "documents")
    sets = d.select("doc_id", F.array_distinct(_shingles()).alias("ss"))
    cand = _lsh_candidate_pairs(_minhash_df(spark, sf_dir))
    pairs = (cand
             .join(sets.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
             .join(sets.alias("sb"), F.col("doc_b") == F.col("sb.doc_id")))
    n_common = F.size(F.array_intersect(F.col("sa.ss"), F.col("sb.ss")))
    sz_union = (F.size(F.col("sa.ss")) + F.size(F.col("sb.ss")) - n_common)
    j = pairs.select("doc_a", "doc_b", (n_common / sz_union).alias("jac"))
    return (j.where(F.col("jac") >= 0.5)
            .select("doc_a", "doc_b", F.round("jac", 6).alias("jaccard")))


def q_text_quality(spark, sf_dir):
    """Quality scoring + language ID in one pass (r5 gate
    consolidation — the former ``lang_id`` entry merged in): token
    counts, distinct ratio, stopword ratio, mean token length, the
    per-language marker scores and the predicted language — all
    JVM-side array functions over ONE materialized token array, no
    UDF, zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    # Materialize the token array once per row; referencing the raw
    # split expression at each use would re-tokenize per reference.
    w = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("w"))
    arr = F.col("w")
    n = F.size(arr)
    stop = F.size(F.filter(arr, lambda t: t.isin("the", "a")))
    char_sum = F.aggregate(arr, F.lit(0),
                           lambda acc, t: acc + F.length(t))

    sel = w.select(
        "doc_id", "lang",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(arr)).cast("bigint")
         .alias("n_distinct_tokens"),
        F.round(stop.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(char_sum.cast("double") / n, 6).alias("mean_token_len"),
        *[_marker_count(arr, lg).alias(f"score_{lg}")
          for lg in _LANG_ORDER])
    return sel.withColumn("predicted_lang", _lang_pred_expr())


def q_token_counts(spark, sf_dir):
    """Token counting per language under BOTH tokenizers in one
    relation: whitespace split and the BPE-ish regex ([a-z]+|[0-9]+
    runs) — total and corpus-distinct counts each.  (r5 gate
    consolidation: the former ``token_counts_regex`` entry merged in,
    so both tokenizations stay driver-checked under one row.)

    Scale shape: two per-lang partial aggregations joined on the tiny
    lang key (5 rows) — the join is a broadcast of an aggregate, never
    a shuffle of the token stream."""
    d = _t(spark, sf_dir, "documents")
    ws = (d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("lang")
          .agg(F.count(F.lit(1)).alias("total_tokens"),
               F.countDistinct("tok").alias("distinct_tokens")))
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)
    rx = (d.select("lang", F.explode(toks).alias("tok"))
          .groupBy("lang")
          .agg(F.count(F.lit(1)).alias("regex_tokens"),
               F.countDistinct("tok").alias("regex_distinct_tokens")))
    return ws.join(rx, "lang")


_FP_MOD = 1_000_000_007


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprints, both variants per row (r5 gate
    consolidation — the former ``rolling_fingerprint`` entry merged
    in): the order-INSENSITIVE bag key (md5 of the sorted distinct
    token set) and the order-SENSITIVE position-weighted polynomial
    hash sum(val(tok_i) * (1 + (i*31) % 97)) mod 1e9+7 with val = the
    first 8 md5 hex digits as int (Karp-Rabin-style).  One narrow
    scan-project, zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    # Materialize the token array once per row (re-referencing the
    # split expression would re-tokenize per use).
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    bag = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("w"))))
    terms = F.transform(F.col("w"), lambda t, i:
                        F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                         .cast("bigint") * (F.lit(1) + (i * 31) % 97))
    # Mod folded into EVERY fold step, not applied once at the end:
    # each term is < 2^32 * 97, so an un-modded BIGINT accumulator
    # overflows past ~2.2e7 tokens (ANSI mode: ARITHMETIC_OVERFLOW;
    # non-ANSI: silent wrap diverging from DuckDB's exact HUGEINT).
    # (a + x) % M per step is arithmetically identical to the
    # mod-at-end sum and keeps the accumulator < M + max_term.
    rolling = F.aggregate(terms, F.lit(0).cast("bigint"),
                          lambda acc, x: (acc + x) % _FP_MOD)
    return w.select("doc_id", bag.alias("bag_fingerprint"),
                    rolling.alias("rolling_fp"))


# --------------------------------------------------------------------------
# Training-data operators: embeddings
# --------------------------------------------------------------------------

def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 query vector — the
    exact ANN baseline.  cos = dot/(sqrt(ss_a)*sqrt(ss_b)), sequential
    double accumulation (matches DuckDB list_cosine_similarity)."""
    e = _t(spark, sf_dir, "embeddings")
    q = F.broadcast(e.where(F.col("vec_id") == 0)
                    .select(F.col("embedding").cast("array<double>")
                            .alias("qe")))
    a = F.col("embedding").cast("array<double>")   # parquet stores float32
    b = F.col("qe")
    cos = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return (e.where(F.col("vec_id") != 0).crossJoin(q)
            .select("vec_id", F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(10))


def q_embedding_sign_lsh(spark, sf_dir):
    """Sign-LSH bucketing (the IVF-style scale path for ANN): 8
    deterministic rational hyperplanes h_i[j] = ((i*64+j)*37 % 101)/101
    - 0.5; bucket = sum_i 2^i * [dot(e, h_i) > 0] (shared with
    q_ann_ivf_topk via _lsh_bucket)."""
    e = _t(spark, sf_dir, "embeddings")
    return (e.select(_lsh_bucket(8).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs")))


# --------------------------------------------------------------------------
# More reference cross-checks: A2/A5 statistics, S11 dimension lookup
# --------------------------------------------------------------------------

def q_channel_stats(spark, sf_dir):
    """A2 updating mean/sample-variance (mask.c:81-112) per channel
    PLUS the A5 per-channel padding value (mask.c:328-381, the mid-80%
    trimmed mean) in one relation — r5 gate consolidation of the
    former ``padvals_trimmed`` entry; determine_padvals calls
    calc_avgmedstd per channel, so the merged row mirrors the
    reference's own per-channel record.  Variance from exact decimal
    sums so Spark and the oracle share the float expression:
    var = (s2 - s1*s1/n)/(n-1).

    Scale shape: both sides are per-channel aggregates (150 rows) —
    their join is over pre-aggregated relations, never the event
    stream."""
    e = _t(spark, sf_dir, "events")
    g = (e.groupBy(F.col("user_id").alias("chan"))
         .agg(F.sum(_dec("value")).cast("double").alias("s1"),
              F.sum(_dec("value") * _dec("value")).cast("double").alias("s2"),
              F.count(F.lit(1)).alias("n")))
    n = F.col("n").cast("double")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1.0)
    # `+ 0.0`: zero-sign normalization (see q_sk_estimator) — var's
    # cancellation (s2 - s1^2/n) and a tiny mean at large n can both
    # land in (-5e-7, 0), where ROUND's -0.0 convention differs
    # between the engines.
    stats = g.select("chan", "n",
                     (F.round(F.col("s1") / n, 6) + F.lit(0.0))
                     .alias("mean_value"),
                     (F.round(var, 6) + F.lit(0.0)).alias("var_samp_value"))
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    ranked = (e.select("user_id", "value", "event_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("nn", F.count(F.lit(1)).over(
                  Window.partitionBy("user_id"))))
    ln = F.floor(F.col("nn") * 0.8 + 0.5)
    start = F.floor((F.col("nn") - ln) / 2)
    pads = (ranked.where((F.col("rn") > start) & (F.col("rn") <= start + ln))
            .groupBy(F.col("user_id").alias("chan"))
            .agg((F.round(F.sum(_dec("value")).cast("double")
                          / F.count(F.lit(1)), 6) + F.lit(0.0))
                 .alias("padval"),
                 F.count(F.lit(1)).alias("n_kept")))
    return stats.join(pads, "chan")


TELESCOPES = [(0, "Fake"), (1, "Arecibo"), (2, "Ooty"), (3, "Nancay"),
              (4, "Parkes"), (5, "Jodrell"), (6, "GBT"), (7, "GMRT"),
              (8, "Effelsberg"), (9, "ATA"), (10, "UTR-2"), (11, "LOFAR"),
              (12, "FR606"), (13, "DE601"), (14, "UK608")]


def q_telescope_lookup(spark, sf_dir):
    """S11 id->name dimension lookup (inf.cxx:4-60) as a broadcast join
    against a literal dim table; channel id hashed into telescope ids."""
    e = _t(spark, sf_dir, "events")
    dim = F.broadcast(spark.createDataFrame(
        TELESCOPES, "telescope_id int, telescope string"))
    keyed = e.select((F.col("user_id") % 15).cast("int")
                     .alias("telescope_id"))
    return (keyed.join(dim, "telescope_id")
            .groupBy("telescope_id", "telescope")
            .agg(F.count(F.lit(1)).alias("n_events")))


# --------------------------------------------------------------------------
# Training-data operators: SimHash, language ID, regex tokens, rolling hash
# --------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _hexbit(h, i: int):
    """Parity of hex digit i (0-based) of md5 string column h -> +-1.
    position() is 1-based in both Spark and DuckDB."""
    digit = F.expr(
        f"position(substring({h}, {i + 1}, 1), '{_HEX}') - 1")
    return F.when(digit % 2 == 1, F.lit(1)).otherwise(F.lit(-1))


def q_dedup_simhash(spark, sf_dir):
    """SimHash dedup signature: 16-bit fingerprint; bit i = sign of the
    sum over distinct tokens of the parity of md5 hex digit i (Charikar
    2002 with per-bit +-1 votes)."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(
                F.array_distinct(F.split("text", " "))).alias("tok"))
            .withColumn("h", F.md5("tok")))
    per = toks.groupBy("doc_id").agg(
        *[F.sum(_hexbit("h", i)).alias(f"s{i}") for i in range(16)])
    fp = F.lit(0)
    for i in range(16):
        fp = fp + F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return per.select("doc_id", fp.cast("bigint").alias("simhash"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS (completes the simhash dedup path): a
    32-bit signature (the 16-bit per-doc operator saturates on this
    corpus — 220 distinct values over 500 docs — so the pairs operator
    doubles the width) banded into 4x8-bit keys; docs colliding in any
    band are candidates (bucketed self-join — at scale each task
    touches one band-bucket, never all pairs); candidates verify with
    the exact Hamming distance (bit_count of XOR) <= 1."""
    d = _t(spark, sf_dir, "documents")
    toks = (d.select("doc_id", F.explode(
                F.array_distinct(F.split("text", " "))).alias("tok"))
            .withColumn("h", F.md5("tok")))
    per = toks.groupBy("doc_id").agg(
        *[F.sum(_hexbit("h", i)).alias(f"s{i}") for i in range(32)])
    fp = F.lit(0).cast("bigint")
    for i in range(32):
        fp = fp + F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    sig = per.select("doc_id", fp.cast("bigint").alias("sig"))
    bands = sig.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.shiftright("sig", 8 * b).bitwiseAND(F.lit(255))
            for b in range(4)])).alias("band", "v"))
    a, c = bands.alias("a"), bands.alias("c")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("c.sig")))
    return (a.join(c, (F.col("a.band") == F.col("c.band"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .where(ham <= 1)
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"),
                    ham.cast("bigint").alias("hamming"))
            .distinct())


def q_dedup_simhash_full(spark, sf_dir):
    """SimHash dedup, BOTH grains under one gate entry (r5 slot
    consolidation, same pattern as robust_stats/ann_ivf_topk): the
    per-doc 16-bit signature operator (kind='sig') and the
    Hamming-verified near-dup pairs from the banded 32-bit signature
    (kind='pair'), computed from ONE tokenize+md5+parity aggregation —
    the expensive explode+groupBy scan the two standalone operators
    used to run twice now runs once and feeds both grains.  doc_b is
    the sentinel -1 on sig rows (not NULL: a nullable bigint reaches
    pandas as float64/NaN on both engines and the gate's value hash
    would then compare NaN encodings, not integers).  value = the
    16-bit signature on sig rows, the Hamming distance on pair rows.

    Scale shape: one explode+groupBy exchange produces the 32 parity
    sums; the 16-bit signature is the LOW 16 BITS of the 32-bit one
    (bit i of both is [s_i > 0], so sig16 = sig32 & 0xFFFF — computing
    it as a projection of the same aggregate keeps all three plan
    branches the IDENTICAL subtree, which Spark's exchange reuse then
    computes once: the union's second branch and the self-join's build
    side are ReusedExchange nodes, test-pinned); the pairs side is the
    banded bucket self-join (each task touches one band-bucket, never
    all pairs) with exact bit_count(xor) verification — and tests pin
    sig rows == q_dedup_simhash and pair rows ==
    q_dedup_simhash_pairs exactly."""
    d = _t(spark, sf_dir, "documents")
    # Explicit isnotnull(doc_id) on the SHARED base: the self-join
    # pushes this filter into its two branches anyway (doc_id is the
    # join key), and without it on the union's sig branch the three
    # subtrees canonicalize differently and exchange reuse cannot
    # fire — the aggregate would run twice.  doc_id is never null, so
    # this is a no-op filter that exists purely to keep the branches
    # identical.
    d = d.where(F.col("doc_id").isNotNull())
    toks = (d.select("doc_id", F.explode(
                F.array_distinct(F.split("text", " "))).alias("tok"))
            .withColumn("h", F.md5("tok")))
    per = toks.groupBy("doc_id").agg(
        *[F.sum(_hexbit("h", i)).alias(f"s{i}") for i in range(32)])
    fp32 = F.lit(0).cast("bigint")
    for i in range(32):
        fp32 = fp32 + F.when(F.col(f"s{i}") > 0,
                             F.lit(2 ** i)).otherwise(F.lit(0))
    sig = per.select("doc_id", fp32.cast("bigint").alias("sig32"))
    sig_rows = sig.select(F.lit("sig").alias("kind"),
                          F.col("doc_id").alias("doc_a"),
                          F.lit(-1).cast("bigint").alias("doc_b"),
                          F.col("sig32").bitwiseAND(F.lit(65535))
                           .alias("value"))
    bands = sig.select(
        "doc_id", F.col("sig32").alias("sig"),
        F.posexplode(F.array(*[
            F.shiftright("sig32", 8 * b).bitwiseAND(F.lit(255))
            for b in range(4)])).alias("band", "v"))
    a, c = bands.alias("a"), bands.alias("c")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("c.sig")))
    pair_rows = (a.join(c, (F.col("a.band") == F.col("c.band"))
                        & (F.col("a.v") == F.col("c.v"))
                        & (F.col("a.doc_id") < F.col("c.doc_id")))
                 .where(ham <= 1)
                 .select(F.col("a.doc_id").alias("doc_a"),
                         F.col("c.doc_id").alias("doc_b"),
                         ham.cast("bigint").alias("value"))
                 .distinct()
                 .select(F.lit("pair").alias("kind"),
                         "doc_a", "doc_b", "value"))
    return sig_rows.unionByName(pair_rows)


# Marker-token profiles for the n-gram-heuristic language classifier.
# The corpus vocabulary is shared across langs (synthetic), so these are
# fixed mechanism profiles; correctness = oracle equality, not accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "table", "row"),
    "de": ("hash", "join", "key", "big"),
    "es": ("slow", "agg", "merge", "vector"),
    "fr": ("scan", "query", "batch", "small"),
    "zh": ("customer", "window", "line", "group"),
}
_LANG_ORDER = ("en", "de", "es", "fr", "zh")


def _marker_count(arr, lg: str):
    """Count of tokens in ``lg``'s marker set over a token-array
    column — the ONE language-ID scoring definition shared by the
    gate-checked merged q_text_quality and the standalone q_lang_id,
    so the two cannot drift.  (Single-parameter lambda on purpose: a
    second parameter would make F.filter pass the element *index*.)"""
    return F.size(F.filter(
        arr, lambda t: t.isin(*LANG_MARKERS[lg]))).cast("bigint")


def _lang_pred_expr():
    """predicted = first language (fixed order) whose marker score is
    >= every other language's score, over the ``score_<lg>`` columns."""
    pred = None
    for lg in _LANG_ORDER:
        cond = None
        for other in _LANG_ORDER:
            if other == lg:
                continue
            c = F.col(f"score_{lg}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = (F.when(cond, F.lit(lg)) if pred is None
                else pred.when(cond, F.lit(lg)))
    return pred


def q_lang_id(spark, sf_dir):
    """Language ID by marker-token profile scoring: score(l) = count of
    tokens in l's marker set; predicted = first max in fixed order.
    (Gate-merged into q_text_quality since r5; kept as the standalone
    form for the semantic tests.)"""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")

    scores = {lg: _marker_count(arr, lg) for lg in _LANG_ORDER}
    sel = d.select("doc_id", F.col("lang").alias("actual_lang"),
                   *[scores[lg].alias(f"score_{lg}") for lg in _LANG_ORDER])
    return sel.withColumn("predicted_lang", _lang_pred_expr())


# --------------------------------------------------------------------------
# Training-data operators: embedding near-dup + IVF-style ANN
# --------------------------------------------------------------------------

def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _hyperplane(i: int):
    """Deterministic rational hyperplane i: element j =
    ((j + i*64)*37 % 101)/101 - 0.5 (shared by every sign-LSH query)."""
    def f(j):
        return (((j + F.lit(i * 64)) * 37 % 101).cast("double")
                / 101.0 - 0.5)
    return F.transform(F.sequence(F.lit(0), F.lit(63)), f)


# Banded sign-LSH geometry for embedding near-dup candidates: pair
# (a, b) is a candidate iff all 8 sign bits of SOME band agree.  More
# bands => higher recall; bits/band => bucket selectivity.
_ND_BANDS = 4
_ND_BITS = 8


def _band_bucket(band: int):
    """8-bit sign bucket of band ``band`` (hyperplanes band*8 .. band*8+7)."""
    bucket = F.lit(0).cast("bigint")
    for k in range(_ND_BITS):
        bucket = bucket + F.when(
            _dot(F.col("embedding"), _hyperplane(band * _ND_BITS + k)) > 0.0,
            F.lit(2 ** k)).otherwise(F.lit(0))
    return bucket


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    path): candidates = vectors colliding in any of 4 independent 8-bit
    sign-LSH bands; exact pinned-order cosine >= 0.45 only on candidate
    pairs.  Fully distributed — the self-join is per (band, bucket), so
    at 100 TB each task touches one bucket's vectors, never the corpus.

    Recall is DEFINED by the banding, not hidden by it (the DuckDB
    oracle generates identical candidates, so the driver gate checks
    implementation parity; ``test_embedding_near_dup_recall_pinned``
    separately pins measured recall against an exact all-pairs ground
    truth).  Theory: a band of ``b`` sign bits collides w.p.
    ``(1 - theta/pi)^b``; across ``B`` bands recall at cosine s=0.45
    is ``1-(1-p)^B`` ~ 0.12 for the 4x8 default (measured 3/14 on the
    sf0.01 fixture).  0.45 is a deliberately hard, low-similarity
    setting; production near-dup thresholds (s >= 0.9, where real
    duplicates sit near cos ~ 1 and p/band ~ 0.95) reach recall
    >= 0.95 with the same 4x8 shape — measured and pinned by
    ``test_embedding_near_dup_production_threshold_recall`` — and both
    knobs (bands, bits) trade recall against bucket selectivity."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_near_dup_pairs(e, 0.45)


def embedding_near_dup_pairs(e: DataFrame, threshold: float) -> DataFrame:
    """Banded sign-LSH candidates + exact pinned-order cosine >=
    ``threshold`` over a (vec_id, embedding) DataFrame — the reusable
    core of q_embedding_near_dup (same plan, parameterized input and
    similarity threshold).

    All 4 band buckets are computed in ONE pass over the embeddings
    (an array of buckets ``posexplode``d to (band, bucket) rows, the
    same shape as the text-minhash LSH) instead of a 4-way union of
    scans: at 10^12 vectors that is 1 scan + 1 hyperplane-dot pass
    rather than 4, and both sides of the bucket self-join share the
    SAME subplan, whose exchange Spark computes once."""
    band_arr = F.array(*[_band_bucket(b) for b in range(_ND_BANDS)])
    bands = e.select("vec_id", F.posexplode(band_arr).alias("band", "v"))
    a = bands.alias("a")
    c = bands.alias("c")
    cand = (a.join(c, (F.col("a.band") == F.col("c.band"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.vec_id") < F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("c.vec_id").alias("vec_b"))
            .distinct())
    ea = e.select(F.col("vec_id").alias("vec_a"),
                  F.col("embedding").cast("array<double>").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"),
                  F.col("embedding").cast("array<double>").alias("eb"))
    cos = _cosine(F.col("ea"), F.col("eb"))   # sequential fold = oracle
    return (cand.join(ea, "vec_a").join(eb, "vec_b")
            .where(cos >= threshold)
            .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim")))


def _lsh_bucket(nbits: int):
    """Sign-LSH bucket over the first nbits deterministic hyperplanes
    (same planes as q_embedding_sign_lsh)."""
    bucket = F.lit(0).cast("bigint")
    for i in range(nbits):
        bucket = bucket + F.when(
            _dot(F.col("embedding"), _hyperplane(i)) > 0.0,
            F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN, single-probe AND multiprobe under one tagged
    relation (r5 gate consolidation of the former
    ``ann_ivf_multiprobe`` entry — both probe strategies stay
    driver-checked):

    * ``probe_mode = 'single'``: coarse cells = 4-bit sign LSH (16
      cells); probe only the query vector's cell; exact cosine top-5
      inside it.  At scale the cell assignment is the partition key,
      so each probe scans 1/16th of the corpus.
    * ``probe_mode = 'multi'``: the query's cell PLUS its 4 Hamming-1
      neighbour cells (flip each sign bit) — the standard recall lever
      of IVF search: 5/16ths scanned, recovering neighbours that fall
      just across a hyperplane.  The probe set is a 5-element
      broadcast literal array.

    Each branch is its own TakeOrdered top-5; the union is of two
    5-row results, never of corpus-scale relations."""
    e = _t(spark, sf_dir, "embeddings").withColumn("cell", _lsh_bucket(4))
    q = F.broadcast(e.where(F.col("vec_id") == 0)
                    .select(F.col("embedding").cast("array<double>")
                            .alias("qe"), F.col("cell").alias("qcell")))
    probes = F.array(F.col("qcell"),
                     *[F.col("qcell").bitwiseXOR(F.lit(2 ** i))
                       for i in range(4)])
    cos = _cosine(F.col("embedding").cast("array<double>"), F.col("qe"))
    base = e.where(F.col("vec_id") != 0).crossJoin(q)

    def topk(filtered, mode: str):
        return (filtered
                .select(F.lit(mode).alias("probe_mode"), "vec_id",
                        F.col("cell").cast("bigint").alias("cell"),
                        F.round(cos, 6).alias("cos_sim"))
                .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
                .limit(5))

    single = topk(base.where(F.col("cell") == F.col("qcell")), "single")
    multi = topk(base.where(F.array_contains(probes, F.col("cell"))),
                 "multi")
    return single.unionByName(multi)


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified downsampling — the reproducible
    sampling primitive of a training-data pipeline: keep a document
    iff the first 8 hex digits of md5(doc_id) mod 100 < 20 (a content-
    independent, engine-portable 20% rate), reported per language.
    Pure map-side predicate + one partial-aggregated groupBy; at
    100 TB the same predicate is a pushdown-able filter on any scan."""
    d = _t(spark, sf_dir, "documents")
    keep = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("bigint") % 100 < 20)
    return (d.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(keep.cast("bigint")).alias("n_kept"))
            .orderBy("lang"))


def _qdot(a, b):
    """Exact BIGINT dot product of two quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def _quantize(col):
    """Deterministic engine-portable quantization: q = floor(x*1000 +
    0.5) per element (FLOOR has no rounding-convention ambiguity,
    unlike ROUND half-even vs half-away)."""
    return F.transform(col, lambda x: F.floor(
        x.cast("double") * 1000.0 + 0.5).cast("bigint"))


def _kmeans_assign(eq: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector, bit-deterministic across engines.

    Centroid k is the rational mean sv/cn of quantized integer
    vectors.  Squared L2 distance to it is
    ``x.x - 2*x.sv/cn + sv.sv/cn^2``; dropping the per-vector constant
    ``x.x`` leaves ``score_k = (sv.sv - 2*cn*x.sv) / cn^2``.  The
    numerator is an exact BIGINT with |num| < 2^53 (|q| <= 600, dim 64,
    n <= 2000 => |num| < 3e14) and the denominator is an exact BIGINT,
    so the double division is a single IEEE round-to-nearest of exact
    operands — identical bits in Spark and DuckDB, no accumulation
    order anywhere.  Ties broken by centroid id (lexicographic struct
    min)."""
    x = F.col("qv")
    num = _qdot(F.col("sv"), F.col("sv")) \
        - F.lit(2).cast("bigint") * F.col("cn") * _qdot(x, F.col("sv"))
    score = num.cast("double") / (F.col("cn") * F.col("cn")).cast("double")
    scored = (eq.crossJoin(F.broadcast(cents))
              .select("vec_id", F.struct(score.alias("s"),
                                         F.col("cid")).alias("sc")))
    return (scored.groupBy("vec_id").agg(F.min("sc").alias("m"))
            .select("vec_id", F.col("m.cid").alias("cluster")))


def _kmeans_fit(eq: DataFrame):
    """One exact-arithmetic Lloyd update over quantized vectors (init =
    vectors 0..15, assign, elementwise-mean update, reassign): returns
    ``(assignments, centroids)`` — ``(vec_id, cluster)`` and
    ``(cid, sv, cn)`` where centroid cid is the rational mean sv/cn.
    Updates are posexplode->sum BIGINT aggregations, bit-reproducible
    across engines because the vectors are floor-quantized to integers
    (shared by q_ann_ivf_kmeans and q_semantic_dedup)."""
    c0 = (eq.where(F.col("vec_id") < 16)
          .select(F.col("vec_id").alias("cid"), F.col("qv").alias("sv"),
                  F.lit(1).cast("bigint").alias("cn")))
    a1 = _kmeans_assign(eq, c0)
    sums = (a1.join(eq, "vec_id")
            .select("cluster", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cluster", "pos").agg(F.sum("v").alias("s"))
            .groupBy("cluster")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda st: st.s).alias("sv")))
    counts = a1.groupBy("cluster").agg(F.count(F.lit(1)).alias("cn"))
    c1 = (sums.join(counts, "cluster")
          .select(F.col("cluster").alias("cid"), "sv", "cn"))
    return _kmeans_assign(eq, c1), c1


def q_ann_ivf_kmeans(spark, sf_dir):
    """IVF with LEARNED centroids: one exact-arithmetic Lloyd update
    (see _kmeans_fit), then probe the query vector's learned cell with
    the exact pinned-order cosine.  Everything distributed: centroids
    are a 16-row DataFrame broadcast into the assignment join (k-means'
    centroid table is small by definition)."""
    e = _t(spark, sf_dir, "embeddings")
    eq = e.select("vec_id", _quantize(F.col("embedding")).alias("qv"))
    a2, _ = _kmeans_fit(eq)
    qcell = F.broadcast(a2.where(F.col("vec_id") == 0)
                        .select(F.col("cluster").alias("qcell")))
    qe = F.broadcast(e.where(F.col("vec_id") == 0)
                     .select(F.col("embedding").cast("array<double>")
                             .alias("qe")))
    cos = _cosine(F.col("embedding").cast("array<double>"), F.col("qe"))
    return (e.join(a2, "vec_id").where(F.col("vec_id") != 0)
            .crossJoin(qcell).where(F.col("cluster") == F.col("qcell"))
            .crossJoin(qe)
            .select("vec_id", F.col("cluster").cast("bigint").alias("cell"),
                    F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(5))


def q_windowed_stats(spark, sf_dir):
    """Event-time tumbling-window zero-DM + SK stats (streaming.py,
    batch form; the stream==batch parity is tested separately).  Window
    start formatted as a string for engine-portable comparison."""
    from .streaming import windowed_stats
    e = _t(spark, sf_dir, "events")
    w = windowed_stats(e)
    return w.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
         .alias("window_start"),
        "chan", "m", "zero_dm", "sk")


def _q_media_features(spark, sf_dir):
    """Multimodal binary-column decode (see multimodal.py)."""
    from .multimodal import q_media_features
    return q_media_features(spark, sf_dir)


def _q_media_frame_sample(spark, sf_dir):
    """Multimodal frame sampling + resize dims (see multimodal.py)."""
    from .multimodal import q_media_frame_sample
    return q_media_frame_sample(spark, sf_dir)


_HLL_M = 256                         # 2^8 buckets (first 2 md5 hex chars)
_HLL_CAP = 40                        # rank cap: sum(2^(CAP-r)) <= 2^48,
#                                      EXACT in IEEE double in any order
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# est = alpha*m^2 / sum(2^-r) = (alpha*m^2*2^CAP) / sum(2^(CAP-r));
# the numerator constant is inlined via repr on BOTH engines, the
# denominator is an exactly-representable double -> ONE deterministic
# IEEE division, no libm anywhere.
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(2 ** _HLL_CAP)


def q_approx_distinct_hll(spark, sf_dir):
    """Deterministic HyperLogLog (the 'novel sketch' slot): md5-hashed
    keys, 256 buckets (first byte), register = max rank of the
    remaining 120 bits (capped at 40), raw HLL estimate with NO
    small-range correction (the domain, orders keys, sits far above
    2.5m so the raw estimator is the defined semantics — and the whole
    computation is libm-free, so Spark and DuckDB agree bit-for-bit;
    see the module constants for the exactness argument).  At scale
    this is one map-side partial max per bucket + a 256-row final agg
    — the classic mergeable-sketch shape."""
    o = _t(spark, sf_dir, "orders").select(
        F.md5(F.col("o_orderkey").cast("string")).alias("h"))
    tail = F.substring("h", 3, 30)
    nz = F.length(F.regexp_extract(tail, "^0*", 0))
    c = F.substring(tail, nz + 1, 1)
    extra = (F.when(c == "1", 3)
             .when(c.isin("2", "3"), 2)
             .when(c.isin("4", "5", "6", "7"), 1)
             .otherwise(0))
    rank = F.when(nz >= 30, F.lit(_HLL_CAP)).otherwise(
        F.least(nz * 4 + extra + 1, F.lit(_HLL_CAP)))
    regs = (o.groupBy(F.conv(F.substring("h", 1, 2), 16, 10)
                      .cast("bigint").alias("bucket"))
            .agg(F.max(rank).alias("r")))
    agg = regs.agg(
        F.count(F.lit(1)).alias("npresent"),
        F.sum(F.pow(F.lit(2.0), F.lit(float(_HLL_CAP)) - F.col("r")))
         .alias("ssum"))
    denom = (F.col("ssum")
             + (F.lit(_HLL_M) - F.col("npresent"))
             * F.lit(float(2 ** _HLL_CAP)))
    exact = _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_orderkey").alias("n_exact"))
    return (agg.crossJoin(exact)
            .select(F.lit(_HLL_M).cast("bigint").alias("m"),
                    "n_exact",
                    F.round(F.lit(_HLL_NUM) / denom, 6).alias("est_hll")))


def connected_components(edges: DataFrame, max_iters: int = 20,
                         checkpoint_dir: str | None = None,
                         algorithm: str = "minlabel") -> DataFrame:
    """Connected components over an undirected edge list
    ``(doc_a, doc_b)`` -> ``(doc_id, component_id)`` with
    ``component_id`` = the lexicographic-min vertex of the component.
    Vertices are the edge endpoints (singletons are their own trivial
    component and are omitted — callers can left-join them back).

    Two algorithms, same contract (parity-tested on the random-graph
    differential suite):

    * ``minlabel`` (default): Pregel-style min-label propagation —
      each round every vertex takes the min of its own label and its
      neighbours' labels; converges in graph-diameter rounds.  ONE
      Spark job per round: the step carries a changed flag, so the
      convergence check is a sum over the round's cached result, not a
      separate join (r3 verdict).  Right shape for dedup graphs, whose
      diameter is tiny (clusters of near-identical documents).
    * ``star``: the alternating large-star/small-star algorithm
      (Kiveris et al. 2014, "Connected Components in MapReduce and
      Beyond") — converges in O(log n) rounds independent of diameter,
      the scale path for billion-vertex/high-diameter general graphs.
      Each round rewrites the edge set (large-star hooks every vertex's
      larger neighbours onto its neighbourhood min, small-star hooks
      the smaller ones); at the fixpoint the edges form stars whose
      centre is the component min.

    Non-convergence within ``max_iters`` RAISES (returning partial —
    hence wrong — labels silently was the r3 advice bug).

    Driver-side state is two scalars per round (iteration count,
    changed count).  Intermediates are cached per round and unpersisted
    — nothing leaks into the session cache.  With ``checkpoint_dir``
    the converged (tiny) label table is written there and the returned
    DataFrame scans it — the standard checkpoint treatment for
    iterative graph algorithms (GraphFrames requires the same),
    avoiding k recomputations of the edge subplan at every downstream
    action.  Without it, the RETURNED DataFrame is a pure recomputable
    plan (k nested joins)."""
    if algorithm == "star":
        return _cc_star(edges, max_iters, checkpoint_dir)
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r}")

    sym = (edges.selectExpr("doc_a AS src", "doc_b AS dst")
           .unionByName(edges.selectExpr("doc_b AS src", "doc_a AS dst")))

    def step(lbl: DataFrame, e: DataFrame) -> DataFrame:
        neigh = (e.join(lbl.select(F.col("doc_id").alias("src"), "comp"),
                        "src")
                 .groupBy(F.col("dst").alias("doc_id"))
                 .agg(F.min("comp").alias("ncomp")))
        nc = F.coalesce("ncomp", "comp")
        return (lbl.join(neigh, "doc_id", "left")
                .select("doc_id", F.least("comp", nc).alias("comp"),
                        (nc < F.col("comp")).cast("int").alias("chg")))

    edges_c = sym.persist()
    verts = (edges_c.select(F.col("src").alias("doc_id")).distinct()
             .select("doc_id", F.col("doc_id").alias("comp")))
    labels, cached, iters, converged = verts, None, 0, False
    try:
        for _ in range(max_iters):
            nxt = step(labels, edges_c).persist()
            # ONE job per round: the changed count folds into the
            # step's own aggregation over the freshly-cached result.
            # If the action dies (executor loss, cancellation), the
            # just-persisted nxt is not yet `cached` and the finally
            # below would miss it — unpersist on the way out.
            try:
                changed = nxt.agg(F.sum("chg")).collect()[0][0] or 0
            except BaseException:
                nxt.unpersist()
                raise
            if cached is not None:
                cached.unpersist()
            labels, cached = nxt.select("doc_id", "comp"), nxt
            iters += 1
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components(minlabel) did not converge in "
                f"{max_iters} rounds (graph diameter exceeds max_iters; "
                f"raise max_iters or use algorithm='star')")
        if checkpoint_dir is not None:
            # Materialize the converged (tiny) labels once, while the
            # per-round caches are still warm; the returned scan never
            # re-runs the loop or the edge subplan.
            (labels.select("doc_id", F.col("comp").alias("component_id"))
             .write.mode("overwrite").parquet(checkpoint_dir))
            return labels.sparkSession.read.parquet(checkpoint_dir)
    finally:
        if cached is not None:
            cached.unpersist()
        edges_c.unpersist()
    # Pure-plan fallback: replay the propagation uncached.  The
    # converged round changed no label, so the fixpoint needs only
    # iters-1 steps.
    plan = verts
    for _ in range(iters - 1):
        plan = step(plan, sym).select("doc_id", "comp")
    return plan.select("doc_id", F.col("comp").alias("component_id"))


def _cc_star(edges: DataFrame, max_iters: int,
             checkpoint_dir: str | None) -> DataFrame:
    """Alternating large-star/small-star rounds to the edge-set
    fixpoint; returns the label DataFrame (doc_id, component_id).

    large-star(E): per vertex u (over the symmetrized edges), hook
    every STRICTLY LARGER neighbour v onto m = min(N(u) + {u}).
    small-star(E): direct edges large->small, per vertex u hook u and
    all its (smaller) neighbours onto m = min(N(u)).  Both preserve
    connectivity; the fixpoint is a forest of depth-1 stars rooted at
    each component's min vertex (Kiveris et al. 2014, thm 1-3).  At
    scale each round is one groupBy per phase over the current edge
    set — no dependence on graph diameter."""

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(e.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        g = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u"))))
        return (g.select(F.col("u"), m.alias("m"),
                         F.explode("nbrs").alias("w"))
                .where(F.col("w") > F.col("u"))
                .select(F.col("w").alias("u"), F.col("m").alias("v"))
                .distinct())

    def small_star(e: DataFrame) -> DataFrame:
        d = (e.select(F.greatest("u", "v").alias("u"),
                      F.least("u", "v").alias("v"))
             .where(F.col("u") != F.col("v")))
        g = d.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        m = F.array_min("nbrs")
        pts = F.array_union(F.col("nbrs"), F.array(F.col("u")))
        return (g.select(m.alias("m"), F.explode(pts).alias("w"))
                .where(F.col("w") != F.col("m"))
                .select(F.col("w").alias("u"), F.col("m").alias("v"))
                .distinct())

    def labels_of(e: DataFrame) -> DataFrame:
        roots = (e.select(F.col("v").alias("doc_id")).distinct()
                 .select("doc_id", F.col("doc_id").alias("component_id")))
        return (e.select(F.col("u").alias("doc_id"),
                         F.col("v").alias("component_id"))
                .unionByName(roots))

    base = (edges.select(F.col("doc_a").alias("u"),
                         F.col("doc_b").alias("v"))
            .where(F.col("u") != F.col("v")).distinct())
    cur, iters, converged = base.persist(), 0, False
    try:
        for _ in range(max_iters):
            nxt = small_star(large_star(cur)).persist()
            # Exact symmetric-difference count in ONE aggregation job:
            # both sides are distinct sets, so an edge is in the
            # difference iff it appears exactly once in their union.
            # Unpersist nxt if the action dies — the finally only
            # covers `cur`.
            try:
                changed = (cur.unionByName(nxt).groupBy("u", "v")
                           .agg(F.count(F.lit(1)).alias("n"))
                           .where(F.col("n") == 1).count())
            except BaseException:
                nxt.unpersist()
                raise
            cur.unpersist()
            cur = nxt
            iters += 1
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components(star) did not converge in "
                f"{max_iters} rounds")
        if checkpoint_dir is not None:
            labels_of(cur).write.mode("overwrite").parquet(checkpoint_dir)
            return cur.sparkSession.read.parquet(checkpoint_dir)
    finally:
        cur.unpersist()
    # Pure-plan fallback (no checkpoint): replay the converged rounds
    # uncached — the fixpoint is stable, so iters rounds reproduce it.
    plan = base
    for _ in range(iters):
        plan = small_star(large_star(plan))
    return labels_of(plan)


def cc_checkpoint_base(spark) -> str:
    """Per-session-unique checkpoint root for connected-components
    label tables: configurable via ``spark.dragnet.cc.checkpointDir``
    (set it to the job's out_dir on a real cluster — /tmp is NOT a
    shared filesystem there); the default embeds the Spark application
    id, so concurrent sessions benching the same sf_dir can never race
    on one path (r3 verdict/advice)."""
    try:
        base = spark.conf.get("spark.dragnet.cc.checkpointDir")
    except Exception:
        base = None
    return base or f"/tmp/dragnet_cc/{spark.sparkContext.applicationId}"


def q_dedup_components(spark, sf_dir):
    """Canonical dedup groups: connected components of the verified
    near-dup graph (edges = LSH-candidate pairs with exact 3-shingle
    Jaccard >= 0.5, i.e. q_dedup_jaccard), component id = min doc_id —
    the 'keep one representative per duplicate cluster' primitive of a
    training-data pipeline (transitive closure, not just pairs)."""
    edges = q_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    slug = sf_dir.strip("/").replace("/", "_")
    return connected_components(
        edges,
        checkpoint_dir=f"{cc_checkpoint_base(spark)}/{slug}.parquet")


def q_dedup_components_star(spark, sf_dir):
    """The same dedup-components contract computed by the alternating
    large-star/small-star algorithm — the O(log n)-round scale path for
    high-diameter graphs (same DuckDB reachability oracle; the two
    algorithms must agree exactly)."""
    edges = q_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    slug = sf_dir.strip("/").replace("/", "_")
    return connected_components(
        edges, algorithm="star",
        checkpoint_dir=f"{cc_checkpoint_base(spark)}/{slug}_star.parquet")


def q_token_topk(spark, sf_dir):
    """Global heavy hitters: top-20 tokens by count, ties broken by
    token — map-side partial aggregation then a single TakeOrdered
    (no full sort at scale)."""
    d = _t(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(20))


def q_dedup_segments(spark, sf_dir):
    """Segment-level exact dedup (the paragraph-dedup pass of
    RefinedWeb/FineWeb-style pipelines, here over fixed 8-word
    segments since the synthetic corpus has no paragraph breaks):
    each document is cut into non-overlapping 8-word segments, every
    segment occurrence corpus-wide is ranked by (doc_id, seg_idx)
    within its md5 fingerprint, and only the first occurrence is
    kept.  Output: per-document segment counts (total / kept /
    removed).

    Scale shape: ONE shuffle partitioned by segment fingerprint (the
    canonical exact-dedup exchange — uniform md5 keys, no skew), then
    a re-aggregation by doc_id; both are partial-agg friendly and the
    segment rows are bounded (~8 words each) regardless of document
    size, so giant documents fan out instead of hot-spotting a task."""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(arr) / F.lit(8.0)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(arr, i * 8 + 1, 8)))
    e = d.select("doc_id", F.posexplode(segs).alias("seg_idx", "seg"))
    w = Window.partitionBy(F.md5("seg")).orderBy("doc_id", "seg_idx")
    ranked = e.select("doc_id", F.row_number().over(w).alias("rn"))
    return (ranked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segments"),
                 F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                  .alias("n_kept"))
            .select("doc_id", "n_segments", "n_kept",
                    (F.col("n_segments") - F.col("n_kept"))
                    .alias("n_removed")))


def q_contamination_ngrams(spark, sf_dir):
    """Benchmark-contamination check: a deterministic 1%-ish eval set
    (doc_id % 97 == 0) is decomposed into distinct word n-grams; every
    training document reports how many of its distinct n-grams appear
    in the eval set.  n=3 here so the tiny synthetic corpus produces
    hits; production decontamination uses the same plan with n=13.

    Scale shape: the eval side (a benchmark suite — thousands of docs
    vs 10^12 training docs) collapses to a distinct n-gram set that is
    explicitly ``F.broadcast``-joined against the exploded training
    stream, so the only shuffles are the tiny eval-side distinct and
    the per-doc count aggregation (map-side combinable)."""
    d = _t(spark, sf_dir, "documents")
    # Materialize the distinct-gram array as a real column: inlining
    # the expression at every reference re-tokenizes the document per
    # use (measured ~10x on the bench corpus).
    g = d.select("doc_id", F.array_distinct(_shingles()).alias("gs"))
    ev = (g.where(F.col("doc_id") % 97 == 0)
          .select(F.explode("gs").alias("g")).distinct())
    tr = (g.where(F.col("doc_id") % 97 != 0)
          .select("doc_id", F.size("gs").alias("n_ngrams"),
                  F.explode("gs").alias("g")))
    return (tr.join(F.broadcast(ev), "g")
            .groupBy("doc_id", "n_ngrams")
            .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
            .select("doc_id",
                    F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
                    "n_hit_ngrams",
                    F.round(F.col("n_hit_ngrams")
                            / F.col("n_ngrams"), 6).alias("hit_frac")))


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals: duplicate-word
    fraction and top-bigram fraction per document.

    Scale shape: zero shuffles — the per-document top-bigram count is
    an O(len^2) JVM higher-order expression (distinct bigrams x
    filter-count), which for web documents (hundreds of words) beats
    the explode -> groupBy(doc, bigram) -> max alternative's TWO
    exchanges; the whole query is a single narrow scan-project."""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    # Guard: sequence(1, 0) DESCENDS for 1-word docs (same quirk as
    # _shingles) -> empty bigram list, NULL top_bigram_frac both engines.
    bi_expr = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.slice(arr, i, 2)))
    ).otherwise(F.array().cast("array<string>"))
    # Materialize words + bigrams once per row; referencing the raw
    # expression at each use re-tokenizes the document per reference
    # (measured ~10x on the bench corpus).
    w = d.select("doc_id", arr.alias("w"), bi_expr.alias("bi"))
    nw = F.size("w")
    # Top-bigram count = longest equal run of the sorted bigram list:
    # O(len log len) + one pass (vs the naive O(len^2) distinct x
    # filter-count, which blows up on real web documents with
    # thousands of words).  Comparator-free array_sort stays fast
    # JVM-side; the run-length scan is a single F.aggregate fold.
    # `best` folds in a run's length when the run ENDS (and the finish
    # lambda closes the final run), so the run-update expression
    # appears exactly once — re-referencing a Column inlines its whole
    # tree at every use (the repo rule this fold previously broke).
    top = F.aggregate(
        F.array_sort("bi"),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
             .alias("run"),
            F.when(x == acc.prev, acc.best)
             .otherwise(F.greatest(acc.best, acc.run)).alias("best")),
        lambda acc: F.greatest(acc.best, acc.run))
    return w.select(
        "doc_id",
        nw.cast("bigint").alias("n_words"),
        (nw - 1).cast("bigint").alias("n_bigrams"),
        F.round(F.lit(1.0) - F.size(F.array_distinct("w")) / nw, 6)
         .alias("dup_word_frac"),
        # 1-word docs have no bigrams: NULL, like the oracle's
        # list_max(empty) = NULL — an unguarded /(nw-1) is a
        # DIVIDE_BY_ZERO under ANSI mode (found by the random-corpus
        # fuzz; the fixed corpus has no 1-word documents).
        F.when(nw >= 2, F.round(top.cast("double") / (nw - 1), 6))
         .alias("top_bigram_frac"))


def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column plus
    reconstruction-error metrics — the embedding-compression ingest
    stage (4x storage cut before ANN indexing / near-dup search).

    Per vector: scale = max|x|/127 (1.0 for the all-zero vector),
    q_j = floor(x_j/scale + 0.5) (round-half-up — engine-portable,
    unlike banker's rounding), errors accumulated in double with the
    same left-fold order as the DuckDB oracle.

    Scale shape: a single narrow scan-project — zero shuffles, zero
    joins; at 10^12 vectors this is embarrassingly parallel, every
    expression is JVM-side, and the quantized output stays columnar
    (array<tinyint> + one scale per row; here only the error metrics
    are returned)."""
    e = _t(spark, sf_dir, "embeddings")
    # Materialize each intermediate once per row (a re-referenced
    # Column expression is inlined — and recomputed — at every use).
    d = e.select("vec_id",
                 F.size("embedding").cast("bigint").alias("n_dims"),
                 F.col("embedding").cast("array<double>").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), F.abs))
    d = d.select("vec_id", "n_dims", "v",
                 F.when(amax > 0, amax / F.lit(127.0))
                  .otherwise(F.lit(1.0)).alias("scale"))
    d = d.select("vec_id", "n_dims", "v", "scale",
                 F.transform(F.col("v"),
                             lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
                              .cast("bigint")).alias("q"))
    d = d.select("vec_id", "n_dims", "scale",
                 F.array_min("q").alias("q_min"),
                 F.array_max("q").alias("q_max"),
                 F.zip_with(F.col("v"), F.col("q"),
                            lambda x, qq: x - qq.cast("double")
                            * F.col("scale")).alias("err"))
    mse = F.aggregate(F.transform(F.col("err"), lambda x: x * x),
                      F.lit(0.0).cast("double"),
                      lambda acc, x: acc + x) / F.col("n_dims")
    return d.select("vec_id", "n_dims", "q_min", "q_max",
                    F.round(F.col("scale"), 6).alias("scale"),
                    F.round(mse, 6).alias("mse"),
                    F.round(F.array_max(F.transform(F.col("err"), F.abs)), 6)
                     .alias("max_abs_err"))


def q_length_quantiles(spark, sf_dir):
    """Exact per-language document-length quantiles via a histogram
    aggregation — inverse-CDF semantics (smallest value whose
    cumulative count reaches p*n, i.e. DuckDB's quantile_disc).

    Scale shape: the shuffle carries only distinct (lang, n_chars)
    pairs with map-side-combined partial counts — exact quantiles at
    10^12 documents WITHOUT sorting the raw rows, because the value
    domain (document length) is bounded.  Contrast `percentile()`,
    which collects every row of a group into one task; that is the
    plan that dies at web scale."""
    d = _t(spark, sf_dir, "documents")
    h = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("lang").orderBy("n_chars")
    wt = Window.partitionBy("lang")
    h = h.select("lang", "n_chars", "c",
                 F.sum("c").over(wc).alias("cum"),
                 F.sum("c").over(wt).alias("tot"))

    def qv(p):
        hit = F.col("cum").cast("double") \
            >= F.lit(p) * F.col("tot").cast("double")
        return F.min(F.when(hit, F.col("n_chars")))

    return h.groupBy("lang").agg(
        F.max("tot").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.sum(F.col("n_chars") * F.col("c")).cast("double")
                / F.max("tot"), 6).alias("mean_chars"),
        qv(0.5).alias("p50"), qv(0.9).alias("p90"), qv(0.99).alias("p99"))


def q_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (keyword extraction for
    training-data curation).  idf is the log-free rational form
    (N+1)/(df+1): strictly monotone in the classic smooth-idf's
    argument, so per-document term ranking is identical, and —
    unlike ln(), which differs by ULPs between libms — bit-portable
    across engines.

    Scale shape: tf = ONE (doc_id, term) partial agg off the exploded
    scan; df = a vocab-sized agg over the tf relation, joined back
    WITHOUT a broadcast hint: under autoBroadcastJoinThreshold the
    optimizer broadcasts the small df side (plan-pinned in pytest),
    and a web-corpus vocab at 1e8 terms exceeding the threshold falls
    back to a shuffle join on term — still safe, both sides are
    pre-aggregated (an explicit hint would OVERRIDE the threshold and
    force a driver-OOM broadcast at that scale; only the one-row
    n_docs scalar keeps its hint).  Per-doc top-3 via row_number over
    the doc_id exchange.  Ties broken by term for determinism."""
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf").cast("double") * ((F.col("n_docs") + 1).cast("double")
                                          / (F.col("df") + 1).cast("double"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term", "tf", "df",
                      F.round(score, 6).alias("tfidf")))
    wnd = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"),
                                               F.asc("term"))
    return (scored.select("doc_id", "term", "tf", "df", "tfidf",
                          F.row_number().over(wnd).alias("rank"))
            .where(F.col("rank") <= 3))


def _quant_codes(e):
    """Shared int8 quantizer: (vec_id, q) with q = symmetric int8
    codes of the embedding (same formula as q_embedding_quantize)."""
    d = e.select("vec_id",
                 F.col("embedding").cast("array<double>").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), F.abs))
    d = d.select("vec_id", "v",
                 F.when(amax > 0, amax / F.lit(127.0))
                  .otherwise(F.lit(1.0)).alias("scale"))
    return d.select("vec_id",
                    F.transform(F.col("v"),
                                lambda x: F.floor(x / F.col("scale")
                                                  + F.lit(0.5))
                                 .cast("bigint")).alias("q"))


def _quant_cosine(a, b):
    """Quantized cosine between two int8-code array columns: EXACT
    BIGINT dot/ssq accumulation (codes <= 127, a 4096-dim dot keeps
    2^40 headroom), then two sqrts and one division — the single
    shared definition both the standalone top-k and the rescore
    shortlist rank by, so their determinism story cannot diverge."""
    def idot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda u, v: u * v),
                           F.lit(0).cast("bigint"), lambda acc, u: acc + u)

    return idot(a, b).cast("double") \
        / (F.sqrt(idot(a, a).cast("double"))
           * F.sqrt(idot(b, b).cast("double")))


def q_ann_quantized_topk(spark, sf_dir):
    """Cosine top-10 computed entirely on int8-quantized codes — the
    production retrieval shape (4x less memory bandwidth than f32;
    rescore the short list with exact vectors if needed).

    cos_q = dot_int / (sqrt(ssq_int_a) * sqrt(ssq_int_b)): every
    accumulation is EXACT BIGINT integer arithmetic (codes are
    <=127, so a 4096-dim dot still fits with 2^40 headroom), and the
    only floats are two sqrts and one division — bit-identical on any
    engine, which is the determinism story symmetric quantization buys
    on top of the bandwidth story.

    Scale shape: same as ann_cosine_topk — broadcast query codes,
    narrow scan + TakeOrdered top-k, no shuffle of the corpus."""
    e = _t(spark, sf_dir, "embeddings")
    qc = _quant_codes(e)
    query = F.broadcast(qc.where(F.col("vec_id") == 0)
                        .select(F.col("q").alias("qb")))

    cos = _quant_cosine(F.col("q"), F.col("qb"))
    return (qc.where(F.col("vec_id") != 0).crossJoin(query)
            .select("vec_id", F.round(cos, 6).alias("cos_q"))
            .orderBy(F.desc("cos_q"), F.asc("vec_id"))
            .limit(10))


def q_ann_quantized_rescore(spark, sf_dir):
    """Two-stage production retrieval: int8-code shortlist (top-50 by
    quantized cosine — the cheap 4x-less-bandwidth pass) RE-SCORED
    with the exact f32 vectors to the final top-10 — the serving shape
    the quantization docstring promises ('rescore the short list with
    exact vectors').  On this corpus the rescored top-10 equals the
    exact brute-force ``ann_cosine_topk`` top-10 (pinned by pytest),
    i.e. the shortlist loses nothing while the full-precision pass
    touches 50 vectors instead of the corpus.

    Determinism: the shortlist ranks by the UNROUNDED quantized cosine
    (exact BIGINT dot/ssq, two sqrts, one division — bit-portable),
    ties by vec_id; the rescore reuses ann_cosine_topk's sequential
    double fold.

    Scale shape: stage 1 is the ann_quantized_topk plan (broadcast
    query codes + TakeOrdered, no corpus shuffle); stage 2 joins the
    50-row shortlist BROADCAST against the embeddings scan (a
    broadcast-hash semi-probe — the corpus never shuffles) and
    TakeOrders the final 10."""
    e = _t(spark, sf_dir, "embeddings")
    qc = _quant_codes(e)
    qcodes = F.broadcast(qc.where(F.col("vec_id") == 0)
                         .select(F.col("q").alias("qb")))

    cos_q = _quant_cosine(F.col("q"), F.col("qb"))
    shortlist = (qc.where(F.col("vec_id") != 0).crossJoin(qcodes)
                 .select("vec_id", cos_q.alias("cos_q"))
                 .orderBy(F.desc("cos_q"), F.asc("vec_id"))
                 .limit(50)
                 .select("vec_id"))
    qe = F.broadcast(e.where(F.col("vec_id") == 0)
                     .select(F.col("embedding").cast("array<double>")
                             .alias("qe")))
    cos = _cosine(F.col("embedding").cast("array<double>"), F.col("qe"))
    return (e.join(F.broadcast(shortlist), "vec_id").crossJoin(qe)
            .select("vec_id", F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(10))


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization of the event stream (gap > 4 h starts
    a new session) with per-session aggregates — the canonical
    event-analytics window operator.

    Boundary semantics match ``F.session_window`` exactly — which
    MERGES an event arriving exactly gap after its predecessor (probed
    empirically on Spark 4.1.2: two events 4 h apart under a 4 h
    session_window form ONE session; the half-open-window reading that
    previously justified a ``>=`` predicate here was wrong, caught by
    the random-event-corpus fuzz whose gap mixture plants exact-gap
    same-user pairs).  So the batch predicate is STRICT >: stream ==
    batch row-for-row including the exact-gap edge.

    Determinism: gaps are compared in EXACT integer microseconds
    (unix_micros / epoch_us), the running session index is an integer
    window sum, and the value sum goes through DECIMAL(18,2).

    Scale shape: ONE exchange on user_id serves both windows (lag +
    running sum share the same partitioning and ordering) and the
    session aggregation re-groups within it; event-time skew is
    per-user, which the 10^12-row story handles by salting only the
    pathological power users."""
    ev = _t(spark, sf_dir, "events")
    gap_us = 4 * 3600 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the session zone is pinned UTC (session.py)
    # so the cast keeps the wall clock and unix_micros == epoch_us.
    e = ev.select("user_id", "ts", "event_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                  _dec("value").alias("v"))
    e = e.select("user_id", "us", "v",
                 F.when(F.lag("us").over(w).isNull()
                        | ((F.col("us") - F.lag("us").over(w)) > gap_us),
                        F.lit(1)).otherwise(F.lit(0)).alias("new_sess"))
    e = e.select("user_id", "us", "v",
                 F.sum("new_sess").over(
                     Window.partitionBy("user_id").orderBy("us")
                 ).alias("session_id"))
    return e.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.round((F.max("us") - F.min("us")).cast("double") / 1e6, 6)
         .alias("duration_s"),
        F.sum("v").cast("double").alias("sum_value"))


def q_curate_decisions(spark, sf_dir):
    """End-to-end curation gate: one keep/drop decision per document
    with the first failing rule as the reason — the composition a
    training-data pipeline actually ships (dedup + holdout + length +
    repetition + benchmark-contamination in precedence order):

    eval_holdout > duplicate > near_duplicate > too_short >
    repetitive > contaminated > keep.

    ``near_duplicate`` (new in r5) drops non-representatives of
    near-dup CLUSTERS, not just exact copies: edges = the LSH-candidate
    pairs verified at exact 3-shingle Jaccard >= 0.5 (q_dedup_jaccard),
    clusters = their connected components, representative = the
    component-min doc_id — every other member is dropped.  Exact
    duplicates land in the same cluster but are caught earlier by the
    cheaper fingerprint rule.

    Scale shape: the exact-dup rank is one md5-fingerprint window
    shuffle; the near-dup labels come from the banded minhash self-join
    plus O(diameter) min-label rounds over the (tiny) verified edge
    set, never an all-pairs pass; contamination hits re-use the
    broadcast eval n-gram set (never a shuffle of the corpus against
    the benchmark suite) and come back to the document axis via one
    doc_id aggregation; the rule cascade itself is a pure projection.
    Every rule is also available standalone (dedup_exact /
    dedup_components / quality_repetition / contamination_ngrams) —
    this operator is the proof they compose without extra passes over
    the text."""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    base = d.select("doc_id", F.md5("text").alias("fp"), arr.alias("w"))
    base = base.select(
        "doc_id", "fp",
        F.size("w").alias("n_words"),
        (F.lit(1.0) - F.size(F.array_distinct("w")) / F.size("w"))
        .alias("dup_word_frac"),
        # The SAME word 3-gram shingles as the standalone
        # contamination_ngrams rule (_shingles): the gate must
        # classify documents identically to the rule it composes — a
        # prior bigram variant here disagreed with the standalone
        # 3-gram rule on boundary documents.
        F.when(F.size("w") >= 3, F.transform(
            F.sequence(F.lit(1), F.size("w") - 2),
            lambda i: F.concat_ws(" ", F.slice("w", i, 3)))
        ).otherwise(F.array().cast("array<string>")).alias("tri"))
    rn = F.row_number().over(
        Window.partitionBy("fp").orderBy("doc_id"))
    base = base.select("doc_id", "n_words", "dup_word_frac",
                       F.array_distinct("tri").alias("gs"),
                       rn.alias("dup_rank"))
    ev = (base.where(F.col("doc_id") % 97 == 0)
          .select(F.explode("gs").alias("g")).distinct())
    hits = (base.where(F.col("doc_id") % 97 != 0)
            .select("doc_id", F.size("gs").alias("n_g"),
                    F.explode("gs").alias("g"))
            .join(F.broadcast(ev), "g")
            .groupBy("doc_id", "n_g")
            .agg(F.count(F.lit(1)).alias("n_hit")))
    slug = sf_dir.strip("/").replace("/", "_")
    comps = connected_components(
        q_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b"),
        checkpoint_dir=f"{cc_checkpoint_base(spark)}/{slug}_curate.parquet")
    j = (base.join(hits.select(
            "doc_id", (F.col("n_hit").cast("double") / F.col("n_g"))
            .alias("hit_frac")), "doc_id", "left")
         .join(F.broadcast(comps), "doc_id", "left"))
    reason = (F.when(F.col("doc_id") % 97 == 0, F.lit("eval_holdout"))
              .when(F.col("dup_rank") > 1, F.lit("duplicate"))
              .when(F.col("component_id").isNotNull()
                    & (F.col("component_id") != F.col("doc_id")),
                    F.lit("near_duplicate"))
              .when(F.col("n_words") < 5, F.lit("too_short"))
              .when(F.col("dup_word_frac") > 0.6, F.lit("repetitive"))
              .when(F.coalesce(F.col("hit_frac"), F.lit(0.0)) > 0.5,
                    F.lit("contaminated"))
              .otherwise(F.lit("keep")))
    j = j.select("doc_id", reason.alias("reason"))
    return j.select("doc_id", "reason", (F.col("reason") == "keep")
                    .alias("keep"))


# PII scrub patterns: character-class-only regexes chosen to have
# IDENTICAL semantics under Java regex (Spark) and RE2 (DuckDB) — no
# backreferences, no lookaround, ASCII \d/\b in both.  The corpus text
# is synthetic and PII-free, so the operator plants deterministic PII
# from doc_id first (mechanism-profile style, like LANG_MARKERS /
# telescope ids: correctness = oracle equality of the mechanism, not
# detector accuracy on real-world text).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d -]{7,}\d"


def q_pii_redact(spark, sf_dir):
    """PII scrub — the redaction pass every web-scale training-data
    pipeline runs before anything else touches the text (emails, IPv4
    addresses, phone numbers -> typed placeholder tokens), plus the
    per-document detection counts the pipeline's compliance metrics
    aggregate.

    Deterministic plant: docs with doc_id % 3 == 0 get an email,
    % 4 == 0 an IPv4, % 5 == 0 an international phone number appended
    (all derived from doc_id), so the detector sees a varied, known
    mix including every overlap combination.  Redaction applies
    email -> <EMAIL>, then IPv4 -> <IP>, then phone -> <PHONE>, in
    that fixed order on the running result (later patterns see earlier
    replacements — the order is part of the contract and the oracle).

    Scale shape: a single narrow scan-projection — regexp_count /
    regexp_replace are JVM-side codegen expressions, zero shuffles,
    zero joins, no Python in the path (plan-pinned in plan_audit and
    tests).  At 10^12 documents this is embarrassingly parallel and
    IO-bound, exactly what a scrub pass must be."""
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    email = F.concat(F.lit(" mail user"), doc.cast("string"),
                     F.lit("@ex"), (doc % 7).cast("string"),
                     F.lit(".example.org"))
    ip = F.concat(F.lit(" host 192."), (doc % 200).cast("string"),
                  F.lit("."), ((doc * 3) % 250).cast("string"),
                  F.lit("."), (doc % 9 + 1).cast("string"))
    phone = F.concat(F.lit(" call +1 555 01"),
                     (doc % 90 + 10).cast("string"),
                     F.lit(" "), (doc % 9000 + 1000).cast("string"))
    txt = F.concat(
        F.col("text"),
        F.when(doc % 3 == 0, email).otherwise(F.lit("")),
        F.when(doc % 4 == 0, ip).otherwise(F.lit("")),
        F.when(doc % 5 == 0, phone).otherwise(F.lit("")))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>"),
        PII_PHONE_RE, "<PHONE>")
    return d.select(
        "doc_id",
        F.regexp_count(txt, F.lit(PII_EMAIL_RE)).cast("bigint")
         .alias("n_emails"),
        F.regexp_count(txt, F.lit(PII_IPV4_RE)).cast("bigint")
         .alias("n_ipv4"),
        F.regexp_count(txt, F.lit(PII_PHONE_RE)).cast("bigint")
         .alias("n_phones"),
        red.alias("redacted"))


def q_dedup_incremental(spark, sf_dir):
    """Incremental (cross-snapshot) dedup: classify each NEW-batch
    document — ``doc_id % 5 == 0``, the deterministic stand-in for
    "today's crawl increment" — against the EXISTING corpus (the other
    80%) without ever comparing corpus docs to each other.

    Verdict precedence per batch doc:
      ``dup_exact_corpus``  md5(text) already present in the corpus
      ``dup_exact_batch``   an earlier batch doc has the same
                            fingerprint (within-increment exact dup)
      ``near_dup_corpus``   LSH band-bucket candidate vs the corpus
                            whose exact 3-shingle Jaccard >= 0.5
      ``kept``              none of the above
    ``matched_doc`` = the minimal matching doc_id under the decided
    rule (-1 for kept — engine-portable instead of NULL).

    Scale shape (the production reason this operator exists): a daily
    increment is ~0.1-1% of the corpus, so re-running full-corpus
    dedup per snapshot is 100-1000x wasted work.  Unlike the
    full-corpus chain (``_minhash_df``: explode shingles -> groupBy —
    a shuffle of the exploded shingle stream, ~2-3x the text volume),
    the signatures here are PER-ROW expressions: ``array_min`` over a
    ``transform`` of the shingle array gives each of the 8 minhashes
    with ZERO shuffle, and no exchange anywhere carries a shingle
    array (pinned in ``test_dedup_incremental_plan``) — what shuffles
    is narrow fingerprint projections, band/bucket rows (the BATCH
    band side broadcasts, so corpus bands never move), candidate
    pairs, and the increment itself for the final verdict assembly.
    The batch/corpus split predicate is pushed into every parquet scan
    (pinned), corpus x corpus pairs are never formed, and only buckets
    containing a batch doc ever reach Jaccard verification.  At a real
    deployment the corpus-side projections (fingerprint, signature)
    are precomputed once at ingest and stored next to the bucketed
    layout (``io.write_documents_bucketed``), so the per-increment run
    scans only the increment plus two small stored index tables;
    within-batch NEAR-dup (batch x batch) is deliberately left to the
    full-corpus chain (minhash -> jaccard -> components) the next
    compaction runs.

    Gate note: the driver cap is 50 and fully allocated, so this entry
    ships in EXTRA_QUERIES — same DuckDB-oracle discipline
    (EXTRA_ORACLE_SQL), checked in-suite (test_training_ops +
    the random-corpus fuzz) instead of by the driver."""
    d = _t(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 5) == 0
    base = d.select("doc_id", F.md5("text").alias("fp"),
                    _shingles().alias("sh0"))
    # Per-row minhash: min over the shingle multiset == min over the
    # set.  sh0 is referenced by all 8 mins from a separate projection
    # step — CollapseProject keeps multiply-referenced expensive
    # expressions in their own project, so the shingle split runs once.
    # The salt must be bound via a closure factory: a 2-parameter
    # lambda (even with a default) makes F.transform pass the array
    # INDEX as the second argument, silently shadowing the salt.
    def _salted_min(k):
        salt = F.lit(f":{k}")
        return F.array_min(F.transform(
            F.col("sh0"), lambda s: F.md5(F.concat(s, salt))))

    mins = [_salted_min(k).alias(f"h{k}") for k in range(_N_MINHASH)]
    mh = base.select("doc_id", "fp", *mins)
    batch_fp = mh.select("doc_id", "fp").where(is_new)
    corpus_min = (mh.select("doc_id", "fp").where(~is_new).groupBy("fp")
                  .agg(F.min("doc_id").alias("corpus_match")))
    batch_min = (batch_fp.groupBy("fp")
                 .agg(F.min("doc_id").alias("batch_min")))
    bands = _band_rows(mh)
    cand = (bands.where(is_new).alias("a")
            .join(bands.where(~is_new).alias("c"),
                  (F.col("a.b") == F.col("c.b"))
                  & (F.col("a.v") == F.col("c.v")))
            .select(F.col("a.doc_id").alias("doc_n"),
                    F.col("c.doc_id").alias("doc_o"))
            .distinct())
    sets = d.select("doc_id", F.array_distinct(_shingles()).alias("ss"))
    pairs = (cand
             .join(sets.alias("sa"), F.col("doc_n") == F.col("sa.doc_id"))
             .join(sets.alias("sb"), F.col("doc_o") == F.col("sb.doc_id")))
    n_common = F.size(F.array_intersect(F.col("sa.ss"), F.col("sb.ss")))
    sz_union = (F.size(F.col("sa.ss")) + F.size(F.col("sb.ss"))
                - n_common)
    near = (pairs.where((n_common / sz_union) >= 0.5)
            .groupBy("doc_n").agg(F.min("doc_o").alias("near_match")))
    row = (batch_fp
           .join(corpus_min, "fp", "left")
           .join(batch_min, "fp", "left")
           .join(near, batch_fp["doc_id"] == near["doc_n"], "left"))
    exact_c = F.col("corpus_match").isNotNull()
    exact_b = F.col("batch_min") < F.col("doc_id")
    near_c = F.col("near_match").isNotNull()
    verdict = (F.when(exact_c, F.lit("dup_exact_corpus"))
               .when(exact_b, F.lit("dup_exact_batch"))
               .when(near_c, F.lit("near_dup_corpus"))
               .otherwise(F.lit("kept")))
    matched = (F.when(exact_c, F.col("corpus_match"))
               .when(exact_b, F.col("batch_min"))
               .when(near_c, F.col("near_match"))
               .otherwise(F.lit(-1)))
    return row.select("doc_id", verdict.alias("verdict"),
                      matched.alias("matched_doc"))


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware cluster representative selection: within each
    verified near-dup component (the dedup_components contract),
    KEEP the member with the highest quality score instead of the
    first-seen/min-id copy — the production refinement of
    "keep one representative per duplicate cluster" (a crawl's best
    copy of a page is rarely its first copy: mirrors truncate,
    re-crawls gain content).  Quality = number of DISTINCT
    whitespace words (exact BIGINT — engine-portable, no float
    thresholds), ties broken toward the smaller doc_id.  Output is
    one row per cluster MEMBER: (doc_id, component_id, quality,
    action keep|drop, kept_doc).

    Scale shape: cluster labels come from the existing banded-minhash
    -> exact-Jaccard -> connected-components chain (never all-pairs);
    the label set is tiny relative to the corpus (only near-dup
    members carry labels), so it BROADCASTS against the per-row
    quality projection — the corpus never shuffles.  The
    representative choice is one map-side-combinable
    ``max(struct(quality, -doc_id))`` per component — an argmax
    aggregation, NOT a window sort over members (no
    per-component row_number ordering pass), and the one-row-per-
    cluster result broadcasts back for the keep/drop verdict.  Zero
    exchanges carry text or shingle arrays beyond the candidate
    chain already audited in dedup_components.

    Gate note: the driver cap is 50 and fully allocated, so this
    entry ships in EXTRA_QUERIES — same DuckDB-oracle discipline
    (EXTRA_ORACLE_SQL: the dedup_components reachability CTE + a
    window-max rep), checked in-suite (test_training_ops + the
    random-corpus fuzz)."""
    d = _t(spark, sf_dir, "documents")
    edges = q_dedup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    slug = sf_dir.strip("/").replace("/", "_")
    comps = connected_components(
        edges,
        checkpoint_dir=f"{cc_checkpoint_base(spark)}/{slug}_best.parquet")
    qual = d.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
         .cast("bigint").alias("quality"))
    memb = qual.join(F.broadcast(comps), "doc_id")
    rep = (memb.groupBy("component_id")
           .agg(F.max(F.struct(F.col("quality").alias("q"),
                               (-F.col("doc_id")).alias("neg_id")))
                .alias("best"))
           .select("component_id",
                   (-F.col("best.neg_id")).alias("kept_doc")))
    return (memb.join(F.broadcast(rep), "component_id")
            .select("doc_id", "component_id", "quality",
                    F.when(F.col("doc_id") == F.col("kept_doc"),
                           F.lit("keep"))
                     .otherwise(F.lit("drop")).alias("action"),
                    "kept_doc"))


# Context length and scan-bucket width for q_sequence_pack.  L is a
# power of two so the double division tok_start/L inside floor() is
# IEEE-exact (no truncation hazard); B is a power of two for the same
# reason and small enough that the pytest corpora exercise multi-
# bucket offsets.  At web scale B would be ~2^20 (the per-bucket
# Window then sorts <= 2^20 rows per task and the bucket-offsets
# relation is corpus/2^20 rows — 10^6 at 10^12 docs).
_PACK_L = 128
_PACK_B = 64


def q_sequence_pack(spark, sf_dir):
    """GPT-style sequence packing: concatenate every document's
    whitespace tokens in doc_id order into one global token stream and
    chunk it into fixed-size training contexts of L=128 tokens —
    emitting one row per (document, context bin) overlap:
    (doc_id, doc_tokens, tok_start, bin_id, tok_in_bin).  This is the
    concat-and-chunk data layout step of an LM training pipeline
    (documents straddle bin boundaries; a doc longer than L spans
    multiple bins).  All-integer arithmetic — exact in both engines.

    Scale shape: the global exclusive prefix-sum is the textbook
    scale-killer (a naive Window over ORDER BY doc_id with no
    partition spec collapses the corpus into ONE task via an Exchange
    SinglePartition).  Instead it is computed HIERARCHICALLY, the
    two-level scan: bucket g = floor(doc_id/B) -> (1) per-bucket token
    sums via one partial agg (corpus/B rows), (2) exclusive running
    total OVER the tiny bucket relation (the only SinglePartition
    exchange in the plan — corpus/B rows, ~10^6 at 10^12 docs; a third
    level repeats the trick if that ever matters), (3) broadcast the
    bucket offsets back and add a PER-BUCKET exclusive cumsum
    (Window partitionBy(g) — parallel in g, each task sorts <= B
    rows).  Bin membership = explode(sequence(bin_lo, bin_hi)) —
    rows-out bounded by 1 + doc_tokens/L per doc, never a cartesian.
    Plan pins (pytest + plan_audit): exactly one SinglePartition
    exchange, sitting above the bucket HashAggregate, never the
    corpus scan; the corpus-side Window is partitioned by g.

    Gate note: ships in EXTRA_QUERIES (the 50-entry driver cap is
    fully allocated — see the QUERIES comment); same dual-engine
    discipline via EXTRA_ORACLE_SQL (DuckDB computes the same prefix
    sum with a plain window, exactness is engine-trivial there) and
    the random-corpus fuzz."""
    L, B = _PACK_L, _PACK_B
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        F.floor(F.col("doc_id") / F.lit(B)).cast("bigint").alias("g"))
    # (1) per-bucket sums; (2) exclusive running offset over the tiny
    # bucket relation (this Window is the plan's one SinglePartition).
    bs = tok.groupBy("g").agg(F.sum("n_tok").alias("b_tok"))
    w_b = (Window.orderBy("g")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = bs.select(
        "g", F.coalesce(F.sum("b_tok").over(w_b), F.lit(0)).alias("b_off"))
    # (3) per-bucket exclusive cumsum (parallel in g) + bucket offset.
    w_g = (Window.partitionBy("g").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, -1))
    cum = (tok.join(F.broadcast(boff), "g")
           .select("doc_id", "n_tok",
                   (F.col("b_off")
                    + F.coalesce(F.sum("n_tok").over(w_g), F.lit(0)))
                   .alias("tok_start")))
    bin_lo = F.floor(F.col("tok_start") / F.lit(L)).cast("bigint")
    bin_hi = (F.floor((F.col("tok_start") + F.col("n_tok") - 1) / F.lit(L))
              .cast("bigint"))
    return (cum.select("doc_id", F.col("n_tok").alias("doc_tokens"),
                       "tok_start",
                       F.explode(F.sequence(bin_lo, bin_hi)).alias("bin_id"))
            .select("doc_id", "doc_tokens", "tok_start", "bin_id",
                    (F.least(F.col("tok_start") + F.col("doc_tokens"),
                             (F.col("bin_id") + 1) * L)
                     - F.greatest(F.col("tok_start"),
                                  F.col("bin_id") * L)).alias("tok_in_bin")))


# Portable natural log: ln() differs by ULPs between libms (Java
# Math.log vs DuckDB's C log produce different last bits for the same
# double — measured, not hypothetical), so any cross-engine oracle in
# log space would be flaky at ROUND midpoints.  ln_portable_int
# instead evaluates a FIXED-ORDER IEEE-754 expression both engines
# run identically (same spirit as plan.py's hand-rolled Lanczos
# lngamma): for integer n in [1, 2^53), reduce n = m * 2^e with
# e = bitlength(n)-1 (exact via length(bin(n)); the division by 2^e
# only shifts the exponent, so m in [1,2) is exact), fold m into
# [1/sqrt2, sqrt2) (one exact compare + halving), then
# ln(m) = 2*atanh(t), t = (m-1)/(m+1) in [-0.172, 0.172], via an
# 11-term odd series in Horner order.  Every op is +,-,*,/ on doubles
# — IEEE-exact rounding, so both engines produce bit-identical
# results (pinned over 1..5000 and 2^40-scale ints in pytest);
# accuracy vs true ln is ~1 ulp (2.3e-16 relative, measured).  The
# DuckDB twin is oracle_sql._ln_int_sql — a matched pair: any edit
# here must be mirrored there (the parity test fails loudly if not).
_LN2 = 0.6931471805599453        # nearest double to ln 2
_SQRT2 = 1.4142135623730951      # nearest double to sqrt 2
_ATANH_COEFS = tuple(1.0 / (2 * k + 1) for k in range(1, 12))


def ln_portable_int(n):
    """Bit-portable ln of an integer column n >= 1 (< 2^53)."""
    e = (F.length(F.bin(n)) - F.lit(1)).cast("double")
    m = n.cast("double") / F.pow(F.lit(2.0), e)
    big = m >= F.lit(_SQRT2)
    m2 = F.when(big, m / F.lit(2.0)).otherwise(m)
    e2 = F.when(big, e + F.lit(1.0)).otherwise(e)
    t = (m2 - F.lit(1.0)) / (m2 + F.lit(1.0))
    t2 = t * t
    p = F.lit(_ATANH_COEFS[-1])
    for c in reversed(_ATANH_COEFS[:-1]):
        p = p * t2 + F.lit(c)
    return e2 * F.lit(_LN2) + F.lit(2.0) * t * (F.lit(1.0) + t2 * p)


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style n-gram language-model quality scoring: train an
    add-one-smoothed bigram LM on the corpus itself, then score every
    document's per-bigram cross-entropy under it —
    -mean(ln p(w_i | w_{i-1})), low = fluent/in-distribution, high =
    gibberish/boilerplate (the classic perplexity filter of a
    training-data pipeline; Wenzek et al. 2020 filter Common Crawl
    exactly this way, with KenLM in place of the corpus-trained
    counts).  p(w2|w1) = (c(w1 w2)+1) / (ctx(w1)+V) with ctx(w1) =
    bigram-context occurrences of w1 and V = corpus vocabulary size.
    Output: (doc_id, n_bigrams, cross_entropy) for every doc with
    >= 2 tokens (singleton docs carry no bigram evidence).

    Determinism: ln is deliberately NOT the engine's — libm ULP skew
    would break the bit-exact gate — but ln_portable_int (above),
    bit-identical on both engines; the per-doc sum folds the bigram
    log-probs in position order (sort_array over (pos, logp) structs
    + F.aggregate — the ann_cosine sequential-accumulation pattern),
    so even float addition order is pinned.

    Scale shape: ONE exploded-bigram scan feeds both count
    aggregations (bigram counts and w1 context counts — partial aggs,
    map-side combinable) and the scoring join; both count relations
    join back UNJOINTED-by-hint on their term keys (the tfidf lesson:
    under autoBroadcastJoinThreshold the optimizer broadcasts the
    vocab-sized sides — plan-pinned — and a 1e8-term web vocab falls
    back to a shuffle join of pre-aggregated sides instead of a
    forced driver-OOM broadcast); only the one-row V scalar keeps an
    explicit broadcast.  The per-doc reassembly groups (doc_id, pos,
    logp) rows — bounded by document length, the same bound every
    per-doc relation in this file already carries.  The ln evaluates
    JVM-side in whole-stage codegen (~40 float ops/row, no UDF).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = d.select("doc_id", F.split(F.col("text"), " ").alias("ts"))
    n = F.size(F.col("ts"))
    bg = (ts.where(n >= 2)
          .select("doc_id",
                  F.posexplode(
                      F.zip_with(F.slice(F.col("ts"), 1, n - 1),
                                 F.slice(F.col("ts"), 2, n - 1),
                                 lambda a, b: F.struct(a.alias("w1"),
                                                       b.alias("w2"))))
                  .alias("pos", "bgram"))
          .select("doc_id", "pos", "bgram.w1", "bgram.w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (ts.select(F.explode("ts").alias("w"))
             .agg(F.countDistinct("w").alias("v")))
    logp = (ln_portable_int(F.col("c2") + 1)
            - ln_portable_int(F.col("c1") + F.col("v")))
    scored = (bg.join(c2, ["w1", "w2"]).join(cctx, ["w1"])
              .crossJoin(F.broadcast(vocab))
              .select("doc_id", "pos", logp.alias("logp")))
    folded = F.aggregate(
        F.transform(F.sort_array(F.collect_list(F.struct("pos", "logp"))),
                    lambda x: x["logp"]),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round((-folded) / F.col("n_bigrams").cast("double"), 6)
                  .alias("cross_entropy")))


# Hashed-n-gram bucket count for q_dsir_weights: 3 hex chars of the
# md5 = 4096 buckets.  FIXED size by construction — that is DSIR's
# design point (the "model" never grows with the corpus), and why
# the broadcast hints below are safe at ANY scale, unlike the
# vocab-sized tfidf relation the r4 ADVICE de-hinted.
_DSIR_K = 4096


def q_dsir_weights(spark, sf_dir):
    """Data Selection via Importance Resampling (Xie et al. 2023,
    NeurIPS — the DSIR pretraining-data filter): score every document
    by the log importance ratio of a hashed-n-gram bag model of a
    TARGET distribution (here: the corpus's lang='en' slice, standing
    in for the high-quality reference corpus) against the raw corpus
    distribution.  Features = unigrams + bigrams hashed into K=4096
    md5 buckets; per-gram term = ln p_target(b) - ln p_raw(b) with
    add-one smoothing; doc score = sum over the doc's gram instances.
    Output: (doc_id, n_grams, logweight, avg_logweight, selected)
    with selected = (raw sum > 0), i.e. the doc leans target.

    Determinism: every ln argument is an integer (count+1 or
    total+K), so both engines evaluate the bit-portable
    ln_portable_int; per-doc sums fold in gram-position order
    (unigrams first, then bigrams — one concatenated array drives
    posexplode), so even the float columns are bit-exact.

    Scale shape: ONE exploded-gram scan feeds both bucket-count
    aggregations (map-side-combinable partial counts into at most
    4096 groups) and the scoring join.  Because the bucket relations
    are CONSTANT-SIZE (K rows regardless of corpus size), the
    explicit F.broadcast hints are safe at 10^12 docs — this is
    exactly the case where a hint is correct, in contrast to the
    vocab-sized tfidf join where a hint would force a driver OOM at
    web scale (r4 ADVICE).  The two totals are one-row scalars.  The
    per-doc reassembly is bounded by document length.  No target-side
    docs? nt=0 degrades smoothly (add-one smoothing keeps every ln
    argument >= 1).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    K = _DSIR_K
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    n = F.size(ts)
    grams = F.concat(
        ts, F.zip_with(F.slice(ts, 1, n - 1), F.slice(ts, 2, n - 1),
                       lambda a, b: F.concat_ws(" ", a, b)))
    x = (d.select("doc_id", "lang",
                  F.posexplode(grams).alias("pos", "gram"))
         .select("doc_id", "lang", "pos",
                 F.conv(F.substring(F.md5(F.col("gram")), 1, 3), 16, 10)
                  .cast("bigint").alias("bucket")))
    cq = x.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq"))
    ct = (x.where(F.col("lang") == "en")
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct")))
    tot = cq.agg(F.coalesce(F.sum("cq"), F.lit(0)).alias("nq")).crossJoin(
        ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")))
    lw = ((ln_portable_int(F.coalesce(F.col("ct"), F.lit(0)) + 1)
           - ln_portable_int(F.col("nt") + K))
          - (ln_portable_int(F.col("cq") + 1)
             - ln_portable_int(F.col("nq") + K)))
    scored = (x.join(F.broadcast(cq), "bucket")
              .join(F.broadcast(ct), "bucket", "left")
              .crossJoin(F.broadcast(tot))
              .select("doc_id", "pos", lw.alias("lw")))
    folded = F.aggregate(
        F.transform(F.sort_array(F.collect_list(F.struct("pos", "lw"))),
                    lambda s: s["lw"]),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.round(folded, 6).alias("logweight"),
                 F.round(folded / F.count(F.lit(1)).cast("double"), 6)
                  .alias("avg_logweight"),
                 (folded > F.lit(0.0)).alias("selected")))


# Per-source token budget for q_mixture_budget_sample, sized so the
# fixed 500-doc corpus (~1100 tokens/source) genuinely splits into
# kept and dropped docs.
_MIX_BUDGET = 500


def q_mixture_budget_sample(spark, sf_dir):
    """Deterministic mixture sampling under per-source token budgets:
    every training-data pipeline caps each source's contribution
    (DoReMi-style mixture weights realized as token budgets).  Docs
    are visited in a deterministic pseudo-random order within their
    source (shuffle key = md5(doc_id) — reproducible across runs and
    engines), and a doc is kept iff the tokens accumulated BEFORE it
    are still under the budget (overshoot bounded by one document, so
    the kept set is exactly a prefix of the shuffled order).  Output:
    (doc_id, source, n_tok, cum_before, kept) for every doc.

    Scale shape: the naive form is a Window partitionBy(source) — a
    per-source sort, i.e. ONE task per source, and a 10^12-doc corpus
    with 20 sources is a 20-task skew disaster.  Instead the keyed
    two-level scan (the q_sequence_pack pattern, generalized to a
    grouped prefix-sum): the shuffle key's FIRST BYTE is the bucket,
    and because the bucket is a PREFIX of the key, ordering by
    (bucket, key) equals ordering by key — so per-(source, bucket)
    partial sums (256 buckets/source; 4 hex chars at web scale),
    per-source bucket offsets via a Window over the tiny
    sources x 256 relation PARTITIONED BY SOURCE (no SinglePartition
    anywhere in this plan — unlike sequence_pack's global scan, the
    keyed scan parallelizes the offset level too), broadcast back,
    and a within-bucket cumsum partitioned by (source, bucket).
    Per-source parallelism is 256 tasks regardless of source skew.
    Pinned: zero SinglePartition exchanges in the executed plan.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL (DuckDB uses the plain
    per-source window — exactness is engine-trivial there) + the
    random-corpus fuzz."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("k"))
    tok = tok.withColumn("b", F.substring("k", 1, 2))
    bs = tok.groupBy("source", "b").agg(F.sum("n_tok").alias("b_tok"))
    w_off = (Window.partitionBy("source").orderBy("b")
             .rowsBetween(Window.unboundedPreceding, -1))
    boff = bs.select("source", "b",
                     F.coalesce(F.sum("b_tok").over(w_off), F.lit(0))
                      .alias("b_off"))
    w_in = (Window.partitionBy("source", "b").orderBy("k")
            .rowsBetween(Window.unboundedPreceding, -1))
    cum = (tok.join(F.broadcast(boff), ["source", "b"])
           .select("doc_id", "source", "n_tok",
                   (F.col("b_off")
                    + F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)))
                   .alias("cum_before")))
    return cum.select("doc_id", "source", "n_tok", "cum_before",
                      (F.col("cum_before") < F.lit(_MIX_BUDGET))
                      .alias("kept"))


# Portable exp — the twin of ln_portable_int, for the same reason
# (engine libms disagree in the last ulp): k = floor(x/ln2 + 1/2)
# (identical double ops -> identical k on both engines), r = x - k*ln2
# in [-ln2/2, ln2/2], exp(r) via a 14-term Taylor Horner, times the
# exact 2^k.  Matched pair with oracle_sql._exp_sql; bit parity
# pinned in test_exp_portable_cross_engine (~4 ulp accuracy
# measured).  Valid for |x| <~ 700 (double overflow), far beyond the
# loss magnitudes it is used on.
_INV_FACT = (0.5,
             0.16666666666666666, 0.041666666666666664,
             0.008333333333333333, 0.001388888888888889,
             0.0001984126984126984, 2.48015873015873e-05,
             2.7557319223985893e-06, 2.755731922398589e-07,
             2.505210838544172e-08, 2.08767569878681e-09,
             1.6059043836821613e-10, 1.1470745597729725e-11)


def exp_portable(x):
    """Bit-portable exp of a double column (|x| <~ 700)."""
    k = F.floor(x / F.lit(_LN2) + F.lit(0.5))
    r = x - k.cast("double") * F.lit(_LN2)
    p = F.lit(_INV_FACT[-1])
    for c in reversed(_INV_FACT[:-1]):
        p = p * r + F.lit(c)
    er = F.lit(1.0) + r * (F.lit(1.0) + r * p)
    return er * F.pow(F.lit(2.0), k.cast("double"))


def q_domain_reweight(spark, sf_dir):
    """DoReMi-style domain reweighting (Xie, Pham et al. 2023): one
    exponentiated-gradient step over per-domain loss — each source's
    mixture weight w_d proportional to exp(eta * L_d) (uniform prior,
    eta = 1), where L_d is the source's mean bigram-LM cross-entropy
    from q_lm_perplexity (high-loss domains get UPweighted so the
    model trains where it is weakest — DoReMi's excess-loss signal,
    with this corpus-trained LM standing in for the proxy/reference
    model pair).  Output: (source, n_docs, avg_ce, weight), weights
    summing to 1.

    Determinism — two portable pieces beyond the ln story:
    (1) FIXED-POINT EXACT AGGREGATION: the per-source mean of the
    per-doc CE doubles would be order-dependent under float SUM (and
    an ordered collect_list fold is unbounded at web per-source doc
    counts).  The CE values are already ROUND(..., 6), so
    CAST(ROUND(ce * 1e6) AS BIGINT) is lossless; BIGINT sums are
    associative-exact, so ANY aggregation order gives the same sum —
    the scalable alternative to the ordered-fold pattern (headroom:
    2^53 / 1e6 ~ 9e9 CE units per source before overflow; at larger
    scale, sum into DECIMAL).  (2) exp_portable (above) for the EG
    step, and the tiny normalizer Z re-uses the same fixed-point
    trick at 1e9 resolution over ROUND(raw, 9) so the final division
    is identical on both engines.

    Scale shape: the heavy part is lm_perplexity (audited
    separately); on top of it sits one doc_id join against the
    (doc_id, source) projection and a partial-aggregated rollup to
    #domains rows — everything after that is constant-size.

    Gate note: ships in EXTRA_QUERIES; dual-engine checked via
    EXTRA_ORACLE_SQL + the random-corpus fuzz."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ce = q_lm_perplexity(spark, sf_dir)
    per = (ce.join(d, "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.round(F.col("cross_entropy") * 1e6, 0)
                      .cast("bigint")).alias("s_micro")))
    avg = (per.select(
        "source", "n_docs",
        (F.col("s_micro").cast("double")
         / (F.col("n_docs").cast("double") * F.lit(1e6))).alias("avg_ce")))
    raw9 = F.round(exp_portable(F.col("avg_ce")), 9)
    scored = avg.select("source", "n_docs", "avg_ce",
                        raw9.alias("raw9"))
    z = scored.agg(F.sum(F.round(F.col("raw9") * 1e9, 0).cast("bigint"))
                   .alias("z_micro"))
    return (scored.crossJoin(F.broadcast(z))
            .select("source", "n_docs",
                    F.round(F.col("avg_ce"), 6).alias("avg_ce"),
                    F.round(F.col("raw9")
                            / (F.col("z_micro").cast("double") / F.lit(1e9)),
                            6).alias("weight")))


def _media_after(p):
    """Deterministic synthetic media slot: a media element follows
    token position p of doc_id iff the first hex digit of
    md5('doc_id:p') is '0' (~1/16 of positions).  md5 is the one
    corpus-independent PRF both engines share bit-for-bit; an
    arithmetic mod rule would place media at a FIXED residue (gap
    exactly m apart — no adjacency to filter on)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          p.cast("string"))), 1, 1) == "0"


def q_interleaved_filter(spark, sf_dir):
    """Interleaved image-text document curation (the OBELICS
    [Laurencon et al. 2023] / MMC4 [Zhu et al. 2023] filters): for
    documents carrying an interleaved media stream, compute the
    media-side quality signals — media count, media density, adjacent
    media runs, tokens-per-media — and one keep/drop decision with the
    first failing rule as the reason (the curate_decisions cascade
    pattern): no_text (< 5 tokens) > no_media (interleaved training
    needs >= 1 image) > media_dense (over 1 media per 4 tokens — the
    image-stuffed-gallery shape MMC4 drops) > media_adjacent (images
    with no text between them — OBELICS collapses/drops these) > keep.
    Output: (doc_id, n_tokens, n_media, n_adjacent, tok_per_media
    [-1 when no media], kept, reason).

    The documents table carries no media column, so the media stream
    is synthesized deterministically per (doc_id, position) via
    _media_after — the same interleaving contract the flagship span
    pipeline materializes for real (pipeline.py threads media_refs
    through the block walk in document order); this operator is the
    curation pass that would sit in front of it.

    Determinism: every signal is an exact integer off the md5 PRF;
    tok_per_media is one double division of exact BIGINTs, round(6).

    Scale shape: ZERO shuffles — one narrow per-row scan-project
    (positions are a bounded per-doc sequence expression, the hash
    work is O(tokens) exactly like every tokenizing operator here);
    at 10^12 docs this is the embarrassingly-parallel shape.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    base = d.select("doc_id", n.alias("n"))
    n_media = F.size(F.filter(F.sequence(F.lit(1), F.col("n")),
                              _media_after))
    # sequence(1, 0) runs DESCENDING in Spark — guard the n == 1 case.
    n_adj = F.when(F.col("n") >= 2, F.size(F.filter(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda p: _media_after(p) & _media_after(p + F.lit(1))))) \
        .otherwise(F.lit(0))
    m = base.select("doc_id", "n", n_media.alias("n_media"),
                    n_adj.alias("n_adj"))
    reason = (F.when(F.col("n") < 5, "no_text")
              .when(F.col("n_media") == 0, "no_media")
              .when(4 * F.col("n_media") > F.col("n"), "media_dense")
              .when(F.col("n_adj") > 0, "media_adjacent")
              .otherwise("keep"))
    tpm = F.when(F.col("n_media") == 0, F.lit(-1.0)).otherwise(
        F.round(F.col("n").cast("double")
                / F.col("n_media").cast("double"), 6))
    return m.select(
        "doc_id", F.col("n").cast("bigint").alias("n_tokens"),
        F.col("n_media").cast("bigint").alias("n_media"),
        F.col("n_adj").cast("bigint").alias("n_adjacent"),
        tpm.alias("tok_per_media"), reason.alias("reason"),
        (reason == "keep").alias("kept"))


def _masked_at(p):
    """Deterministic corruption mask: token position p of doc_id is
    masked iff the first TWO hex digits of md5('m:doc_id:p') land
    below 0x28 (= 40/256 ~ 15.6%, the T5 corruption-rate
    neighborhood).  Same PRF family as _media_after, different
    prefix so the two streams are independent."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit("m"),
                          F.col("doc_id").cast("string"),
                          p.cast("string"))), 1, 2) < "28"


def q_span_corruption(spark, sf_dir):
    """T5 span-corruption length accounting (Raffel et al. 2020):
    given the deterministic ~15% token mask, masked positions
    coalesce into SPANS (maximal masked runs), each span is replaced
    by one sentinel in the encoder input and reproduced after its
    sentinel in the decoder target — so inputs_len = n_tokens -
    n_masked + n_spans and targets_len = n_masked + n_spans + 1 (the
    final EOS).  Pipelines precompute exactly these two lengths to
    choose packed batch geometry (the T5 codebase's
    random_spans_helper solves for them in closed form); this
    operator materializes them per document.  Output: (doc_id,
    n_tokens, n_masked, n_spans, mask_rate, inputs_len, targets_len).

    Determinism: the mask is the shared md5 PRF — every count is an
    exact integer; mask_rate is one exact-operand division, round(6).

    Scale shape: ZERO shuffles — per-row position arithmetic (a span
    START is a masked position whose predecessor is unmasked, so
    n_spans needs no sequential walk, just two PRF evaluations per
    position).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    base = d.select("doc_id", n.alias("n"))
    n_masked = F.size(F.filter(F.sequence(F.lit(1), F.col("n")),
                               _masked_at))
    n_spans = F.size(F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda p: _masked_at(p)
        & ((p == 1) | ~_masked_at(p - F.lit(1)))))
    m = base.select("doc_id", "n", n_masked.alias("nm"),
                    n_spans.alias("ns"))
    return m.select(
        "doc_id", F.col("n").cast("bigint").alias("n_tokens"),
        F.col("nm").cast("bigint").alias("n_masked"),
        F.col("ns").cast("bigint").alias("n_spans"),
        F.round(F.col("nm").cast("double") / F.col("n").cast("double"), 6)
         .alias("mask_rate"),
        (F.col("n") - F.col("nm") + F.col("ns")).cast("bigint")
         .alias("inputs_len"),
        (F.col("nm") + F.col("ns") + 1).cast("bigint")
         .alias("targets_len"))


# Code-switch detection window (tokens).
_LS_W = 10


def q_lang_switches(spark, sf_dir):
    """Code-switching / language-consistency detection — multilingual
    curation drops or splits documents whose language flips
    mid-document (mixed-language pages defeat both the doc-level
    language filter and downstream tokenization): the document is cut
    into fixed _LS_W-token windows, each window is classified with
    the SAME marker-argmax rule as the doc-level language ID
    (first language in _LANG_ORDER whose marker score >= every
    other's — shared semantics, so a 1-window doc always agrees with
    q_lang_id), and adjacent windows with different predictions count
    as switches.  Output: (doc_id, n_windows, n_switches,
    switch_frac [switches / (n_windows - 1), 0 for 1-window docs],
    doc_lang).

    Determinism: all integer counts and string comparisons; the one
    division is exact-operand, round(6).

    Scale shape: ZERO shuffles — two nested per-row transforms (the
    window score structs computed ONCE per window in their own
    transform, the argmax chain over cheap field references in a
    second — the multiply-referenced-tree rule).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    n = F.size(ts)
    nw = F.floor((n + F.lit(_LS_W - 1)) / F.lit(_LS_W)).cast("int")

    def member(lg):
        # closure factory: a two-parameter lambda would receive the
        # element INDEX as the second argument (the F.filter trap).
        return lambda t: t.isin(*LANG_MARKERS[lg])

    def scores_of(arr):
        return F.struct(*[F.size(F.filter(arr, member(lg))).alias(lg)
                          for lg in _LANG_ORDER])

    def pred_of(s):
        out = F.lit(_LANG_ORDER[-1])
        for lg in reversed(_LANG_ORDER[:-1]):
            cond = None
            for other in _LANG_ORDER:
                if other == lg:
                    continue
                c = s[lg] >= s[other]
                cond = c if cond is None else (cond & c)
            out = F.when(cond, lg).otherwise(out)
        return out

    wins = F.transform(F.sequence(F.lit(0), nw - 1),
                       lambda k: F.slice(ts, k * _LS_W + 1, _LS_W))
    b1 = d.select("doc_id", nw.alias("nw"),
                  F.transform(wins, scores_of).alias("sc"),
                  scores_of(ts).alias("doc_sc"))
    b2 = b1.select("doc_id", "nw",
                   F.transform(F.col("sc"), pred_of).alias("preds"),
                   pred_of(F.col("doc_sc")).alias("doc_lang"))
    flips = F.zip_with(
        F.slice(F.col("preds"), 1, F.col("nw") - 1),
        F.slice(F.col("preds"), 2, F.col("nw") - 1),
        lambda a, b: a != b)
    b3 = b2.select("doc_id", "nw", "doc_lang",
                   F.size(F.filter(flips, lambda x: x)).alias("nsw"))
    frac = F.when(F.col("nw") <= 1, F.lit(0.0)).otherwise(
        F.round(F.col("nsw").cast("double")
                / (F.col("nw") - 1).cast("double"), 6))
    return b3.select("doc_id", F.col("nw").cast("bigint")
                     .alias("n_windows"),
                     F.col("nsw").cast("bigint").alias("n_switches"),
                     frac.alias("switch_frac"), "doc_lang")


# Bottom-k sample size per source.
_BK_K = 5


def q_sample_bottomk(spark, sf_dir):
    """Deterministic per-source bottom-k sample — k uniform documents
    without replacement per source, reproducible across runs and
    engines: keep each source's _BK_K docs with the smallest
    md5(doc_id) (the bottom-k sketch; because md5 is a fixed PRF the
    sample is simultaneously a random sample AND a stable one —
    reruns, resumes and the oracle all select the same docs; contrast
    sample_stratified's fixed-RATE predicate, which cannot promise a
    fixed SIZE).  Output: (source, rank, doc_id, h).

    Scale shape: the naive per-source window is one task per source
    (the mixture_budget_sample skew lesson), so the selection is
    TWO-LEVEL — per (source, first-hex-digit-bucket) bottom-k first
    (parallelism 16x sources; 256x with a 2-hex bucket at web
    scale), then bottom-k over the tiny source x 16 x k candidate
    relation.  Both levels are rank-limited windows, which Spark
    executes as WindowGroupLimit (plan-pinned): partial per-partition
    top-k BEFORE the sort materializes — the window-shaped
    TakeOrdered.  Each level's filter keeps every true bottom-k row
    (a source's k smallest hashes occupy at most k buckets), so the
    two-level result provably equals the one-level window the oracle
    runs.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    base = d.select("source", "doc_id",
                    F.md5(F.col("doc_id").cast("string")).alias("h"))
    lvl1 = base.withColumn("bucket", F.substring(F.col("h"), 1, 1))
    w1 = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
    cand = (lvl1.withColumn("r1", F.row_number().over(w1))
            .where(F.col("r1") <= _BK_K))
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    return (cand.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= _BK_K)
            .select("source", F.col("rank").cast("bigint").alias("rank"),
                    "doc_id", "h"))


def q_bpe_merges(spark, sf_dir):
    """Round-1 BPE merge statistics (Sennrich, Haddow & Birch 2016):
    the top-10 adjacent character pairs by corpus frequency — the
    argmax of this table IS the first merge a BPE tokenizer trainer
    performs, and the full ranking is the merge candidate list
    (successive rounds re-tokenize and recount; at corpus scale each
    round is exactly this distributed job over the current symbol
    sequences, driver-looped like connected components).  Output:
    (pair, n_occurrences), ties by pair.

    Determinism: pure string/integer — pair extraction via the
    column-form substr both engines share, counts exact.

    Scale shape: one exploded char-pair scan into a map-side partial
    count, then TakeOrderedAndProject for the top-10 — token_topk's
    audited shape one level down the tokenization stack (~5 chars/
    token => ~5x the rows of a token count, same plan).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    n = F.length(F.col("w"))
    pairs = (w.where(n >= 2)
             .select(F.explode(F.transform(
                 F.sequence(F.lit(1), n - 1),
                 lambda i: F.substr(F.col("w"), i, F.lit(2))))
                 .alias("pair")))
    return (pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .limit(10))


def q_curate_report(spark, sf_dir):
    """Per-source curation report — the dashboard every production
    pipeline publishes after a curation run (what did each source
    lose, and to which rule?): the full curate_decisions cascade
    joined back to the document axis and rolled up per
    (source, reason) with document/token counts and each reason's
    within-source document fraction.  Output: (source, reason,
    n_docs, n_tokens, frac_docs).

    Determinism: counts/token sums are exact BIGINTs; frac_docs is
    one exact-operand division (the within-source total is an exact
    window SUM over BIGINTs), round(6).

    Scale shape: everything heavy is the separately-audited
    curate_decisions chain; on top sit one doc_id join against the
    (doc_id, source, n_tokens) projection, a partial-aggregated
    rollup to #sources x #reasons rows, and a window over that TINY
    relation (per-source partitions — never SinglePartition).  The
    composition proves the gate's decisions aggregate without any
    extra pass over the text.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    cd = q_curate_decisions(spark, sf_dir).select("doc_id", "reason")
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("nt"))
    per = (cd.join(d, "doc_id")
           .groupBy("source", "reason")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("n_tokens")))
    w = Window.partitionBy("source")
    return per.select(
        "source", "reason", F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double"), 6)
         .alias("frac_docs"))


# Bloom geometry: m bits in 32-bit words, k hash functions.
_BLOOM_M = 65536
_BLOOM_K = 4


def q_dedup_bloom(spark, sf_dir):
    """Deterministic Bloom-filter sketch of the corpus's exact-dedup
    fingerprints — the memory-bounded membership structure every
    incremental web-crawl dedup keeps between snapshots (a new
    crawl's docs probe the standing filter before any shuffle; false
    positives only cost a recheck, never a lost doc): k = 4 bit
    positions per md5(text) key (four disjoint 8-hex-digit slices of
    the SAME md5, each mod m = 65536), bits packed into 32-bit words.
    Output: one row per NON-EMPTY word — (word_idx, bits) — the
    sparse filter; the consumer ORs snapshots together (BIT_OR is the
    merge, exactly like the HLL register MAX).

    Determinism: bit values are exact powers of two below 2^32
    (pow(2.0, bit) is integer-exact in a double; 32-bit words keep
    the sign bit untouched so BIGINT BIT_OR agrees across engines);
    everything else is md5 + integer arithmetic.

    Scale shape: ONE map-side-combinable BIT_OR aggregation from the
    key scan to at most m/32 = 2048 rows — the classic mergeable
    -sketch shape (partial filters OR per partition before the
    exchange); the filter itself broadcasts for probing.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    idxs = F.array(*[
        (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
         % _BLOOM_M)
        for i in range(_BLOOM_K)])
    ex = d.select(F.explode(idxs).alias("idx"))
    bit = (F.col("idx") % 32).cast("int")
    word = (F.col("idx") - F.col("idx") % 32) / F.lit(32)
    wb = ex.select(word.cast("bigint").alias("word_idx"),
                   F.pow(F.lit(2.0), bit).cast("bigint").alias("b"))
    return (wb.groupBy("word_idx")
            .agg(F.bit_or("b").alias("bits")))


# Winnowing geometry: k-gram size and winnow window (guarantee: any
# shared run of >= _WIN_W + _WIN_K - 1 tokens shares a fingerprint).
_WIN_K = 3
_WIN_W = 4


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm; the storage-efficient local
    fingerprinting used for code/plagiarism dedup in LLM data
    pipelines): hash every _WIN_K-token gram, slide a _WIN_W-hash
    window and keep each window's MINIMUM hash — the guarantee is
    that any match of >= _WIN_W + _WIN_K - 1 tokens between two
    documents shares at least one kept fingerprint, while storage
    drops to ~2/(_WIN_W+1) of the gram count.  Output: (doc_id,
    n_grams, n_kept [distinct winnowed hashes], fp_digest [md5 over
    the sorted kept set — a comparable whole-document fingerprint]).
    Docs with fewer grams than the window keep their global minimum
    (the standard short-doc degeneration); docs shorter than one gram
    keep nothing (digest of the empty string).

    Determinism: hashes are md5 hex strings — minima and sorts are
    plain VARCHAR comparisons, identical in both engines; no floats
    anywhere.

    Scale shape: ZERO shuffles — per-row array arithmetic (the
    winnow is O(n * w) string compares; the classic deque O(n) form
    is an imperative micro-optimization the JVM expression wins on
    anyway at w = 4).  The kept-set digest makes corpus-level dedup a
    plain exact groupBy on fp_digest downstream.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    n = F.size(ts)
    grams = F.when(n >= _WIN_K, F.transform(
        F.sequence(F.lit(1), n - F.lit(_WIN_K - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(ts, i, _WIN_K))))) \
        .otherwise(F.array().cast("array<string>"))
    g1 = d.select("doc_id", grams.alias("g"))
    ng = F.size(F.col("g"))
    kept = (F.when(ng >= _WIN_W, F.transform(
                F.sequence(F.lit(1), ng - F.lit(_WIN_W - 1)),
                lambda j: F.array_min(F.slice(F.col("g"), j, _WIN_W))))
            .when(ng >= 1, F.array(F.array_min(F.col("g"))))
            .otherwise(F.array().cast("array<string>")))
    g2 = g1.select("doc_id", ng.cast("bigint").alias("n_grams"),
                   F.array_sort(F.array_distinct(kept)).alias("kept"))
    return g2.select(
        "doc_id", "n_grams",
        F.size(F.col("kept")).cast("bigint").alias("n_kept"),
        F.md5(F.concat_ws("", F.col("kept"))).alias("fp_digest"))


def q_hard_negatives(spark, sf_dir):
    """Contrastive training-pair mining over the LSH candidate
    structure — the data-side half of dense-retriever / embedding
    training (ANCE [Xiong et al. 2021] mines hard negatives from the
    current index exactly like this; DPR/SimCSE consume the pairs):
    for every anchor vector, its top-1 most-similar SAME-label
    bucket-mate (the positive) and its top-2 most-similar
    DIFFERENT-label bucket-mates (the hard negatives — similar
    embeddings the model must learn to separate).  Output: (vec_id,
    kind ['pos'|'neg'], rank, neighbor, cos_sim); anchors with no
    same-label (resp. different-label) candidate emit no rows of that
    kind (the LSH-recall contract).

    Determinism: identical candidate generation and raw-cosine
    ranking as q_ann_graph_knn, partitioned by (anchor, kind).

    Scale shape: same as the kNN graph — per-(band, bucket) self-join
    over ONE reused banding subplan, label lookup rides the existing
    embedding joins (no extra shuffle), per-(src, kind) row_number
    top-k.  This is how production retriever refreshes mine negatives
    at billion-passage scale: block with ANN, rank exactly within
    blocks.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding",
                                               "label")
    band_arr = F.array(*[_band_bucket(b) for b in range(_ND_BANDS)])
    bands = (e.select("vec_id", "embedding")
             .select("vec_id", F.posexplode(band_arr).alias("band", "v")))
    a = bands.alias("a")
    c = bands.alias("c")
    cand = (a.join(c, (F.col("a.band") == F.col("c.band"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.vec_id") != F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("src"),
                    F.col("c.vec_id").alias("dst"))
            .distinct())
    es = e.select(F.col("vec_id").alias("src"),
                  F.col("embedding").cast("array<double>").alias("es"),
                  F.col("label").alias("ls"))
    ed = e.select(F.col("vec_id").alias("dst"),
                  F.col("embedding").cast("array<double>").alias("ed"),
                  F.col("label").alias("ld"))
    cos = _cosine(F.col("es"), F.col("ed"))   # sequential fold = oracle
    scored = (cand.join(es, "src").join(ed, "dst")
              .select("src", "dst", cos.alias("cos_raw"),
                      F.when(F.col("ls") == F.col("ld"), "pos")
                       .otherwise("neg").alias("kind")))
    w = Window.partitionBy("src", "kind").orderBy(F.desc("cos_raw"),
                                                  F.asc("dst"))
    keep = F.when(F.col("kind") == "pos", 1).otherwise(2)
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= keep)
            .select(F.col("src").alias("vec_id"), "kind",
                    F.col("rank").cast("bigint").alias("rank"),
                    F.col("dst").alias("neighbor"),
                    F.round(F.col("cos_raw"), 6).alias("cos_sim")))


# Temperature exponent for source-mixture sampling (XLM-R's alpha).
_TEMP_ALPHA = 0.3


def q_mixture_temperature(spark, sf_dir):
    """Temperature-scaled source sampling weights (Conneau et al.
    2020 / XLM-R, mT5): w_d proportional to (n_tokens_d)^alpha with
    alpha = 0.3 — the standard fix for low-resource sources being
    drowned out by proportional sampling (the third mixture lever
    next to mixture_budget_sample's hard budgets and domain_reweight's
    loss-driven DoReMi step).  Output: (source, n_docs, n_tokens,
    weight_prop, weight_temp) — proportional vs temperature-flattened
    weights, each summing to 1.

    Determinism: n^alpha = exp_portable(alpha * ln_portable_int(n)) —
    one multiply between two portable fixed-order expressions;
    weight_prop is a division of exact BIGINTs; both normalizers ride
    the fixed-point BIGINT trick (ROUND(raw, 9) * 1e9 sums — the
    domain_reweight pattern, associative-exact in any aggregation
    order).

    Scale shape: one map-side-combinable groupBy(source) to #sources
    rows, a one-row fixed-point normalizer broadcast back — constant
    work after the partial agg at any corpus size.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    per = (d.select("source",
                    F.size(F.split(F.col("text"), " "))
                     .cast("bigint").alias("nt"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("n_tokens")))
    # exp_portable re-references its argument ~15x (range reduction +
    # Horner), so the ln tree must land in its OWN projection first —
    # inlining it at every use bloats the task binary ~15x (measured
    # 13.6 MiB; CollapseProject keeps multiply-referenced non-cheap
    # columns separate).
    al = per.select("source", "n_docs", "n_tokens",
                    (F.lit(_TEMP_ALPHA)
                     * ln_portable_int(F.col("n_tokens"))).alias("al"))
    scored = al.select("source", "n_docs", "n_tokens",
                       F.round(exp_portable(F.col("al")), 9)
                        .alias("raw9"))
    z = scored.agg(
        F.sum("n_tokens").alias("tot"),
        F.sum(F.round(F.col("raw9") * 1e9, 0).cast("bigint"))
         .alias("z_micro"))
    return (scored.crossJoin(F.broadcast(z))
            .select("source", "n_docs", "n_tokens",
                    F.round(F.col("n_tokens").cast("double")
                            / F.col("tot").cast("double"), 6)
                     .alias("weight_prop"),
                    F.round(F.col("raw9")
                            / (F.col("z_micro").cast("double")
                               / F.lit(1e9)), 6).alias("weight_temp")))


# k-NN graph degree (neighbors kept per vector).
_KNN_K = 4


def q_ann_graph_knn(spark, sf_dir):
    """Approximate k-NN GRAPH construction over the banded sign-LSH
    candidate structure — the seed graph of NN-Descent / HNSW-style
    index builds and the neighbor graph that graph-clustering dedup
    pipelines consume: for EVERY vector, its top-_KNN_K bucket-mates
    by exact cosine (vs embedding_near_dup, which emits only
    threshold-crossing PAIRS — a graph needs per-node top-k whatever
    the similarity).  Output: (vec_id, rank, neighbor, cos_sim), rank
    1.._KNN_K by (cosine desc, neighbor id asc); vectors whose buckets
    hold no other vector emit no rows (the LSH-recall contract, same
    as near-dup: candidates are DEFINED by the banding).

    Determinism: candidates from the same one-scan banding as
    embedding_near_dup (both directions here, src != dst); ranking
    orders on the RAW pinned-order cosine (bit-identical across
    engines) with neighbor-id ties.

    Scale shape: the self-join is per (band, bucket) — each task
    touches one bucket's vectors, never the corpus, and both join
    sides reuse ONE banding subplan/exchange; the per-source top-k is
    a row_number window riding the src key (bounded by bucket sizes,
    the banding's selectivity knob).  At 10^12 vectors this is the
    standard LSH-blocked kNN-graph build; hot buckets salt exactly
    like the near-dup join.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    band_arr = F.array(*[_band_bucket(b) for b in range(_ND_BANDS)])
    bands = e.select("vec_id", F.posexplode(band_arr).alias("band", "v"))
    a = bands.alias("a")
    c = bands.alias("c")
    cand = (a.join(c, (F.col("a.band") == F.col("c.band"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.vec_id") != F.col("c.vec_id")))
            .select(F.col("a.vec_id").alias("src"),
                    F.col("c.vec_id").alias("dst"))
            .distinct())
    es = e.select(F.col("vec_id").alias("src"),
                  F.col("embedding").cast("array<double>").alias("es"))
    ed = e.select(F.col("vec_id").alias("dst"),
                  F.col("embedding").cast("array<double>").alias("ed"))
    cos = _cosine(F.col("es"), F.col("ed"))   # sequential fold = oracle
    scored = (cand.join(es, "src").join(ed, "dst")
              .select("src", "dst", cos.alias("cos_raw")))
    w = Window.partitionBy("src").orderBy(F.desc("cos_raw"),
                                          F.asc("dst"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _KNN_K)
            .select(F.col("src").alias("vec_id"),
                    F.col("rank").cast("bigint").alias("rank"),
                    F.col("dst").alias("neighbor"),
                    F.round(F.col("cos_raw"), 6).alias("cos_sim")))


def q_quality_entropy(spark, sf_dir):
    """Per-document token Shannon entropy — the classic repetition /
    boilerplate signal (low entropy = a few tokens dominate; used
    alongside the Gopher repetition rules in web-corpus quality
    filtering): H = ln(n) - (1/n) * sum_w c_w ln(c_w) over the
    document's token counts, plus the normalized H / ln(n) in [0, 1].
    Output: (doc_id, n_tokens, n_distinct, entropy, entropy_norm
    [0 for single-token docs, where ln(n) = 0]).

    Determinism: token counts come from run-boundary differencing
    over the SORTED token array (see the in-body comment), so the
    c*ln(c) float sum runs in token-sorted order on both engines
    (array_sort here == list(... ORDER BY w) in DuckDB, both binary
    collation on the ASCII corpus); every ln is ln_portable_int;
    c = 1 contributes an exact +0.0 so the list_sum-vs-0.0-seed
    conventions agree.

    Scale shape: ZERO shuffles — per-row sort + O(len) array
    arithmetic; the alternative explode -> groupBy(doc, w) -> regroup
    would shuffle the entire token stream twice for a per-doc-local
    quantity.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    # Run lengths WITHOUT a fold: over the sorted array, a run ends at
    # every 0-based index i where st[i] != st[i+1] (F.get returns NULL
    # past the end — element_at would raise under ANSI mode — and the
    # explicit i == n-1 arm closes the last run), and the count array
    # is the first difference of those boundary indexes.  Everything
    # is O(len) array arithmetic; the fold alternative re-allocates
    # the counts array per element (O(d^2) copies, measured 5x
    # slower), and inlining the 40-op portable-ln tree into a fold
    # body additionally blows the JVM method limit (measured: ERROR
    # CodeGenerator + interpreted fallback).  The ln terms evaluate in
    # one flat transform over the counts, in run order == token-sorted
    # order (the oracle's list(... ORDER BY w)).
    s0 = d.select("doc_id", F.array_sort(ts).alias("st"),
                  F.size(ts).cast("bigint").alias("n"),
                  F.size(F.array_distinct(ts)).cast("bigint").alias("nd"))
    ends = F.filter(
        F.sequence(F.lit(0).cast("bigint"), F.col("n") - 1),
        lambda i: (i == F.col("n") - 1)
        | (F.get(F.col("st"), i) != F.get(F.col("st"), i + 1)))
    sb = s0.select("doc_id", "n", "nd", ends.alias("ends"))
    counts = F.transform(
        F.col("ends"),
        lambda e, k: (e - F.when(k == 0, F.lit(-1).cast("bigint"))
                      .otherwise(F.element_at(F.col("ends"), k)))
        .cast("bigint"))
    s1 = sb.select("doc_id", "n", "nd", counts.alias("cs"))
    s2 = s1.select(
        "doc_id", "n", "nd",
        F.aggregate(
            F.transform(F.col("cs"),
                        lambda c: c.cast("double") * ln_portable_int(c)),
            F.lit(0.0), lambda acc, x: acc + x).alias("s0"))
    s3 = s2.select("doc_id", "n", "nd", F.col("s0").alias("s"),
                   ln_portable_int(F.col("n")).alias("lnn"))
    s4 = s3.select("doc_id", "n", "nd", "lnn",
                   (F.col("lnn") - F.col("s")
                    / F.col("n").cast("double")).alias("hr"))
    return s4.select(
        "doc_id", F.col("n").alias("n_tokens"),
        F.col("nd").alias("n_distinct"),
        F.round(F.col("hr"), 6).alias("entropy"),
        F.when(F.col("n") >= 2,
               F.round(F.col("hr") / F.col("lnn"), 6))
         .otherwise(F.lit(0.0)).alias("entropy_norm"))


def q_quality_classifier(spark, sf_dir):
    """Linear content-vs-boilerplate classifier scoring — the
    classifier stage of the reference architecture (a pretrained
    model scoring each unit, here fastText-style [Joulin et al. 2017]
    hashed bag-of-words; GPT-3/CCNet run exactly this shape as their
    corpus quality filter).  Each token hashes to one of 101 fixed
    pseudo-weights in [-0.5, 0.5) (md5-derived — a deterministic
    stand-in for trained coefficients: the operator under test is the
    scoring plumbing, not the fit), the document logit is intercept +
    the position-ordered weight sum, and the score is a portable
    sigmoid.  Output: (doc_id, n_tokens, logit, score, label) with
    label = 'content' iff the RAW logit >= 0 (no float-threshold
    ambiguity).

    Determinism: the weight sum folds in position order (the
    ann_cosine sequential-accumulation pattern — list_sum's order on
    the DuckDB side); weights are single divisions of exact integers
    (101 odd, so no weight is ever an exact +-0.0 to trip the
    zero-sign convention); sigmoid = 1/(1 + exp_portable(-z)) — the
    same fixed-order IEEE expression on both engines.

    Scale shape: ZERO shuffles — per-row array hash + fold, O(tokens)
    per doc like every tokenizing operator here; a real trained
    weight vector arrives as a broadcast map without changing the
    plan (the fastText production deployment shape).

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")

    def w(tok):
        return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
                .cast("bigint") % 101).cast("double") / 101.0 - 0.5

    z = F.lit(-0.05) + F.aggregate(
        F.transform(ts, w), F.lit(0.0),
        lambda acc, x: acc + x)
    s1 = d.select("doc_id", F.size(ts).cast("bigint").alias("n_tokens"),
                  z.alias("z"))
    score = F.lit(1.0) / (F.lit(1.0) + exp_portable(-F.col("z")))
    return s1.select(
        "doc_id", "n_tokens", F.round(F.col("z"), 6).alias("logit"),
        F.round(score, 6).alias("score"),
        F.when(F.col("z") >= 0, "content").otherwise("boilerplate")
         .alias("label"))


# Multimodal packing geometry: context capacity and the fixed token
# cost of one media element (the vision-encoder patch budget).
_PACK_C = 64
_PACK_MCOST = 16


def q_interleaved_pack(spark, sf_dir):
    """Multimodal sequence packing over the interleaved text+media
    stream — the sample-assembly stage of interleaved training
    pipelines (Flamingo/OBELICS-style): each document's ordered spans
    (maximal text runs between media slots, media elements at a fixed
    _PACK_MCOST-token cost) are packed greedily into _PACK_C-token
    contexts where TEXT spans split freely across context boundaries
    but MEDIA spans are ATOMIC — a media element that would straddle a
    boundary pads the current context and starts in the next (an image
    cannot be half-fed to the vision encoder).  The media stream is
    the shared deterministic _media_after PRF (see
    q_interleaved_filter).  Output: one row per span — (doc_id, seq,
    kind, span_len, media_ref, pad_before, start_pos, ctx_id,
    ctx_offset), positions in the document's packed token stream.

    Determinism: all integers off the md5 PRF; no floats anywhere.

    Scale shape: packing is per-document sequential BY DEFINITION
    (each span's placement depends on the fill state before it), so
    it runs as a bounded per-doc JVM fold — O(spans) per document, no
    shuffle, no UDF; documents pack independently (embarrassingly
    parallel across the corpus), and the giant-doc escape hatch is
    the same chunked/halo path the flagship uses (sequence_pack's
    two-level scan does not apply: the padding rule is nonlinear in
    position, there is no closed-form prefix-sum).  The fold
    accumulates a plain BIGINT array of positions-after (sentinel 0),
    so each step's expression references only O(1) array-tail
    accesses of the lambda accumulator — the run-once fold rule
    quality_repetition documents; start/pad/ctx derive POST-explode
    from the emitted positions via layered selects, never by
    re-referencing the fold Column.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked (recursive-CTE DuckDB walk) via
    EXTRA_ORACLE_SQL + the random-corpus fuzz."""
    C = F.lit(_PACK_C).cast("bigint")
    d = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    base = d.select(
        "doc_id", n.alias("n"),
        F.filter(F.sequence(F.lit(1), n), _media_after).alias("mb"))

    def _prev(i):
        # element_at is 1-based, i is the 0-based transform index, so
        # element_at(mb, i) IS the previous media position.
        return F.when(i == 0, F.lit(0)).otherwise(
            F.element_at(F.col("mb"), i)).cast("bigint")

    pairs = F.flatten(F.transform(
        F.col("mb"),
        lambda p, i: F.array(
            F.struct(F.lit("text").alias("kind"),
                     (p - _prev(i)).cast("bigint").alias("len"),
                     F.lit(None).cast("string").alias("ref")),
            F.struct(F.lit("media").alias("kind"),
                     F.lit(_PACK_MCOST).cast("bigint").alias("len"),
                     F.concat(F.lit("img://"),
                              F.col("doc_id").cast("string"),
                              F.lit("/"), p.cast("string"))
                     .alias("ref")))))
    tail = F.when(F.size(F.col("mb")) == 0, F.col("n")).otherwise(
        F.col("n") - F.element_at(F.col("mb"), F.size(F.col("mb"))))
    spans = F.filter(
        F.concat(pairs, F.array(F.struct(
            F.lit("text").alias("kind"),
            tail.cast("bigint").alias("len"),
            F.lit(None).cast("string").alias("ref")))),
        lambda s: ~((s.kind == "text") & (s.len == 0)))
    sp = base.select("doc_id", spans.alias("sp"))
    folded = F.aggregate(
        F.col("sp"), F.array(F.lit(0).cast("bigint")),
        lambda acc, s: F.concat(acc, F.array(
            F.when((s.kind == "media")
                   & (F.element_at(acc, -1) % C + s.len > C),
                   F.element_at(acc, -1)
                   + (C - F.element_at(acc, -1) % C) + s.len)
            .otherwise(F.element_at(acc, -1) + s.len))),
        lambda acc: F.slice(acc, 2, F.size(acc) - 1))
    w = sp.select("doc_id", "sp", folded.alias("pa"))
    ex = w.select("doc_id", "pa",
                  F.posexplode(F.arrays_zip("sp", "pa")).alias("i", "z"))
    s1 = ex.select(
        "doc_id", (F.col("i") + 1).cast("bigint").alias("seq"),
        F.col("z.sp.kind").alias("kind"),
        F.col("z.sp.len").alias("span_len"),
        F.col("z.sp.ref").alias("media_ref"),
        (F.col("z.pa") - F.col("z.sp.len")).alias("start_pos"),
        F.when(F.col("i") == 0, F.lit(0).cast("bigint"))
         .otherwise(F.element_at(F.col("pa"), F.col("i")))
         .alias("prev_after"))
    return s1.select(
        "doc_id", "seq", "kind", "span_len", "media_ref",
        (F.col("start_pos") - F.col("prev_after")).alias("pad_before"),
        "start_pos",
        F.floor(F.col("start_pos") / C).cast("bigint").alias("ctx_id"),
        (F.col("start_pos") % C).alias("ctx_offset"))


# Overlapping-window substring-dedup window length (tokens).  Lee et
# al. use 50-token windows on BPE streams; 5 fits the toy corpus's
# 1-120-word documents while exercising the identical plan shape.
_SUB_W = 5


def q_dedup_substrings(spark, sf_dir):
    """Duplicated-substring fraction (Lee et al. 2022, 'Deduplicating
    Training Data Makes Language Models Better' — the ExactSubstr
    criterion): every OVERLAPPING _SUB_W-token window is fingerprinted,
    a window is duplicated iff its fingerprint occurs more than once in
    the corpus (across documents or repeated within one), and each
    document reports its duplicated-window fraction — the signal the
    paper cuts on.  Output: (doc_id, n_windows, n_dup, dup_frac,
    flagged), flagged iff dup_frac >= 0.3 (evaluated as the exact
    integer comparison 10*n_dup >= 3*n_windows) with docs shorter than
    the window never flagged.  Distinct from dedup_segments: that pass
    dedups fixed NON-overlapping segments first-occurrence-wins; this
    one measures how much of a document is duplicated text at every
    alignment, the paper's substring-level criterion.

    Determinism: counts are exact BIGINTs; dup_frac is one double
    division of exact operands, then round(6).

    Scale shape: the paper's suffix array is inherently sequential —
    the distributed re-expression is fingerprint-partitioned: ONE
    exploded-window scan (bounded fan-out: n-W+1 windows/doc) shuffles
    on the fingerprint for the global count, the count joins back on
    the same key (exchange reuse — the window relation shuffles once),
    and the per-doc rollup rides the doc_id key.  Giant documents fan
    out across the fingerprint space instead of hot-spotting — the
    dedup_segments/contamination shape exactly.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    base = d.select("doc_id", ts.alias("ts"), F.size(ts).alias("n"))
    wins = (base.where(F.col("n") >= _SUB_W)
            .select("doc_id", F.explode(F.transform(
                F.sequence(F.lit(1), F.col("n") - F.lit(_SUB_W - 1)),
                lambda i: F.md5(F.concat_ws(
                    " ", F.slice(F.col("ts"), i, _SUB_W))))).alias("fp")))
    cnt = wins.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    per = (wins.join(cnt, "fp")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_windows"),
                F.sum((F.col("c") > 1).cast("bigint")).alias("n_dup")))
    nw = F.coalesce(F.col("n_windows"), F.lit(0)).cast("bigint")
    nd = F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint")
    frac = F.when(nw == 0, F.lit(0.0)).otherwise(
        F.round(nd.cast("double") / nw.cast("double"), 6))
    return (base.select("doc_id").join(per, "doc_id", "left")
            .select("doc_id", nw.alias("n_windows"), nd.alias("n_dup"),
                    frac.alias("dup_frac"),
                    ((nd * 10 >= nw * 3) & (nw > 0)).alias("flagged")))


# BM25 constants (Robertson & Zaragoza 2009 defaults) and the fixed
# keyword query.  The idf is Lucene's non-negative variant
# ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1)) — a ratio of
# INTEGERS, so it evaluates as a difference of two portable integer
# lns (no float ln anywhere).
_BM25_TERMS = ("spark", "window", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval (Robertson & Zaragoza 2009; the Lucene
    practical-scoring variant): score every document against the fixed
    keyword query and return the top-10 — the lexical twin of the ANN
    suite's dense retrieval (production retrieval stacks run BOTH and
    fuse).  score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with k1 = 1.2, b = 0.75, dl = document token length, avgdl the
    corpus mean.

    Determinism: idf_t = ln((2N+2)/(2df_t+1)) is a difference of two
    ln_portable_int values (bit-identical across engines); tf/df/dl
    are exact BIGINTs; avgdl is ONE double division of exact BIGINTs;
    the per-term contributions are summed in fixed written order
    (3 terms), and every float subexpression is written with the same
    association on both engines.  Ties in the top-10 break by doc_id.

    Scale shape: per-document tf/dl are per-row array expressions (no
    explode — the query has 3 terms, not the corpus vocabulary), the
    corpus statistics (N, sum dl, per-term df) collapse to ONE row via
    a map-side partial aggregation broadcast back, and the top-10 is a
    TakeOrderedAndProject — no global sort, no shuffle of the corpus
    anywhere.  At a 10^12-doc corpus this is one narrow scan + one
    scalar broadcast; a longer query adds columns, not shuffles.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    d = _t(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    def _eq(term):
        # NB: a two-arg lambda would be read by F.filter as
        # (element, index) — close over the term instead.
        return lambda x: x == F.lit(term)

    tf_cols = [F.size(F.filter(ts, _eq(t))).cast("bigint").alias(f"tf{i}")
               for i, t in enumerate(_BM25_TERMS)]
    base = d.select("doc_id", F.size(ts).cast("bigint").alias("dl"),
                    *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
          for i in range(len(_BM25_TERMS))])
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = F.lit(0.0)
    for i in range(len(_BM25_TERMS)):
        idf = ln_portable_int(F.lit(2) * F.col("n_docs") + F.lit(2)) \
            - ln_portable_int(F.lit(2) * F.col(f"df{i}") + F.lit(1))
        tf = F.col(f"tf{i}").cast("double")
        denom = tf + F.lit(_BM25_K1) * (F.lit(1.0) - F.lit(_BM25_B)
                                        + F.lit(_BM25_B)
                                        * F.col("dl").cast("double")
                                        / avgdl)
        score = score + idf * (tf * F.lit(_BM25_K1 + 1.0)) / denom
    return (base.crossJoin(F.broadcast(stats))
            .select("doc_id", "dl", F.round(score, 6).alias("score_bm25"))
            .orderBy(F.desc("score_bm25"), F.asc("doc_id"))
            .limit(10))


# SemDeDup similarity threshold: members whose max cosine to any
# earlier-ordered cluster member reaches tau are dropped (1 - eps in
# the paper's notation, eps = 0.2).
_SEM_TAU = 0.8


def _qcos(num, na, nb):
    """Bit-portable cosine from exact BIGINT dot products: one double
    cast per operand (exact below 2^53), two IEEE sqrts, one multiply,
    one division — no accumulation order anywhere, so Spark and DuckDB
    agree to the last bit.  Zero-norm guards: two zero vectors are
    identical (sim 1), one zero vector is similar to nothing (sim 0)."""
    return (F.when((na == 0) & (nb == 0), F.lit(1.0))
            .when((na == 0) | (nb == 0), F.lit(0.0))
            .otherwise(num.cast("double")
                       / (F.sqrt(na.cast("double"))
                          * F.sqrt(nb.cast("double")))))


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of the embedding table — cluster with k-means, then
    within each cluster drop every member whose cosine similarity to
    an EARLIER-ordered member reaches tau = 0.8.  The order is the
    released implementation's: descending similarity to the cluster
    centroid (most-typical first), ties by vec_id; like that
    implementation the max is taken over ALL earlier members (kept or
    not), which needs no recursion.  Output: (vec_id, cluster,
    centroid_sim, max_prev_sim [-1 when the member is first in its
    cluster], kept).

    Determinism: clustering is the shared exact-arithmetic Lloyd
    update (_kmeans_fit); every similarity is computed on the
    floor-quantized integer vectors via _qcos — exact BIGINT dot
    products (fuzz bound: |q| <= 301, n <= 2000 => qdot(sv, sv) <
    6e14 < 2^53), so no float accumulation order exists anywhere and
    both engines agree bitwise, including the order predicate's raw
    float comparisons.

    Scale shape: the pairwise comparison is confined WITHIN clusters —
    the paper's whole point (k ~ sqrt(N) keeps expected cluster size
    ~ sqrt(N), so cluster-pairwise is O(N^1.5) not O(N^2) — at 10^12
    docs k ~ 10^6 and the per-cluster work is bounded); it is ONE
    self-join shuffled on the cluster key, partial-agg MAX per member
    (no pair materialization past the join), and a hot cluster
    fans out over the join's salt-able key, the same lever every
    bucket self-join in this file documents.  Centroids (<= 16 rows
    here, ~10^6 at web scale: still a broadcast table) are broadcast
    into both the assignment and the member-similarity joins.

    Gate note: ships in EXTRA_QUERIES (driver cap fully allocated);
    dual-engine checked via EXTRA_ORACLE_SQL + the random-corpus
    fuzz."""
    e = _t(spark, sf_dir, "embeddings")
    eq = e.select("vec_id", _quantize(F.col("embedding")).alias("qv"))
    a2, c1 = _kmeans_fit(eq)
    m = (a2.join(eq, "vec_id")
         .join(F.broadcast(c1), a2.cluster == c1.cid)
         .select("vec_id", "cluster", "qv",
                 _qdot(F.col("qv"), F.col("qv")).alias("nq"),
                 _qcos(_qdot(F.col("qv"), F.col("sv")),
                       _qdot(F.col("qv"), F.col("qv")),
                       _qdot(F.col("sv"), F.col("sv"))).alias("cs")))
    u = m.select(F.col("vec_id").alias("u_id"),
                 F.col("cluster").alias("u_cl"),
                 F.col("qv").alias("u_qv"), F.col("nq").alias("u_nq"),
                 F.col("cs").alias("u_cs"))
    v = m.select(F.col("vec_id").alias("v_id"),
                 F.col("cluster").alias("v_cl"),
                 F.col("qv").alias("v_qv"), F.col("nq").alias("v_nq"),
                 F.col("cs").alias("v_cs"))
    prior = (F.col("u_cs") > F.col("v_cs")) | \
            ((F.col("u_cs") == F.col("v_cs"))
             & (F.col("u_id") < F.col("v_id")))
    sim = _qcos(_qdot(F.col("u_qv"), F.col("v_qv")),
                F.col("u_nq"), F.col("v_nq"))
    mp = (u.join(v, (F.col("u_cl") == F.col("v_cl")) & prior)
          .groupBy("v_id").agg(F.max(sim).alias("max_prev")))
    prev = F.coalesce(F.col("max_prev"), F.lit(-1.0))
    return (m.join(mp, m.vec_id == mp.v_id, "left")
            .select(m.vec_id,
                    F.col("cluster").cast("bigint").alias("cluster"),
                    F.round(F.col("cs"), 6).alias("centroid_sim"),
                    F.round(prev, 6).alias("max_prev_sim"),
                    (prev < F.lit(_SEM_TAU)).alias("kept")))


# Driver-gate registry.  The driver's correctness gate caps at 50
# queries (CORRECTNESS_r04 silently dropped entries 51-55 — r4
# verdict #1), so this dict is kept at <= 41 entries and
# __spark_entry__.queries() prepends the 9 flagship/metrics entries
# FIRST; near-duplicate operator variants are merged into single
# multi-column/tagged relations (token_counts, doc_fingerprint,
# text_quality, channel_stats, robust_stats, ann_ivf_topk,
# dedup_simhash) so every computation stays driver-checked under the
# cap.
QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "zero_dm_sum": q_zero_dm_sum,
    "sk_estimator": q_sk_estimator,
    "tumbling_decimate": q_tumbling_decimate,
    "interval_mask_join": q_interval_mask_join,
    "union_distinct_channels": q_union_distinct_channels,
    "robust_stats": q_robust_stats,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_jaccard": q_dedup_jaccard,
    "text_quality": q_text_quality,
    "token_counts": q_token_counts,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_sign_lsh": q_embedding_sign_lsh,
    "channel_stats": q_channel_stats,
    "telescope_lookup": q_telescope_lookup,
    "dedup_simhash": q_dedup_simhash_full,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_kmeans": q_ann_ivf_kmeans,
    "media_features": _q_media_features,
    "windowed_stats": q_windowed_stats,
    "dedup_components": q_dedup_components,
    "dedup_components_star": q_dedup_components_star,
    "token_topk": q_token_topk,
    "sample_stratified": q_sample_stratified,
    "media_frame_sample": _q_media_frame_sample,
    "approx_distinct_hll": q_approx_distinct_hll,
    "dedup_segments": q_dedup_segments,
    "contamination_ngrams": q_contamination_ngrams,
    "quality_repetition": q_quality_repetition,
    "embedding_quantize": q_embedding_quantize,
    "length_quantiles": q_length_quantiles,
    "tfidf_topterms": q_tfidf_topterms,
    "ann_quantized_topk": q_ann_quantized_topk,
    "ann_quantized_rescore": q_ann_quantized_rescore,
    "events_sessionize": q_events_sessionize,
    "curate_decisions": q_curate_decisions,
    "pii_redact": q_pii_redact,
}

# Operators beyond the 50-entry driver-gate cap: identical dual-engine
# discipline (DuckDB oracle in oracle_sql.EXTRA_ORACLE_SQL, fixed-
# corpus cell-exact check + random-corpus fuzz in the suite), just not
# driver-exposed — the cap is fully allocated and every merge slot is
# spent (see the QUERIES comment above).
EXTRA_QUERIES = {
    "dedup_incremental": q_dedup_incremental,
    "dedup_keep_best": q_dedup_keep_best,
    "sequence_pack": q_sequence_pack,
    "lm_perplexity": q_lm_perplexity,
    "dsir_weights": q_dsir_weights,
    "mixture_budget_sample": q_mixture_budget_sample,
    "domain_reweight": q_domain_reweight,
    "semantic_dedup": q_semantic_dedup,
    "bm25_topk": q_bm25_topk,
    "dedup_substrings": q_dedup_substrings,
    "interleaved_filter": q_interleaved_filter,
    "interleaved_pack": q_interleaved_pack,
    "quality_classifier": q_quality_classifier,
    "quality_entropy": q_quality_entropy,
    "ann_graph_knn": q_ann_graph_knn,
    "mixture_temperature": q_mixture_temperature,
    "span_corruption": q_span_corruption,
    "hard_negatives": q_hard_negatives,
    "fingerprint_winnow": q_fingerprint_winnow,
    "dedup_bloom": q_dedup_bloom,
    "curate_report": q_curate_report,
    "bpe_merges": q_bpe_merges,
    "sample_bottomk": q_sample_bottomk,
    "lang_switches": q_lang_switches,
}
