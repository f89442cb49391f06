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
    return (g.where((F.col("m") > 1) & (F.col("s1") != 0.0))
            .select("chan", "t_bucket", "m",
                    F.round(sk, 6).alias("sk"),
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


def q_median_lower(spark, sf_dir):
    """A3 quickselect median = element at 0-based index (n-1)//2 of the
    ascending order (mask.c:22-79) — NOT the two-element average."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (e.select("event_type", "value", "event_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("event_type"))))
    return (ranked
            .where(F.col("rn") == F.floor((F.col("n") - 1) / 2) + 1)
            .select("event_type", F.col("value").alias("median_value"),
                    "n"))


def q_trimmed_stats(spark, sf_dir):
    """A4 mid-fraction trimmed mean (mask.c:300-325): sort ascending,
    keep the middle len = floor(n*0.8 + 0.5) elements from
    start = (n-len)/2."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (e.select("event_type", "value", "event_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("event_type"))))
    ln = F.floor(F.col("n") * 0.8 + 0.5)
    start = F.floor((F.col("n") - ln) / 2)
    return (ranked.where((F.col("rn") > start) & (F.col("rn") <= start + ln))
            .groupBy("event_type")
            .agg(F.round(F.sum(_dec("value")).cast("double")
                         / F.count(F.lit(1)), 6).alias("trimmed_avg"),
                 F.count(F.lit(1)).alias("n_kept")))


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
    sh = (d.select("doc_id", F.explode(_shingles()).alias("s"))
          .distinct())
    aggs = [F.min(F.md5(F.concat(F.col("s"), F.lit(f":{k}"))))
            .alias(f"h{k}") for k in range(_N_MINHASH)]
    return sh.groupBy("doc_id").agg(*aggs)


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH near-dup candidates: shingle -> 8 minhashes ->
    4 bands of 2 -> bucket self-join -> distinct candidate pairs."""
    mh = _minhash_df(spark, sf_dir)
    bands = None
    for b in range(_N_BANDS):
        part = mh.select(
            "doc_id", F.lit(b).alias("b"),
            F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias("v"))
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    c = bands.alias("c")
    return (a.join(c, (F.col("a.b") == F.col("c.b"))
                   & (F.col("a.v") == F.col("c.v"))
                   & (F.col("a.doc_id") < F.col("c.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"))
            .distinct())


def q_dedup_jaccard(spark, sf_dir):
    """Exact 3-shingle Jaccard >= 0.5 over the LSH candidate pairs:
    |A ^ B| via a shingle equi-join, |A u B| = |A|+|B|-|A ^ B|."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(_shingles()).alias("s")).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cand = F.broadcast(q_dedup_minhash_lsh(spark, sf_dir))
    common = (cand
              .join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
              .join(sh.alias("sb"), (F.col("doc_b") == F.col("sb.doc_id"))
                    & (F.col("sa.s") == F.col("sb.s")))
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    j = (common
         .join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
         .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
         .select("doc_a", "doc_b",
                 (F.col("n_common")
                  / (F.col("za.sz") + F.col("zb.sz") - F.col("n_common")))
                 .alias("jac")))
    return (j.where(F.col("jac") >= 0.5)
            .select("doc_a", "doc_b", F.round("jac", 6).alias("jaccard")))


def q_text_quality(spark, sf_dir):
    """Quality scoring: token counts, distinct ratio, stopword ratio,
    mean token length — all JVM-side array functions, no UDF."""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    stop = F.size(F.filter(arr, lambda w: w.isin("the", "a")))
    char_sum = F.aggregate(arr, F.lit(0),
                           lambda acc, w: acc + F.length(w))
    return d.select(
        "doc_id", "lang",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(arr)).cast("bigint")
         .alias("n_distinct_tokens"),
        F.round(stop.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(char_sum.cast("double") / n, 6).alias("mean_token_len"))


def q_token_counts(spark, sf_dir):
    """Token counting per language: docs, total tokens, corpus-distinct
    tokens."""
    d = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    return (d.select("lang", arr.alias("w"))
            .select("lang", F.size("w").alias("nw"),
                    F.explode("w").alias("tok"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("total_tokens"),
                 F.countDistinct("tok").alias("distinct_tokens")))


def q_doc_fingerprint(spark, sf_dir):
    """Bag-of-words fingerprint: md5 of the sorted distinct token set
    (order-insensitive near-exact dedup key)."""
    d = _t(spark, sf_dir, "documents")
    arr = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    return d.select("doc_id",
                    F.md5(F.concat_ws(" ", arr)).alias("bag_fingerprint"))


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
    - 0.5; bucket = sum_i 2^i * [dot(e, h_i) > 0]."""
    e = _t(spark, sf_dir, "embeddings")

    def hyperplane(i: int):
        # NB: a two-arg lambda in F.transform means (element, index) —
        # capture i via a closure factory, not a default argument.
        def f(j):
            return (((j + F.lit(i * 64)) * 37 % 101).cast("double")
                    / 101.0 - 0.5)
        return F.transform(F.sequence(F.lit(0), F.lit(63)), f)

    bucket = F.lit(0).cast("bigint")
    for i in range(8):
        bucket = bucket + F.when(
            _dot(F.col("embedding"), hyperplane(i)) > 0.0,
            F.lit(2 ** i)).otherwise(F.lit(0))
    return (e.select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs")))


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "zero_dm_sum": q_zero_dm_sum,
    "sk_estimator": q_sk_estimator,
    "tumbling_decimate": q_tumbling_decimate,
    "interval_mask_join": q_interval_mask_join,
    "union_distinct_channels": q_union_distinct_channels,
    "median_lower": q_median_lower,
    "trimmed_stats": q_trimmed_stats,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_jaccard": q_dedup_jaccard,
    "text_quality": q_text_quality,
    "token_counts": q_token_counts,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_sign_lsh": q_embedding_sign_lsh,
}
