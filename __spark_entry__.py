"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl pipeline end-to-end on a small
deterministic synthetic corpus (the engine's real input shape) and returns
the final export DataFrame.

``queries()`` maps one entry per implemented operator family from
SURVEY.md §2 (+ the training-data operators) to a (spark, sf_dir) callable
over the driver testdata; ``oracle_sql()`` supplies the DuckDB-equivalent
ANSI SQL.  Column names and rounding are aligned between both sides; doubles
are rounded before ranking/limits so top-k selections agree across engines.
Crawl-pipeline queries whose input is the synthetic pages table (not
testdata) have no SQL oracle → rows-only checks.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full crawl engine (frontier → politeness → fetch → extract
    → epoch commits → export join) on a deterministic synthetic corpus."""
    from pcrawler_spark.plans import CrawlEngine, CrawlRunConfig
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

    corpus = generate_crawl_corpus(SyntheticCrawlConfig(n_companies=30, n_industries=3, n_hosts=6))
    pages = spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    hosts = spark.createDataFrame(
        corpus["hosts"],
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    seeds = spark.createDataFrame(corpus["seeds"], "url string, priority int, industry string")
    engine = CrawlEngine(
        spark, pages, hosts,
        CrawlRunConfig(state_dir=tempfile.mkdtemp(prefix="pcrawler_entry_")),
    )
    engine.run(seeds)
    return engine.export()


# --------------------------------------------------------------------------
# relational operator families (SURVEY.md §2) over the testdata tables
# --------------------------------------------------------------------------

def q01_pricing_summary(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q02_filter_project(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_partkey", F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_revenue"))
    )


def q03_join_topk_revenue(spark, sf):
    li, o, c = _t(spark, sf, "lineitem"), _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q04_broadcast_dims_count(spark, sf):
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q05_semi_join_customers(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def q06_anti_join_customers(spark, sf):
    """Customers with no 1997+ order (plain NOT EXISTS is empty at sf≥0.01
    — every customer has some order — so the anti side is time-filtered)."""
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    recent = o.filter(F.col("o_orderdate") >= "1997-06-01")
    return c.join(recent, c.c_custkey == recent.o_custkey, "left_anti").select("c_custkey", "c_name")


_SEGMENT_DIM = [
    ("  building ", "construction"),
    ("AUTOMOBILE", "vehicles"),
    (" Machinery", "industrial"),
    ("furniture  ", "home"),
    ("HOUSEHOLD", "home"),
]


def q07_expr_key_join(spark, sf):
    c = _t(spark, sf, "customer")
    dim = spark.createDataFrame(_SEGMENT_DIM, "seg string, sector string")
    return (
        c.join(dim, F.lower(F.trim(c.c_mktsegment)) == F.lower(F.trim(dim.seg)), "left")
        .groupBy(F.coalesce("sector", F.lit("unknown")).alias("sector"))
        .agg(F.count("*").alias("n_customers"))
    )


def q08_left_join_coalesce(spark, sf):
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    tot = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("spent"), F.count("*").alias("n_orders"))
    return c.join(tot, c.c_custkey == tot.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("spent", F.lit(0.0)).alias("spent"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "N/A").otherwise("active").alias("status"),
    )


def q09_group_having_dups(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def q10_max_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(F.max("o_orderkey").alias("latest_order"))


def q11_window_keep_first(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q12_window_keep_last(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q13_topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank", F.round("o_totalprice", 2).alias("totalprice"))
    )


def q14_distinct_count(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q15_union_distinct(spark, sf):
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


def q16_unpivot_stack(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.expr("stack(2, 'brand', p_brand, 'type', p_type) as (kind, val)"),
        )
        .groupBy("kind", "val")
        .agg(F.count("*").alias("n"))
    )


def q17_explode_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.slice(F.split(F.col("text"), " "), 1, 5)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


def q18_json_extract(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def q19_regexp_extract(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.withColumn("m", F.regexp_extract("text", r"\b(vector|window|stream)\b", 1))
        .filter(F.col("m") != "")
        .groupBy("m")
        .agg(F.count("*").alias("n_docs"))
    )


def q20_conditional_quality(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("n_chars") > 400, "long")
        .when(F.col("n_chars") > 200, "medium")
        .otherwise("short")
        .alias("bucket"),
        F.coalesce(F.nullif("lang", F.lit("")), F.lit("unknown")).alias("lang_norm"),
    )


def q21_trailing_window_avg(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc()).rowsBetween(-3, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("trailing_avg"),
    )


# --------------------------------------------------------------------------
# training-data / web-text operators
# --------------------------------------------------------------------------

def q22_token_count_stats(spark, sf):
    from pcrawler_spark.operators.textstats import token_count

    d = token_count(_t(spark, sf, "documents"))
    return d.groupBy("lang").agg(
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.count("*").alias("n_docs"),
    )


def q23_quality_score(spark, sf):
    from pcrawler_spark.operators.textstats import quality_score

    return quality_score(_t(spark, sf, "documents")).select(
        "doc_id", "punct_ppm", "stopword_ppm", "quality_ppm"
    )


def q24_lang_id(spark, sf):
    from pcrawler_spark.operators.textstats import lang_id

    return lang_id(_t(spark, sf, "documents")).groupBy("lang", "lang_pred").agg(
        F.count("*").alias("n")
    )


def q25_fingerprint_dups(spark, sf):
    """Exact dedup over a corpus with injected duplicates (documents has no
    natural dups; both engines re-append doc_id%10==0 with offset ids)."""
    from pcrawler_spark.operators.simdedup import exact_duplicates

    d = _t(spark, sf, "documents")
    dup = d.filter(F.col("doc_id") % 10 == 0).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    return exact_duplicates(d.unionByName(dup)).select("fp", "n_dups", "keep_id")


def q26_ngram_jaccard(spark, sf):
    from pcrawler_spark.operators.simdedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return ngram_jaccard_pairs(d, threshold=0.12, max_shingle_df=100)


def q27_minhash_lsh(spark, sf):
    from pcrawler_spark.operators.simdedup import minhash_lsh_candidates

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    return minhash_lsh_candidates(d, n_hashes=8, band_rows=2)


def q28_simhash_pairs(spark, sf):
    from pcrawler_spark.operators.simdedup import simhash_near_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return simhash_near_pairs(d, max_hamming=4)


def q29_knn_bruteforce(spark, sf):
    from pcrawler_spark.operators.knn import brute_force_topk

    e = _t(spark, sf, "embeddings")
    return brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)


def q30_knn_ivf(spark, sf):
    from pcrawler_spark.operators.knn import ivf_topk

    e = _t(spark, sf, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 10), k=5, n_probe=2)


def q31_embedding_centroids(spark, sf):
    e = _t(spark, sf, "embeddings")
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )


def q37_sequence_gaps(spark, sf):
    """F7: per-group missing-page detection (pagination-gap validator);
    gaps injected by dropping linenumber 2."""
    from pcrawler_spark.operators.qualitygate import sequence_gaps

    li = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") != 2)
    return sequence_gaps(li, "l_orderkey", "l_linenumber")


def q38_na_density(spark, sf):
    """F6: N/A-density row filter over a deterministically NA-injected set."""
    from pcrawler_spark.operators.qualitygate import na_density_filter

    c = _t(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(F.col("c_name")).alias("f1"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("N/A")).otherwise(F.col("c_mktsegment")).alias("f2"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("")).otherwise(F.col("c_acctbal").cast("string")).alias("f3"),
    )
    return na_density_filter(c, ["f1", "f2", "f3"], threshold=0.5).select("c_custkey", "f1", "f2", "f3")


def q39_sanitize_names(spark, sf):
    """X5: the reference's name sanitizer as codegen regexp chain."""
    from pcrawler_spark.operators.qualitygate import sanitize_name_col

    p = _t(spark, sf, "part")
    return (
        p.select(sanitize_name_col(F.col("p_type")).alias("stype"))
        .groupBy("stype")
        .agg(F.count("*").alias("n"))
    )


def q40_error_url_filter(spark, sf):
    """X11: the reference's error-URL heuristic (main.py:59-66) over a
    deterministically error-injected URL column."""
    from pcrawler_spark.operators.qualitygate import error_url_filter

    o = _t(spark, sf, "orders")
    url = F.concat(
        F.lit("https://dir.example.vn/company/"),
        F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("/404"))
        .when(F.col("o_orderkey") % 17 == 0, F.lit("?status=timeout"))
        .when(F.col("o_orderkey") % 19 == 0, F.lit("/not-found"))
        .otherwise(F.lit("")),
    )
    df = o.select("o_orderkey", url.alias("url"))
    return error_url_filter(df, "url", keep="errors")


# q41 fixture rows: small literal groups exercising every completeness branch
# (the >1000-link "large industry" group is range-generated on both sides)
_Q41_SMALL_ROWS = (
    [("ind_gap", f"https://d.vn/i1?page={p}&c={i}") for p in (1, 2, 4) for i in range(8)]
    + [("ind_density", f"https://d.vn/i2?page={p}&c={i}") for p in (1, 2, 3, 4, 5) for i in range(4)]
    + [("ind_errors", f"https://d.vn/i3?page={p}&c={i}" + ("/404" if i % 4 == 0 else ""))
       for p in (1, 2) for i in range(12)]
    + [("ind_small", f"https://d.vn/i4?page=1&c={i}") for i in range(10)]
    + [("ind_complete", f"https://d.vn/i6?page={p}&c={i}") for p in (1, 2, 3) for i in range(20)]
)


def q41_checkpoint_completeness(spark, sf):
    """F7 in full: pagination gaps + link density + error rate + size
    heuristics (main.py:19-77) over a fixture exercising every branch."""
    from pcrawler_spark.operators.qualitygate import checkpoint_completeness

    small = spark.createDataFrame(_Q41_SMALL_ROWS, "grp string, url string")
    large = (
        spark.range(0, 51)
        .crossJoin(spark.range(1, 21).withColumnRenamed("id", "p"))
        .select(
            F.lit("ind_large").alias("grp"),
            F.concat(F.lit("https://d.vn/i5?page="), F.col("p").cast("string"),
                     F.lit("&c="), F.col("id").cast("string")).alias("url"),
        )
    )
    return checkpoint_completeness(small.unionByName(large), "grp", "url")


# --------------------------------------------------------------------------
# crawl-pipeline queries (synthetic pages input → rows-only checks)
# --------------------------------------------------------------------------

def _synthetic_pages(spark):
    from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

    corpus = generate_crawl_corpus(SyntheticCrawlConfig(n_companies=50, n_industries=4, n_hosts=8))
    return corpus, spark.createDataFrame(
        corpus["pages"], "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def q32_extract_details(spark, sf):
    from pcrawler_spark.functions import extract_details_udf, with_url_hash
    from pcrawler_spark.operators.dedup import dedup_keep_first

    _, pages = _synthetic_pages(spark)
    idx = dedup_keep_first(with_url_hash(pages, "url"), ["url_hash"], "warc_ts", ["canon_url"])
    return (
        idx.filter(F.col("canon_url").contains("-tong-quan"))
        .withColumn("rec", extract_details_udf("html"))
        .select("canon_url", "rec.*")
    )


def q33_extract_text_identity(spark, sf):
    """Byte-identity at DataFrame level: re-extracted text == stored text."""
    from pcrawler_spark.functions import extract_text_udf

    _, pages = _synthetic_pages(spark)
    return pages.select(
        "url",
        (extract_text_udf("html") == F.col("text")).alias("text_identical"),
    ).groupBy("text_identical").agg(F.count("*").alias("n"))


def q34_politeness_schedule(spark, sf):
    from pcrawler_spark.functions import with_url_hash
    from pcrawler_spark.operators.politeness import politeness_schedule

    corpus, pages = _synthetic_pages(spark)
    hosts = spark.createDataFrame(
        corpus["hosts"],
        "host string, crawl_delay_s double, robots_disallow array<string>, max_parallel int",
    )
    frontier = with_url_hash(pages, "url").withColumn("priority", F.lit(1)).withColumn("retry_count", F.lit(0))
    scheduled, deferred, disallowed = politeness_schedule(frontier, hosts, epoch_seconds=10.0)
    return (
        scheduled.groupBy("host").agg(F.count("*").alias("n_scheduled"))
        .orderBy("host")
    )


def q35_phone_normalize(spark, sf):
    from pcrawler_spark.functions import normalize_phones_udf

    raw = spark.createDataFrame(
        [(1, "0912345678; 0329999999"), (2, "+84 28 3822 1234"), (3, "84912345678 / junk"),
         (4, "+14155552671"), (5, "not a phone"), (6, None)],
        "id int, phone_text string",
    )
    return raw.select("id", F.explode_outer(normalize_phones_udf("phone_text")).alias("e164"))


def q36_multimodal_features(spark, sf):
    from pcrawler_spark.operators.multimodal import decode_features, frame_sample_plan

    media = spark.createDataFrame(
        [(i, ["image", "audio", "video"][i % 3], bytes([i % 251] * (50 + i)), 64, 64, 3000 + i * 500)
         for i in range(30)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    feats = decode_features(media).select("media_id", "kind", F.round(F.element_at("feat", 1), 6).alias("f0"), "decode_ok")
    frames = frame_sample_plan(media).groupBy("media_id").agg(F.count("*").alias("n_frames"))
    return feats.join(frames, "media_id", "left").select(
        "media_id", "kind", "f0", "decode_ok", F.coalesce("n_frames", F.lit(0)).alias("n_frames")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_filter_project": q02_filter_project,
        "q03_join_topk_revenue": q03_join_topk_revenue,
        "q04_broadcast_dims_count": q04_broadcast_dims_count,
        "q05_semi_join_customers": q05_semi_join_customers,
        "q06_anti_join_customers": q06_anti_join_customers,
        "q07_expr_key_join": q07_expr_key_join,
        "q08_left_join_coalesce": q08_left_join_coalesce,
        "q09_group_having_dups": q09_group_having_dups,
        "q10_max_per_group": q10_max_per_group,
        "q11_window_keep_first": q11_window_keep_first,
        "q12_window_keep_last": q12_window_keep_last,
        "q13_topk_per_group": q13_topk_per_group,
        "q14_distinct_count": q14_distinct_count,
        "q15_union_distinct": q15_union_distinct,
        "q16_unpivot_stack": q16_unpivot_stack,
        "q17_explode_tokens": q17_explode_tokens,
        "q18_json_extract": q18_json_extract,
        "q19_regexp_extract": q19_regexp_extract,
        "q20_conditional_quality": q20_conditional_quality,
        "q21_trailing_window_avg": q21_trailing_window_avg,
        "q22_token_count_stats": q22_token_count_stats,
        "q23_quality_score": q23_quality_score,
        "q24_lang_id": q24_lang_id,
        "q25_fingerprint_dups": q25_fingerprint_dups,
        "q26_ngram_jaccard": q26_ngram_jaccard,
        "q27_minhash_lsh": q27_minhash_lsh,
        "q28_simhash_pairs": q28_simhash_pairs,
        "q29_knn_bruteforce": q29_knn_bruteforce,
        "q30_knn_ivf": q30_knn_ivf,
        "q31_embedding_centroids": q31_embedding_centroids,
        "q32_extract_details": q32_extract_details,
        "q33_extract_text_identity": q33_extract_text_identity,
        "q34_politeness_schedule": q34_politeness_schedule,
        "q35_phone_normalize": q35_phone_normalize,
        "q36_multimodal_features": q36_multimodal_features,
        "q37_sequence_gaps": q37_sequence_gaps,
        "q38_na_density": q38_na_density,
        "q39_sanitize_names": q39_sanitize_names,
        "q40_error_url_filter": q40_error_url_filter,
        "q41_checkpoint_completeness": q41_checkpoint_completeness,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _simhash_sql(max_doc: int, max_hamming: int) -> str:
    from pcrawler_spark.operators.simdedup import simhash_blocks

    votes = ",\n      ".join(
        f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}" for k in range(32)
    )
    bits = " + ".join(f"(CASE WHEN v{k} > 0 THEN {2 ** k} ELSE 0 END)" for k in range(32))
    # pigeonhole banding (exact recall): same block layout as the operator
    blocks = simhash_blocks(32, max_hamming)
    blk_vals = ", ".join(f"({i})" for i in range(len(blocks)))
    blk_case = " ".join(
        f"WHEN {i} THEN (simhash >> {off}) & {(1 << w) - 1}"
        for i, (off, w) in enumerate(blocks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id AS doc, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
      FROM documents WHERE doc_id < {max_doc}
    ), hashed AS (
      SELECT doc, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks
    ), agg AS (
      SELECT doc,
      {votes}
      FROM hashed GROUP BY doc
    ), sh AS (
      SELECT doc, CAST({bits} AS BIGINT) AS simhash FROM agg
    ), b AS (
      SELECT doc, simhash, blk, CASE blk {blk_case} END AS val
      FROM sh, (VALUES {blk_vals}) AS t(blk)
    )
    SELECT DISTINCT a.doc AS doc_a, bb.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, bb.simhash)) AS BIGINT) AS hamming
    FROM b a JOIN b bb USING (blk, val)
    WHERE a.doc < bb.doc AND bit_count(xor(a.simhash, bb.simhash)) <= {max_hamming}
    """


_SHINGLE_CTE = """
    w AS (
      SELECT doc_id AS doc, string_split(trim(text), ' ') AS words
      FROM documents WHERE doc_id < {max_doc}
    ), sh AS (
      SELECT doc, list_distinct([
        array_to_string(words[i:i+2], ' ')
        for i in range(1, greatest(len(words) - 2, 1) + 1)
      ]) AS shingles
      FROM w
    )
"""


def _q41_sql() -> str:
    values = ",\n              ".join(f"('{g}', '{u}')" for g, u in _Q41_SMALL_ROWS)
    return f"""
        WITH small(grp, url) AS (VALUES
              {values}),
        large AS (
          SELECT 'ind_large' AS grp,
                 'https://d.vn/i5?page=' || CAST(p AS VARCHAR) || '&c=' || CAST(i AS VARCHAR) AS url
          FROM range(0, 51) t(i), range(1, 21) s(p)
        ),
        inp AS (SELECT * FROM small UNION ALL SELECT * FROM large),
        flagged AS (
          SELECT grp,
                 CASE WHEN regexp_extract(url, 'page=(\\d+)', 1) <> ''
                      THEN CAST(regexp_extract(url, 'page=(\\d+)', 1) AS INT) END AS page,
                 CASE WHEN regexp_matches(lower(url), 'error|404|not-found|timeout|failed')
                      THEN 1 ELSE 0 END AS err
          FROM inp
        ),
        agg AS (
          SELECT grp, COUNT(*) AS n_links, MAX(page) AS mx,
                 list(DISTINCT page) FILTER (WHERE page IS NOT NULL) AS pages,
                 SUM(err) AS n_error_links
          FROM flagged GROUP BY grp
        ),
        scored AS (
          SELECT grp, n_links,
                 CAST(len(pages) AS BIGINT) AS n_pages,
                 CAST(CASE WHEN mx IS NOT NULL
                      THEN len(list_filter(range(1, mx + 1), x -> NOT list_contains(pages, x)))
                      ELSE 0 END AS BIGINT) AS n_missing_pages,
                 CAST(n_error_links AS BIGINT) AS n_error_links
          FROM agg
        )
        SELECT grp, n_links, n_pages, n_missing_pages, n_error_links,
               CASE WHEN n_missing_pages > 0 THEN 'missing_pages'
                    WHEN n_pages > 0 AND n_links / n_pages < 5 THEN 'low_link_density'
                    WHEN n_error_links > n_links * 0.1 THEN 'high_error_rate'
                    WHEN n_links < 20 THEN 'small_industry'
                    WHEN n_links > 1000 THEN 'large_industry'
                    ELSE 'complete' END AS reason,
               CASE WHEN n_missing_pages > 0 THEN FALSE
                    WHEN n_pages > 0 AND n_links / n_pages < 5 THEN FALSE
                    WHEN n_error_links > n_links * 0.1 THEN FALSE
                    ELSE TRUE END AS complete
        FROM scored
    """


def oracle_sql() -> dict[str, str]:
    seg_values = ", ".join(f"('{s}', '{t}')" for s, t in _SEGMENT_DIM)
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_filter_project": """
            SELECT l_orderkey, l_partkey,
                   ROUND(l_extendedprice * l_discount, 4) AS disc_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
              AND l_discount >= 0.05 AND l_quantity < 24
        """,
        "q03_join_topk_revenue": """
            SELECT o_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "q04_broadcast_dims_count": """
            SELECT r_name, n_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q05_semi_join_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "q06_anti_join_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1997-06-01'
            )
        """,
        "q07_expr_key_join": f"""
            WITH dim(seg, sector) AS (VALUES {seg_values})
            SELECT COALESCE(sector, 'unknown') AS sector, COUNT(*) AS n_customers
            FROM customer LEFT JOIN dim
              ON LOWER(TRIM(c_mktsegment)) = LOWER(TRIM(seg))
            GROUP BY COALESCE(sector, 'unknown')
        """,
        "q08_left_join_coalesce": """
            WITH tot AS (
              SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spent,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey,
                   COALESCE(spent, 0.0) AS spent,
                   CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
                   CASE WHEN n_orders IS NULL THEN 'N/A' ELSE 'active' END AS status
            FROM customer LEFT JOIN tot ON c_custkey = o_custkey
        """,
        "q09_group_having_dups": """
            SELECT o_custkey, COUNT(*) AS n FROM orders
            GROUP BY o_custkey HAVING COUNT(*) > 1
        """,
        "q10_max_per_group": """
            SELECT o_custkey, MAX(o_orderkey) AS latest_order
            FROM orders GROUP BY o_custkey
        """,
        "q11_window_keep_first": """
            SELECT user_id, event_id, event_type FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "q12_window_keep_last": """
            SELECT user_id, event_id, event_type FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "q13_topk_per_group": """
            SELECT o_custkey, o_orderkey, rank, ROUND(o_totalprice, 2) AS totalprice FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders
            ) WHERE rank <= 3
        """,
        "q14_distinct_count": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "q15_union_distinct": """
            SELECT DISTINCT nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL SELECT s_nationkey FROM supplier
            )
        """,
        "q16_unpivot_stack": """
            SELECT kind, val, COUNT(*) AS n FROM (
              SELECT 'brand' AS kind, p_brand AS val FROM part
              UNION ALL SELECT 'type', p_type FROM part
            ) GROUP BY kind, val
        """,
        "q17_explode_tokens": """
            SELECT token, COUNT(*) AS n FROM (
              SELECT unnest((string_split(text, ' '))[1:5]) AS token FROM documents
            ) GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
        """,
        "q18_json_extract": """
            SELECT event_type,
                   ROUND(AVG(k), 6) AS avg_k,
                   MAX(k) AS max_k
            FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
            GROUP BY event_type
        """,
        "q19_regexp_extract": r"""
            SELECT m, COUNT(*) AS n_docs FROM (
              SELECT regexp_extract(text, '\b(vector|window|stream)\b', 1) AS m FROM documents
            ) WHERE m <> '' GROUP BY m
        """,
        "q20_conditional_quality": """
            SELECT doc_id,
                   CASE WHEN n_chars > 400 THEN 'long'
                        WHEN n_chars > 200 THEN 'medium'
                        ELSE 'short' END AS bucket,
                   COALESCE(NULLIF(lang, ''), 'unknown') AS lang_norm
            FROM documents
        """,
        "q21_trailing_window_avg": """
            SELECT event_id, user_id,
                   ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS trailing_avg
            FROM events
        """,
        "q22_token_count_stats": """
            SELECT lang,
                   ROUND(AVG(n_tokens), 6) AS avg_tokens,
                   MAX(n_tokens) AS max_tokens,
                   COUNT(*) AS n_docs
            FROM (SELECT lang, len(string_split(trim(text), ' ')) AS n_tokens FROM documents)
            GROUP BY lang
        """,
        "q23_quality_score": """
            WITH t AS (
              SELECT doc_id,
                     LENGTH(text) AS n_chars,
                     LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
                     len(string_split(trim(text), ' ')) AS n_tokens,
                     len(list_filter(string_split(trim(text), ' '),
                         x -> lower(x) IN ('the','a','of','and','is'))) AS n_stop
              FROM documents
            )
            SELECT doc_id,
                   CAST(FLOOR(1000000.0 * n_punct / GREATEST(n_chars, 1)) AS BIGINT) AS punct_ppm,
                   CAST(FLOOR(1000000.0 * n_stop / GREATEST(n_tokens, 1)) AS BIGINT) AS stopword_ppm,
                   CAST(FLOOR(500000.0 * n_stop / GREATEST(n_tokens, 1))
                      + FLOOR(300000.0 * (n_chars - n_punct) / GREATEST(n_chars, 1))
                      + LEAST(400 * n_chars, 200000) AS BIGINT) AS quality_ppm
            FROM t
        """,
        "q24_lang_id": """
            WITH t AS (
              SELECT lang,
                     len(list_filter(string_split(lower(trim(text)), ' '),
                         x -> x IN ('the','a','of','and','is'))) AS en,
                     len(list_filter(string_split(lower(trim(text)), ' '),
                         x -> x IN ('và','của','là','các','cho'))) AS vi
              FROM documents
            )
            SELECT lang,
                   CASE WHEN en > vi THEN 'en' WHEN vi > en THEN 'vi' ELSE 'unknown' END AS lang_pred,
                   COUNT(*) AS n
            FROM t GROUP BY 1, 2
        """,
        "q25_fingerprint_dups": """
            WITH all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
            )
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
            FROM all_docs GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "q26_ngram_jaccard": f"""
            WITH {_SHINGLE_CTE.format(max_doc=500)},
            sizes AS (SELECT doc, len(shingles) AS n_sh FROM sh),
            inv0 AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
            inv AS (
              SELECT doc, shingle FROM (
                SELECT doc, shingle, COUNT(*) OVER (PARTITION BY shingle) AS sdf
                FROM inv0
              ) WHERE sdf <= 100
            ),
            common AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
              FROM inv a JOIN inv b USING (shingle)
              WHERE a.doc < b.doc GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc = doc_a
            JOIN sizes sb ON sb.doc = doc_b
            WHERE ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.12
        """,
        "q27_minhash_lsh": f"""
            WITH {_SHINGLE_CTE.format(max_doc=500)},
            inv AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
            seeded AS (
              SELECT doc, seed, shingle,
                     CAST(('0x' || substr(md5(seed || '|' || shingle), 1, 8)) AS BIGINT) AS h
              FROM inv, UNNEST(range(0, 8)) AS s(seed)
            ),
            sig AS (SELECT doc, seed, MIN(h) AS minhash FROM seeded GROUP BY doc, seed),
            bands AS (
              SELECT doc, CAST(seed // 2 AS INT) AS band,
                     MIN(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh_0,
                     MIN(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh_1
              FROM sig GROUP BY doc, CAST(seed // 2 AS INT)
            )
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM bands a JOIN bands b USING (band, mh_0, mh_1)
            WHERE a.doc < b.doc
        """,
        "q28_simhash_pairs": _simhash_sql(max_doc=300, max_hamming=4),
        "q29_knn_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
            s AS (
              SELECT query_id, neighbor_id,
                     ROUND(list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cos
              FROM q CROSS JOIN c WHERE query_id <> neighbor_id
            ),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
            SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
        """,
        "q31_embedding_centroids": """
            SELECT label, i AS pos, ROUND(AVG(embedding[i + 1]), 6) AS c
            FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
            GROUP BY label, i
        """,
        "q37_sequence_gaps": """
            WITH obs AS (
              SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber <> 2
            ), agg AS (
              SELECT l_orderkey, MAX(l_linenumber) AS mx,
                     list(DISTINCT l_linenumber) AS seen
              FROM obs GROUP BY l_orderkey
            )
            SELECT l_orderkey,
                   unnest(list_filter(range(1, mx + 1), x -> NOT list_contains(seen, x))) AS missing
            FROM agg
        """,
        "q38_na_density": """
            WITH c AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS f1,
                     CASE WHEN c_custkey % 2 = 0 THEN 'N/A' ELSE c_mktsegment END AS f2,
                     CASE WHEN c_custkey % 5 = 0 THEN '' ELSE CAST(c_acctbal AS VARCHAR) END AS f3
              FROM customer
            )
            SELECT c_custkey, f1, f2, f3 FROM c
            WHERE ((CASE WHEN f1 IS NULL OR f1 IN ('', 'N/A', 'n/a') THEN 1 ELSE 0 END)
                 + (CASE WHEN f2 IS NULL OR f2 IN ('', 'N/A', 'n/a') THEN 1 ELSE 0 END)
                 + (CASE WHEN f3 IS NULL OR f3 IN ('', 'N/A', 'n/a') THEN 1 ELSE 0 END)) / 3.0 <= 0.5
        """,
        "q39_sanitize_names": r"""
            SELECT stype, COUNT(*) AS n FROM (
              SELECT trim(
                       regexp_replace(
                         regexp_replace(p_type, '[^\w\s-]', '_', 'g'),
                         '[-\s]+', '_', 'g'),
                       '_') AS stype
              FROM part
            ) GROUP BY stype
        """,
        "q40_error_url_filter": """
            WITH u AS (
              SELECT o_orderkey,
                     'https://dir.example.vn/company/' || CAST(o_orderkey AS VARCHAR) ||
                     CASE WHEN o_orderkey % 13 = 0 THEN '/404'
                          WHEN o_orderkey % 17 = 0 THEN '?status=timeout'
                          WHEN o_orderkey % 19 = 0 THEN '/not-found'
                          ELSE '' END AS url
              FROM orders
            )
            SELECT o_orderkey, url FROM u
            WHERE regexp_matches(lower(url), 'error|404|not-found|timeout|failed')
        """,
        "q41_checkpoint_completeness": _q41_sql(),
        # q30/q32-q36: no SQL oracle (ANN probe choice / pandas-UDF extraction
        # over synthetic pages / phone + multimodal kernels) → rows-only.
    }
