"""The packaged composed pipeline (plans/training.py)."""

from pyspark.sql import functions as F

from pcrawler_spark.plans.training import training_pipeline


def _docs(spark):
    good = ("the cat and the dog is a good pair of friends, " * 6).strip()
    good2 = ("a list of the spark engines and the flink engines is long, " * 6).strip()
    junk = "x" * 30  # short, no stopwords → fails the quality gate
    rows = [
        (1, good),
        (2, good),              # exact dup of 1 → dropped (keep-min)
        (3, good + " extra!"),  # near dup of 1 → dropped by LSH+CC
        (4, good2),             # distinct original
        (5, junk),              # quality-gated out
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_training_pipeline_stages(spark):
    out = training_pipeline(_docs(spark), quality_min=450000)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 4], kept
    row = {r["doc_id"]: r for r in out.collect()}
    assert row[1]["lang_pred"] == "en"
    assert row[1]["n_tokens"] > 50
    assert row[1]["quality_ppm"] >= 450000


def test_training_pipeline_no_near_dedup(spark):
    out = training_pipeline(_docs(spark), quality_min=450000, near_dedup=False)
    # exact dedup still collapses 1/2; the near-dup 3 survives
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4]


def test_training_pipeline_custom_columns(spark):
    df = _docs(spark).select(F.col("doc_id").alias("page_id"), F.col("text").alias("body"))
    out = training_pipeline(df, quality_min=450000, id_col="page_id", text_col="body")
    assert sorted(r["page_id"] for r in out.collect()) == [1, 4]
