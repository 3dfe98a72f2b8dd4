"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: queries × corpus dot
  products as JVM-side ``zip_with``/``aggregate`` higher-order functions
  (no UDF), ranked per query.  Cosines are computed in double and rounded
  before ranking so results are stable across engines.
* IVF (inverted-file) top-k — the scale path: k-means-style coarse cells
  (here: per-label centroids, or hash-assigned cells), queries probe only
  the nearest ``n_probe`` cells.  Cuts the candidate set by the cell fan-in
  — on a 1000-executor cluster the cell assignment is the shuffle key, so
  each query touches a few partitions instead of the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_dp: int = 6) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, cos).

    Self-matches are excluded.  Ranking uses the rounded cosine with
    neighbor-id tiebreak, making the output deterministic and portable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_similarity_col(F.col("qv"), F.col("cv")), round_dp))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_near_pairs(df: DataFrame, threshold: float = 0.9,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_dp: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact baseline (all pairs with
    rounded cosine ≥ threshold).  O(n²): the exactness yardstick for the
    hyperplane-LSH scale path below; at 100 TB run that one instead."""
    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    return (
        e.alias("a").crossJoin(e.alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", F.round(cosine_similarity_col(F.col("a.v"), F.col("b.v")), round_dp))
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos")
    )


def _hyperplane_sign(vec, seed: int):
    """Sign of <v, w_seed> where w_seed[i] = ±1 from the portable md5 hash —
    deterministic pseudo-random hyperplanes both engines can reproduce.
    Dimension-agnostic: transform-with-index, no driver-side peeking."""
    prods = F.transform(
        vec,
        lambda x, i: x * F.when(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{seed}:"), i.cast("string"))), 1, 8),
                16, 10,
            ).cast("long").bitwiseAND(F.lit(1)) == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    dot = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
    return F.when(dot > 0, 1).otherwise(0)


def hyperplane_lsh_pairs(df: DataFrame, threshold: float = 0.9, n_bits: int = 16,
                         max_hamming: int = 3,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         round_dp: int = 6) -> DataFrame:
    """Embedding near-dup pairs at scale: random-hyperplane signatures
    (n_bits sign bits) + pigeonhole banding on the signature (any pair with
    ≤ max_hamming differing bits collides on ≥1 block) + exact cosine
    filter.  Scales as O(n × n_bits) + a block equi-join instead of O(n²);
    P[bit differs] = angle/π, so near-identical vectors almost always land
    within the Hamming budget (recall measured against
    :func:`cosine_near_pairs` in tests)."""
    from .simdedup import simhash_blocks

    e = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    sig = None
    for s in range(n_bits):
        bit = _hyperplane_sign(F.col("v"), s).cast("long") * F.lit(1 << s).cast("long")
        sig = bit if sig is None else (sig + bit)
    e = e.withColumn("sig", sig)
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftright(F.col("sig"), off).bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
        )
        for i, (off, w) in enumerate(simhash_blocks(n_bits, max_hamming))
    ])
    keyed = e.select("id", "v", "sig", F.explode(blocks).alias("b")).select(
        "id", "v", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    return (
        keyed.alias("a").join(keyed.alias("b"), on=["blk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(cosine_similarity_col(F.col("a.v"), F.col("b.v")), round_dp).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def ivf_build(corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
              cell_col: str = "label") -> DataFrame:
    """Coarse-cell centroids (here cells = the given column; a k-means step
    would produce the same shape).  Returns (cell, centroid array<double>)."""
    exploded = corpus.select(
        F.col(cell_col).alias("cell"), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    return (
        exploded.groupBy("cell", "pos")
        .agg(F.avg("col").alias("v"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("cell", F.transform("pv", lambda s: s["v"]).alias("centroid"))
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cell_col: str = "label") -> DataFrame:
    """ANN: probe the n_probe nearest cells only, exact rank within them."""
    cents = ivf_build(corpus, id_col, vec_col, cell_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.col("cell_cos").desc(), F.col("cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cell_cos", F.round(cosine_similarity_col("qv", "centroid"), 6))
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        probes.join(c, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_similarity_col("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
