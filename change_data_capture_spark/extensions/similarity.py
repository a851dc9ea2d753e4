"""Embedding similarity search: brute-force cosine top-k (correctness
baseline) and an LSH-bucketed approximate variant (the scale path).

Dot products are computed as a strict left-to-right fold over the
array (``F.aggregate``) in DOUBLE — the same sequential reduction a
scalar SQL engine performs — so scores are bit-reproducible across
engines and runs (no parallel-reduction reordering).

Scale design: brute force is a cross join — O(Q*N) dot products — and
only acceptable when one side is small enough to broadcast. The LSH
variant hashes vectors into 2^P sign-pattern buckets from P fixed
hyperplanes; the candidate join is an equi-join on the bucket id, so
the all-pairs term never materializes. An IVF layout (k-means
centroids + inverted lists) has the same join shape; hyperplane LSH is
chosen here because it is deterministic without an iterative training
step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import spread


def as_double_vec(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    """Sequential left-to-right double fold (bit-deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. The small query side is
    broadcast; ranking is a per-query window (ties broken by corpus id
    for determinism)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )
    # spread: the dot-product map stage is compute-bound, not IO-bound;
    # see dedup.spread.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # rank on the ROUNDED score so cross-engine ulp noise cannot
        # reorder near-ties; neighbor id breaks exact ties
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG: fixed integer
    mix per (plane, dim) coordinate, values in [-3, 3])."""
    return [
        float(((plane * 73856093 + d * 19349663 + 83492791) % 7) - 3)
        for d in range(dim)
    ]


def lsh_bucket_expr(vec_col, dim: int, planes: int = 8) -> F.Column:
    """Sign-pattern bucket id from `planes` fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        hp = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = F.when(dot(vec_col, hp) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, p))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id — the all-pairs cross join never
    happens). Recall is traded for a ~2^planes candidate reduction;
    multi-probe = union over neighboring buckets if needed."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("qv"), dim, planes))
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("cv"), dim, planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    *,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (brute force baseline for the
    embedding near-dup operator; the LSH bucket join is the scale
    variant)."""
    a = spread(vectors).select(F.col(id_col).alias("a_id"), as_double_vec(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("b_id"), as_double_vec(F.col(vec_col)).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("score", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= threshold)
        .select("a_id", "b_id", F.round("score", 6).alias("score"))
    )
