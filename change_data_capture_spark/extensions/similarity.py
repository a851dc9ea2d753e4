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
    """Deterministic pseudo-random hyperplane: each coordinate is a
    uniform [-1, 1] value derived from md5(plane:dim) — reproducible
    across runs/machines with no RNG state. (A periodic integer mix
    was measurably bad here: components repeating every few dims make
    all planes structurally similar and recall collapses.)"""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big")
        out.append(v / float(2**63) - 1.0)
    return out


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
    multi_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id — the all-pairs cross join never
    happens), trading recall for a ~2^planes candidate reduction.

    ``multi_probe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's sign pattern (flip each plane bit) —
    near neighbors that straddle one hyperplane land there, which is
    the dominant miss mode; probing is query-side only, so the corpus
    index stays one row per vector."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("qv"), dim, planes))
    if multi_probe >= 1:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
        )
        q = q.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("cv"), dim, planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        # a (query, neighbor) pair can meet in several probed buckets
        .select("query_id", "neighbor_id", "qv", "cv", "score")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are assigned to
    inverted lists by nearest centroid; a query scores only the
    vectors in its ``n_probe`` nearest lists. The candidate join is an
    equi-join on list id — the same shape as the LSH variant, but with
    data-adaptive cells instead of fixed hyperplanes.

    Centroids are seeded deterministically (the ``n_lists`` smallest
    corpus ids) rather than k-means-trained: Lloyd iterations average
    doubles in partition order, which would make the index —
    and therefore recall — nondeterministic across runs. Seeded
    IVF keeps the exact inverted-list/probe machinery with a
    reproducible layout."""
    cent = (
        spread(corpus)
        .orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .select(
            F.col(id_col).alias("list_id"), as_double_vec(F.col(vec_col)).alias("centroid")
        )
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )

    def assign(df, vec, n_best, out_cols):
        scored = df.crossJoin(F.broadcast(cent)).withColumn(
            "__sim", F.round(cosine(F.col(vec), F.col("centroid")), 6)
        )
        w = Window.partitionBy(out_cols[0]).orderBy(
            F.col("__sim").desc(), F.col("list_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_best)
            .select(*out_cols, "list_id")
        )

    lists = assign(c, "cv", 1, ["neighbor_id"]).join(c, "neighbor_id")
    probes = assign(q, "qv", n_probe, ["query_id"]).join(q, "query_id")
    scored = (
        lists.join(probes, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        # a corpus vector can appear in several probed lists of the
        # same query — dedupe before ranking
        .select("query_id", "neighbor_id", "score")
        .distinct()
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
