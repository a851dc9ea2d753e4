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


def dot(a, b, dim: int | None = None) -> F.Column:
    """Sequential left-to-right double dot product (bit-deterministic:
    the addition chain is left-associated, matching a scalar engine's
    in-order reduction).

    With ``dim`` known, the product unrolls to ``element_at`` terms —
    plain codegen'd expressions. Without it, the higher-order
    ``aggregate(zip_with(...))`` fold is used, which Spark interprets
    per element (~3x slower in the pairwise hot path: the quadratic
    embedding near-dup verify dropped 57s -> 18s at sf0.1 from this
    unroll). Both forms produce IEEE-identical sums.

    The unroll is NOT free: a ~200-node expression tree costs ~1.3 s
    of driver-side analysis/optimization per query build (measured; the
    HOF form plans in 0.23 s). Unroll ONLY where the per-pair work
    dominates — O(N^2)-pair verify stages — and keep the HOF fold for
    candidate-join ANN scoring, where candidates per query are ~N/2^P
    and plan cost would dominate the run.

    ONLY unroll single-pair expressions. A projection that fuses many
    unrolled dots (16 centroid cosines in one array, 8 hyperplane
    signs in one hash) exceeds the JVM 64KB method limit, FAILS
    whole-stage codegen, and the entire stage falls back to
    interpreted eval — measured 82s vs 57s for the bucketed dedup when
    the centroid assignment was unrolled. Multi-dot expressions keep
    the HOF fold (dim=None)."""
    if dim is not None:
        terms = [
            F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _require(**named: int) -> None:
    """Fail-fast positive-integer parameter gate (repo convention:
    a typo'd/degenerate parameter raises AT THE CALL, naming itself,
    never as a silent empty result or a mid-job arithmetic error)."""
    for name, v in named.items():
        if not isinstance(v, int) or isinstance(v, bool) or v < 1:
            raise ValueError(f"{name}={v!r}: must be a positive integer")


def norm(a, dim: int | None = None) -> F.Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None) -> F.Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. The small query side is
    broadcast; ranking is a per-query window (ties broken by corpus id
    for determinism)."""
    _require(k=k)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )
    # spread: the dot-product map stage is compute-bound, not IO-bound;
    # see dedup.spread.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    )
    # Hoist the norms to one fold per SIDE row instead of two extra
    # folds per PAIR: the Q*N scoring stage then runs a single
    # interpreted HOF fold (the dot) per candidate — ~3x less fold
    # work, IEEE-identical values (same fold over the same array,
    # same divide/multiply order as _cosine_sql).
    if dim is None:
        q = q.withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
        c = c.withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
        score = F.expr(f"round(({_dot_sql('qv', 'cv')} / (qn * cn)), 6)")
    else:
        # per-side norm hoist for the unrolled form too: a fused
        # cosine(a, b, dim) packs THREE unrolled dots into the join
        # projection — the shape dot()'s docstring documents as
        # overflowing the 64 KB codegen method limit. One unrolled
        # norm per side row + the single unrolled pair dot keeps every
        # expression a single-dot tree; IEEE-identical values (same
        # folds, same divide).
        q = q.withColumn("qn", norm(F.col("qv"), dim))
        c = c.withColumn("cn", norm(F.col("cv"), dim))
        score = F.round(
            dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6
        )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # rank on the ROUNDED score so cross-engine ulp noise cannot
        # reorder near-ties; neighbor id breaks exact ties
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the left-to-right HOF dot fold — parses to the
    EXACT Catalyst tree the Column form builds (same fold order, same
    IEEE sums), but reaches the JVM in ONE Py4J call. The Column API
    pays a socket round trip per function node (~0.25 ms each); a
    bucket expression built per-element was measured at ~1 s of pure
    Py4J latency per query build."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
    )


def _array_sql(values) -> str:
    """array<double> literal as SQL text. repr() is the shortest
    round-trip form; the D suffix forces DoubleType in the parser."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in values) + ")"


def _centroid_literals(cent: DataFrame) -> list[tuple[int, list[float]]] | None:
    """Bounded collect of the (list_id, centroid) relation for the
    literal-argmax corpus assignment (see _list_assign_literal_sql).
    n_lists rows by construction — the same bounded-collect contract as
    the PQ codebook seeds. Returns None when list ids are not plain
    ints (the negated-id tiebreak needs integer ids); callers fall back
    to the relational crossJoin+window assignment."""
    out = []
    for r in cent.select("list_id", "centroid").collect():
        lid = r["list_id"]
        if isinstance(lid, bool) or not isinstance(lid, int):
            return None
        out.append((int(lid), [float(x) for x in r["centroid"]]))
    return out or None


def _list_assign_literal_sql(
    cent_lits: list[tuple[int, list[float]]],
    sim_of,
    id_type: str,
) -> str:
    """Nearest-centroid assignment as ONE projection expression: argmax
    over literal centroids of (sim, -list_id) structs — the inverted-
    list twin of pq_encode's argmin codebook scan. Replaces the
    crossJoin(broadcast(cent)) -> Window(partitionBy id) -> row_number
    form, whose per-row arithmetic is identical but which additionally
    materializes n_lists rows per input row, sorts them map-side, and
    pays a full corpus Exchange for the window — plus the id equi-join
    (another corpus Exchange + sorts) to get the assignment back onto
    the vector row. At 100 TB that is the difference between zero and
    two full-corpus shuffles before the candidate join.

    Ordering semantics match the window exactly: array_max compares the
    struct fields with SQLOrderingUtil.compareDoubles — NaN greatest
    (the window's DESC NULLS/Nan-first pick), -0.0 == 0.0 — and the
    negated integer list_id breaks ties toward the SMALLER id, the
    window's ``list_id ASC`` tiebreak. ``sim_of`` must emit the same
    expression tree the relational form evaluated per (row, centroid)
    pair, with the centroid column replaced by the array literal, so
    every score is bit-identical."""
    structs = ", ".join(
        f"struct({sim_of(_array_sql(vec))} as s, {-lid}L as nl)"
        for lid, vec in cent_lits
    )
    return f"CAST(-(array_max(array({structs})).nl) AS {id_type})"


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


def lsh_bucket_expr(vec_sql: str, dim: int, planes: int = 8) -> F.Column:
    """Sign-pattern bucket id from `planes` fixed hyperplanes.

    ``vec_sql`` is the SQL name/fragment of an array<double> column.
    The whole expression — hyperplane array literals included — is
    assembled as ONE SQL string and shipped in a single F.expr call
    (see _dot_sql for why). HOF folds on purpose: `planes` unrolled
    dots fused into one projection overflow the codegen method limit
    (see dot())."""
    parts = []
    for p in range(planes):
        hp = _array_sql(_hyperplane(dim, p))
        parts.append(
            f"shiftleft(if({_dot_sql(vec_sql, hp)} > 0, 1L, 0L), {p})"
        )
    return F.expr(" ^ ".join(parts))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    planes: int = 8,
    multi_probe: int = 1,
    unroll_score: bool = False,
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
    index stays one row per vector.

    ``unroll_score`` controls the cosine form: the default HOF fold
    plans fast and is right for the bucketed candidate volume; flip it
    on only if a profile shows per-pair scoring dominating (see
    dot())."""
    _require(k=k, dim=dim, planes=planes)
    if planes > 62:
        raise ValueError(
            f"planes={planes}: bucket ids are signed 64-bit longs; more "
            f"than 62 sign bits would overflow the shiftleft"
        )
    if multi_probe not in (0, 1):
        raise ValueError(
            f"multi_probe={multi_probe}: only 0 (exact bucket) and 1 "
            f"(all Hamming-distance-1 buckets) are implemented — a larger "
            f"radius would silently deliver distance-1 recall"
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket_expr("qv", dim, planes))
    # hoist the query norm ABOVE the multi-probe explode: one fold per
    # QUERY, not one per probe row (and the broadcast ships one qn per
    # duplicated row either way, but never recomputes it)
    if unroll_score:
        q = q.withColumn("qn", norm(F.col("qv"), dim))
    else:
        q = q.withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
    if multi_probe >= 1:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
        )
        q = q.select(
            "query_id", "qv", "qn", F.explode(probes).alias("bucket")
        )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket_expr("cv", dim, planes))
    if unroll_score:
        # single unrolled pair dot; the fused cosine(a, b, dim) form
        # would pack three unrolled dots into one projection and trip
        # the 64 KB codegen limit (see dot())
        c = c.withColumn("cn", norm(F.col("cv"), dim))
        score = F.round(
            dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6
        )
    else:
        # per-side norm hoist: one fold per candidate pair, not three
        # (see brute_force_topk)
        c = c.withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
        score = F.expr(f"round(({_dot_sql('qv', 'cv')} / (qn * cn)), 6)")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", score)
        # a (query, neighbor) pair can meet in several probed buckets;
        # dedupe AFTER projecting the vectors away — the duplicate-drop
        # shuffle moves (ids, score), not two 64-double arrays per row
        .select("query_id", "neighbor_id", "score")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def ivf_index(
    corpus: DataFrame,
    *,
    n_lists: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF-flat inverted-list index RELATION — one row per
    corpus vector with its assigned list: (id, list_id, vector). The
    FAISS build/query split: persist this (e.g. as a catalog-managed
    table — complex-typed columns ride the envelope since
    ``cdc_apply_vectors``) and each query batch pays only its OWN
    centroid assignment plus the probed lists, never a corpus-wide
    assignment per batch. Feed it back via ``ivf_ann_topk(...,
    index=...)``; same seeding/rounding rules, so results equal the
    build-per-query form exactly. (Edge: if two SEED vectors are
    bit-identical, the tie sends one seed into the other's list and
    its own list is empty; the index path then probes only lists that
    exist, where the direct path would spend a probe on the empty one
    — recall can only improve.)"""
    idx = ivf_ann_topk(
        corpus,
        corpus.limit(0),
        n_lists=n_lists,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        _emit_index=True,
    )
    return idx


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
    _emit_index: bool = False,
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
    reproducible layout.

    ``index``: a prebuilt ``ivf_index`` relation (id, list_id, vector)
    — the corpus-side assignment is read from it instead of
    recomputed, and ``corpus`` may then be the same frame the index
    was built from or its catalog round-trip. Centroids re-derive
    from the index's OWN distinct list ids (list ids ARE the seed vec
    ids, and the seed vectors travel in the index) — no side-channel
    centroid file, and ``n_lists`` is IGNORED for the index path so a
    build/query parameter mismatch cannot silently orphan lists."""
    _require(k=k, n_lists=n_lists, n_probe=n_probe)
    if index is not None:
        cent = index.join(
            index.select(F.col("list_id").alias(id_col)).distinct(), id_col
        ).select(
            F.col(id_col).alias("list_id"),
            as_double_vec(F.col(vec_col)).alias("centroid"),
        )
    else:
        cent = (
            spread(corpus)
            .orderBy(F.col(id_col).asc())
            .limit(n_lists)
            .select(
                F.col(id_col).alias("list_id"),
                as_double_vec(F.col(vec_col)).alias("centroid"),
            )
        )
    if index is not None:
        c = index.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("list_id").alias("__asg"),
            as_double_vec(F.col(vec_col)).alias("cv"),
        )
    else:
        c = spread(corpus).select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )
    # per-side norm hoist (see brute_force_topk): centroid assignment
    # then costs one dot per (row, centroid) and the final scoring one
    # dot per candidate pair — in BOTH forms; the unrolled path must
    # never fuse three dots into one projection (64 KB codegen limit,
    # see dot())
    if dim is None:
        cent = cent.withColumn("__centn", F.expr(f"sqrt({_dot_sql('centroid', 'centroid')})"))
        c = c.withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
        q = q.withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
    else:
        cent = cent.withColumn("__centn", norm(F.col("centroid"), dim))
        c = c.withColumn("cn", norm(F.col("cv"), dim))
        q = q.withColumn("qn", norm(F.col("qv"), dim))

    def assign(df, vec, n_best, out_cols):
        vn = "cn" if vec == "cv" else "qn"
        if dim is not None:
            sim = F.round(
                dot(F.col(vec), F.col("centroid"), dim)
                / (F.col(vn) * F.col("__centn")),
                6,
            )
        else:
            sim = F.expr(
                f"round(({_dot_sql(vec, 'centroid')} / ({vn} * __centn)), 6)"
            )
        scored = df.crossJoin(F.broadcast(cent)).withColumn("__sim", sim)
        w = Window.partitionBy(out_cols[0]).orderBy(
            F.col("__sim").desc(), F.col("list_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_best)
            .select(*out_cols, "list_id")
        )

    # Literal-argmax corpus assignment (r11): when the corpus needs
    # assigning (no prebuilt index) and list ids are plain ints,
    # collect the n_lists centroids (bounded — the codebook-seed
    # pattern; collected via a plain TakeOrdered, no spread exchange)
    # and fuse the nearest-centroid pick into ONE projection on the
    # vector row. The relational `assign` form costs a corpus
    # Exchange for its window plus a corpus id equi-join (Exchange +
    # sorts on both sides) to re-attach the assignment; the fused form
    # costs zero shuffles and does the SAME per-row arithmetic. The
    # HOF fold is used for the per-centroid sims in BOTH dim branches:
    # n_lists unrolled dots fused into one projection would blow the
    # 64 KB codegen limit (measured — see dot()); values are
    # IEEE-identical either way.
    cent_lits = (
        _centroid_literals(
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_lists)
            .select(
                F.col(id_col).alias("list_id"),
                as_double_vec(F.col(vec_col)).alias("centroid"),
            )
        )
        if index is None
        else None
    )
    if cent_lits is not None:
        id_type = corpus.schema[id_col].dataType.simpleString()

        def _sim_of(lit: str) -> str:
            return f"round(({_dot_sql('cv', lit)} / (cn * sqrt({_dot_sql(lit, lit)}))), 6)"

        asg_sql = _list_assign_literal_sql(cent_lits, _sim_of, id_type)
        # probes-side assignment reuses the SAME collected centroids as
        # a local relation — one less corpus scan under the broadcast
        cent = corpus.sparkSession.createDataFrame(
            [(lid, vec) for lid, vec in cent_lits],
            schema="list_id long, centroid array<double>",
        ).select(F.col("list_id").cast(id_type).alias("list_id"), "centroid")
        cent = cent.withColumn(
            "__centn",
            F.expr(f"sqrt({_dot_sql('centroid', 'centroid')})")
            if dim is None
            else norm(F.col("centroid"), dim),
        )
    if _emit_index:
        # index-build mode: corpus assignment only, original vectors
        # carried through (float-exact for the catalog round-trip)
        if cent_lits is not None:
            base = spread(corpus).select(F.col(id_col), F.col(vec_col))
            base = base.withColumn("cv", as_double_vec(F.col(vec_col)))
            base = base.withColumn(
                "cn",
                F.expr(f"sqrt({_dot_sql('cv', 'cv')})")
                if dim is None
                else norm(F.col("cv"), dim),
            )
            return base.withColumn("list_id", F.expr(asg_sql)).select(
                F.col(id_col), "list_id", F.col(vec_col)
            )
        asg = assign(c.drop("__asg") if "__asg" in c.columns else c, "cv", 1, ["neighbor_id"])
        return asg.join(
            corpus.select(F.col(id_col), F.col(vec_col)),
            asg["neighbor_id"] == F.col(id_col),
        ).select(F.col(id_col), "list_id", F.col(vec_col))
    if index is not None:
        lists = c.withColumnRenamed("__asg", "list_id")
    elif cent_lits is not None:
        lists = c.withColumn("list_id", F.expr(asg_sql))
    else:
        lists = assign(c, "cv", 1, ["neighbor_id"]).join(c, "neighbor_id")
    probes = assign(q, "qv", n_probe, ["query_id"]).join(q, "query_id")
    pair_score = (
        F.round(dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn")), 6)
        if dim is not None
        else F.expr(f"round(({_dot_sql('qv', 'cv')} / (qn * cn)), 6)")
    )
    # the probe side is (queries x n_probe) rows — small by design at
    # any corpus scale; without the hint the planner's estimate for a
    # two-window subtree balloons and it falls back to a corpus-wide
    # SortMergeJoin on list_id
    scored = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", pair_score)
        # single-assignment IVF: each corpus vector lives in exactly
        # one list, so a (query, neighbor) pair meets in at most one
        # probed list — no dedup shuffle needed (the multi-probe LSH
        # path is the one that dedups)
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score", 6).alias("score"))
    )


def kmeans_lloyd(
    vectors: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd's algorithm): ``iters``
    full assign/update rounds from seeded centroids, returning the
    final per-vector (cluster, cosine score) assignment.

    The ivf_ann_topk docstring's objection to Lloyd training —
    partition-order double averaging — is solved here by computing
    centroid means in EXACT integer space: each component is quantized
    ``floor(x * 2^30)`` (floor of a double is exact; the quantization
    error ~1e-9 is far below any clustering-relevant signal), summed
    as BIGINT (order-independent, overflow-safe to ~2^23 vectors per
    cluster at 2^30 scale — at larger corpora drop to 2^24 scale), and
    divided back in ONE IEEE double op. Every step is reproducible
    bit-for-bit across engines, which is what lets a SQL oracle replay
    the whole iteration exactly. Raw decimal sums of doubles would NOT
    be: Spark's shortest-string vs DuckDB's exact-binary double->
    decimal conversion disagree near rounding boundaries (see the
    registry determinism notes).

    Scale shape per iteration: assignment is a pure projection of the
    corpus against k inlined centroid literals (HOF folds — k unrolled
    cosines would overflow the codegen method limit, see dot()); the
    update is a posexplode to (cluster, dim) and ONE map-side-
    combinable integer aggregation of k*dim groups; centroids come
    back to the driver as k*dim longs (bounded metadata, the same
    collect every distributed Lloyd implementation does). Empty
    clusters keep their previous centroid.

    Ties (on the 6dp-rounded cosine) break to the smaller cluster
    label; cluster labels are the seed vectors' ids (the k smallest
    corpus ids, the ivf_ann_topk seeding rule)."""
    _require(k=k, dim=dim)
    if not isinstance(iters, int) or isinstance(iters, bool) or iters < 0:
        raise ValueError(f"iters={iters!r}: must be a non-negative integer")
    scale = float(1 << 30)
    e = (
        spread(vectors)
        .select(F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v"))
        .persist()
    )
    seed_rows = e.orderBy(F.col("id").asc()).limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (int(r["id"]), list(r["v"])) for r in seed_rows
    ]

    def assign(cur):
        # one SQL string -> one Py4J call (see _dot_sql)
        sims = F.expr(
            "array("
            + ", ".join(
                f"named_struct('sim', round({_cosine_sql('v', _array_sql(cv))}, 6), "
                f"'nc', {-cid}L)"
                for cid, cv in cur
            )
            + ")"
        )
        best = F.array_max(sims)
        return e.select(
            "id",
            "v",
            (-best["nc"]).cast("long").alias("cluster"),
            best["sim"].alias("score"),
        )

    for _ in range(iters):
        rows = (
            assign(cents)
            .select("cluster", F.posexplode("v").alias("d", "x"))
            .withColumn("q", F.floor(F.col("x") * scale).cast("long"))
            .groupBy("cluster", "d")
            .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["d"])] = float(
                r["s"]
            ) / (int(r["n"]) * scale)
        cents = [
            (cid, [by_cluster[cid][d] for d in range(dim)] if cid in by_cluster else cv)
            for cid, cv in cents
        ]

    final = assign(cents).select(
        F.col("id").alias(id_col), "cluster", F.col("score")
    )
    e.unpersist()
    return final


def quantize_int8(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension int8 scalar quantization of an embedding column —
    the 4x storage/bandwidth reduction step an embedding store applies
    before indexing (the scalar-quantization baseline of FAISS/IVF-SQ,
    public). Each dimension d gets a corpus-wide [min_d, max_d] range;
    a component quantizes to ``floor((x - min_d) / (max_d - min_d) *
    255) - 128`` (code in [-128, 127]; a constant dimension codes 0).

    Deterministic by construction: min/max involve no accumulation,
    the affine map is one IEEE double expression per element, and
    floor of a double is exact — so codes are bit-identical across
    engines/partitionings and the DuckDB oracle replays them.

    Scale shape: one posexplode to (vector, dim) rows, a dim-sized
    min/max aggregate (map-side combinable; dim rows out), a BROADCAST
    join of those stats back, and one regroup to rebuild the code
    array — the regroup shuffles int codes, not doubles, which is the
    point of quantizing before moving data. The rebuild's
    array_sort+transform runs on bounded per-vector arrays."""
    ex = spread(vectors).select(
        F.col(id_col).alias("id"),
        F.posexplode(as_double_vec(F.col(vec_col))).alias("d", "x"),
    )
    stats = ex.groupBy("d").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    coded = ex.join(F.broadcast(stats), "d").withColumn(
        "code",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255)
            - 128
        )
        .cast("int"),
    )
    return (
        coded.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .select(F.col("id").alias(id_col), "codes")
    )


def _py_cos(a, b) -> float:
    """Driver-side exact cosine for centroid-pair pruning — bounded to
    n_lists^2 evaluations of config-sized vectors, never corpus data."""
    import math

    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return max(-1.0, min(1.0, d / (na * nb)))


def _ball_centroids(df: DataFrame, n_lists: int) -> list[tuple[int, list]]:
    """Deterministic seed centroids for metric ball partitioning: the
    ``n_lists`` smallest ids (the ``ivf_ann_topk`` seeding rule).
    Bounded collect — n_lists config-sized vectors."""
    rows = df.orderBy(F.col("id").asc()).limit(n_lists).collect()
    return [(int(r["id"]), list(r["v"])) for r in rows]


def _ball_assign(df: DataFrame, cents: list[tuple[int, list]]) -> DataFrame:
    """Nearest-centroid assignment as a pure projection: array_max over
    (cosine, list_id) structs — ties to the larger list id,
    deterministic; adds ``theta`` = angular distance to the assigned
    centroid. The WHOLE sims array — centroid literals and all — is one
    SQL string / one Py4J call (the per-Column form spent ~1.4 s per
    build in socket round trips at n_lists=16 x dim=64, see _dot_sql);
    the HOF folds on purpose — n_lists unrolled cosines in one array
    overflow the codegen method limit (see dot()). Returned PERSISTED:
    the caller's radii action materializes it and the pair-join sides
    then read the cache instead of re-running the assignment."""
    sims = F.expr(
        "array("
        + ", ".join(
            f"named_struct('sim', {_cosine_sql('v', _array_sql(cv))}, "
            f"'list_id', {int(cid)}L)"
            for cid, cv in cents
        )
        + ")"
    )
    best = F.array_max(sims)
    return df.select(
        "id",
        "v",
        best["list_id"].alias("list_id"),
        F.acos(F.least(F.greatest(best["sim"], F.lit(-1.0)), F.lit(1.0))).alias("theta"),
    ).persist()


def _ball_radii(assigned: DataFrame) -> dict[int, float]:
    """Per-list angular radius — one tiny action (n_lists rows)."""
    return {
        int(r["list_id"]): float(r["r"])
        for r in assigned.groupBy("list_id").agg(F.max("theta").alias("r")).collect()
    }


def _ball_survivors(
    cents_a: list[tuple[int, list]],
    cents_b: list[tuple[int, list]],
    radii_a: dict[int, float],
    radii_b: dict[int, float],
    theta_t: float,
) -> list[tuple[int, int]]:
    """Triangle-inequality list-pair pruning against the centroid angle
    matrix (pure Python over <= n_lists^2 pairs): (A, B) can contain a
    qualifying pair only if theta(c_A, c_B) - r_A - r_B <= theta_t.
    Conservative bound + fp slack — over-keeping is only extra work,
    under-keeping would change the answer. Lists absent from a radii
    dict are empty: nothing to join."""
    import math

    out = []
    for la, va in cents_a:
        for lb, vb in cents_b:
            if la not in radii_a or lb not in radii_b:
                continue
            theta_cc = math.acos(_py_cos(va, vb))
            if theta_cc - radii_a[la] - radii_b[lb] <= theta_t + 1e-6:
                out.append((la, lb))
    return out


def embedding_near_duplicates(
    vectors: DataFrame,
    *,
    threshold: float = 0.4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold — the EXPLICITLY QUADRATIC
    correctness baseline (cross join + post-filter). Never run this at
    corpus scale; ``embedding_near_duplicates_bucketed`` is the primary
    operator and produces the identical output through a bucketed
    equi-join plan."""
    a = spread(vectors).select(F.col(id_col).alias("a_id"), as_double_vec(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("b_id"), as_double_vec(F.col(vec_col)).alias("vb"))
    # Norms hoisted to one per SIDE row (see cosine()/dot()): a fused
    # 3-dot unrolled cosine inside the join consume overflows the JVM
    # 64 KB method limit and silently drops the whole pair-scoring
    # stage to interpreted execution. The norms use the HOF fold form
    # (dim=None) on purpose: BroadcastNestedLoopJoin inlines the
    # streamed side's projection into the same processNext() as the
    # pair scoring, so an unrolled norm + unrolled dot still overflows
    # — the fold is a small CodegenFallback island per ROW while the
    # O(N^2) per-PAIR dot stays unrolled and compiled. Same fold
    # order, so values are bit-identical to the fused form.
    a = a.withColumn("na", norm(F.col("va"), None))
    b = b.withColumn("nb", norm(F.col("vb"), None))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "score",
            dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("score") >= threshold)
        .select("a_id", "b_id", F.round("score", 6).alias("score"))
    )


def embedding_near_duplicates_bucketed(
    vectors: DataFrame,
    *,
    threshold: float = 0.4,
    n_lists: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold through a bucketed equi-join
    plan — output IDENTICAL to ``embedding_near_duplicates`` (no recall
    loss), which is what lets the same all-pairs SQL oracle verify it.

    Why not sign-hyperplane LSH: at threshold 0.4 the qualifying pairs
    sit at ~60-66 degrees, where per-plane agreement is ~0.63; banded
    sign-LSH needs so many bands for recall ~1 that the bucket join
    does MORE work than all-pairs (e.g. 4-plane bands need ~76 bands
    for 1e-4 miss probability = 4.75*N^2 pair evaluations). Hyperplane
    buckets only pay off for tight thresholds (>~0.9).

    Instead: metric ball partitioning. Vectors are assigned to
    ``n_lists`` deterministic seed centroids (the n_lists smallest
    ids — same seeding rule as ``ivf_ann_topk``); angular distance is
    a metric on the sphere, so a list pair (A, B) can contain a
    qualifying pair only if

        theta(c_A, c_B) - r_A - r_B <= acos(threshold)

    (triangle inequality; r = list angular radius). Only surviving
    list pairs are joined — an equi-join on list id, never a cartesian
    product — and every joined pair is exact-cosine verified, so the
    pruning changes WORK, not the answer.

    Scale shape: centroid assignment is a pure projection against
    n_lists inlined centroid literals (the corpus never shuffles for
    it); radii are an n_lists-row aggregate; the list-pair candidate
    table is <= n_lists^2 rows and broadcast; the pair join shuffles
    by list id (AQE skew-join handles fat lists). On a clustered
    corpus most list pairs prune; on adversarially uniform data the
    comparison count degrades toward N^2 — which is the true lower
    bound there, since near-threshold pairs at 60+ degrees are not
    separable by any metric blocking — but the work stays distributed
    and memory-bounded either way. The assignment frame is persisted
    between the radii action and the pair join and RELEASED once the
    verified pairs are materialized (same cache-lifetime contract as
    dedup._verify_pairs: the returned frame is the persisted result —
    a handful of pair rows — and long-lived callers can .unpersist()
    it once consumed; the full-corpus assignment cache never outlives
    the call).
    """
    import math

    e = vectors.select(F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v"))
    cents = _ball_centroids(e, n_lists)
    assigned = _ball_assign(e, cents)
    radii = _ball_radii(assigned)
    theta_t = math.acos(max(-1.0, min(1.0, threshold)))
    survivors = _ball_survivors(cents, cents, radii, radii, theta_t)
    spark = vectors.sparkSession
    cand = spark.createDataFrame(survivors or [(-1, -1)], "list_a long, list_b long")

    # norms hoisted per side, HOF-fold form — see
    # embedding_near_duplicates (codegen 64 KB method limit: per-row
    # fold islands, per-pair dot stays unrolled); bit-identical values
    a = assigned.select(
        F.col("id").alias("a_id"), F.col("v").alias("va"), F.col("list_id").alias("list_a")
    ).withColumn("na", norm(F.col("va"), None))
    b = assigned.select(
        F.col("id").alias("b_id"), F.col("v").alias("vb"), F.col("list_id").alias("list_b")
    ).withColumn("nb", norm(F.col("vb"), None))
    out = (
        a.join(F.broadcast(cand), "list_a")
        .join(b, "list_b")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "score",
            dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("score") >= threshold)
        .select("a_id", "b_id", F.round("score", 6).alias("score"))
        .persist()
    )
    out.count()
    assigned.unpersist()
    return out


def pq_encode(
    vectors: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: list[str] | None = None,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """Product quantization (the FAISS PQ baseline, public): split each
    vector into ``m`` subvectors of ``dim/m`` components; per subspace,
    code = the index of the nearest of ``k`` codebook centroids
    (squared L2, deterministic tiebreak to the smaller index). Output
    is one int code column per subspace plus the total squared
    reconstruction-distance proxy — the 32x compression step before an
    IVF-PQ index.

    Codebook: the ``k`` corpus vectors with the smallest ids (the
    seeded-sample initialization every PQ trainer starts from; the
    Lloyd refinement loop is ``kmeans_lloyd`` and composes on top).
    That makes training a bounded O(k) driver collect, and encoding a
    ZERO-SHUFFLE narrow projection: the codebook rides into the plan
    as literals (the closure-broadcast pattern — no join side at all),
    so encoding streams over a 100 TB embedding table at scan speed.

    Determinism contract (same rules as the ANN operators): each
    subspace distance is an 8-term left-associated sum of exact IEEE
    double expressions, rounded to 6dp BEFORE the argmin, and the
    reconstruction error is the left-associated sum of the m chosen
    (already-rounded) distances — bit-identical in any engine that
    evaluates the same expression tree, which the DuckDB oracle does.

    Sizing note: literal inlining is right for small codebooks (the
    m*k*sub_d expression tree compiles once and streams). At FAISS's
    kc=256 a codegen unit would bloat — there the codebook becomes a
    BROADCAST (sub, code) -> centroid table and the ADC a join, same
    zero-shuffle corpus side."""
    _require(m=m, k=k, dim=dim)
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub_d = dim // m
    if codebook is not None:
        # caller already holds the deterministic smallest-id seed
        # vectors (e.g. ivfpq_ann_topk's single head collect serves
        # the ADC table, the centroid literals AND this codebook) —
        # skip the redundant collect action
        cents = [[float(x) for x in v] for v in codebook]
    else:
        seeds = (
            vectors.orderBy(id_col).limit(k).select(vec_col).collect()
        )
        cents = [[float(x) for x in r[vec_col]] for r in seeds]
    if len(cents) != k:
        raise ValueError(
            f"corpus has only {len(cents)} vectors — smaller than the "
            f"codebook k={k}"
        )

    # Three stacked projections keep the expression tree small: cast
    # each element once, difference each (element, centroid) pair once,
    # then fold — vs inlining, which repeats every cast 2k times and
    # bloats the codegen unit past the JIT threshold. ``carry_cols``
    # ride through every projection unchanged so a caller can fuse its
    # own per-row derivation (the IVF list assignment) into this single
    # narrow pass instead of paying an id equi-join to re-attach it.
    carry = [f"`{c}`" for c in (carry_cols or [])]
    elems = vectors.selectExpr(
        f"`{id_col}`",
        *carry,
        *[f"CAST(`{vec_col}`[{i}] AS DOUBLE) as __v{i}" for i in range(dim)],
    )

    def d2(s: int, c: int) -> str:
        terms = " + ".join(
            f"__d{s}_{c}_{i} * __d{s}_{c}_{i}" for i in range(sub_d)
        )
        return f"round({terms}, 6)"

    diffs = [
        f"(__v{s * sub_d + i} - ({cents[c][s * sub_d + i]!r})) as __d{s}_{c}_{i}"
        for s in range(m)
        for c in range(k)
        for i in range(sub_d)
    ]
    best = [
        f"array_min(array({', '.join(f'struct({d2(s, c)} as d, {c} as c)' for c in range(k))})) as __m{s}"
        for s in range(m)
    ]
    err = " + ".join(f"__m{s}.d" for s in range(m))
    return (
        elems.selectExpr(f"`{id_col}`", *carry, *diffs)
        .selectExpr(f"`{id_col}`", *carry, *best)
        .selectExpr(
            f"`{id_col}`",
            *carry,
            *[f"CAST(__m{s}.c AS INT) as code{s}" for s in range(m)],
            f"round({err}, 6) as recon_err",
        )
    )


def ivfpq_index(
    corpus: DataFrame,
    *,
    n_lists: int = 16,
    m: int = 8,
    kc: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the persisted IVF-PQ index relation — one row per corpus
    vector: (id, list_id, code0..code{m-1}), every column an integer
    scalar, so it rides the CDC envelope with no complex-type support
    needed at all. The compressed twin of ``ivf_index``: 32x less
    index bandwidth at query time. Query via ``ivfpq_ann_topk(...,
    index=...)`` with the SAME corpus frame (or its catalog
    round-trip) — centroids, PQ codebook, and the exact-rerank
    vectors all re-derive from the corpus by the deterministic
    smallest-id seeding, so nothing else needs persisting."""
    return ivfpq_ann_topk(
        corpus,
        corpus.limit(0),
        n_lists=n_lists,
        m=m,
        kc=kc,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        _emit_index=True,
    )


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    m: int = 8,
    kc: int = 16,
    dim: int = 64,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
    _emit_index: bool = False,
) -> DataFrame:
    """IVF-PQ approximate top-k — the full FAISS index shape: IVF
    restricts WHICH corpus vectors a query scores (probe the n_probe
    nearest inverted lists); PQ restricts WHAT moves through the
    candidate join (m int8 codes instead of ``dim`` floats — the
    32x-bandwidth point of the method); ADC (asymmetric distance,
    query-to-centroid per code) ranks candidates; the top ``rerank``
    survivors are re-scored with exact cosine and the top ``k`` kept.

    All-relational: centroid assignment and PQ codes reuse the seeded
    deterministic constructions of ``ivf_ann_topk`` / ``pq_encode``;
    the ADC lookup is a per-subspace CASE over the code column with the
    codebook inlined as literals (no table, no join for the distance
    math); the only joins are the id-keyed code attach and the list-id
    candidate equi-join. Approximate by design (IVF recall x PQ
    ranking noise); deterministic seeding + rounded-before-argmin
    distances make it oracle-reproducible (hash-checked since r6) —
    recall floors additionally asserted in tests."""
    _require(k=k, n_lists=n_lists, n_probe=n_probe, m=m, kc=kc, rerank=rerank)
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if rerank < k:
        raise ValueError(
            f"rerank={rerank} < k={k}: the exact-rerank shortlist would "
            f"silently return fewer than k neighbors"
        )
    sub_d = dim // m
    if index is not None:
        # centroids re-derive from the index's OWN distinct list ids
        # (list ids ARE seed vec ids; the corpus carries their
        # vectors) — n_lists is IGNORED for the index path, so a
        # build/query parameter mismatch cannot silently orphan lists
        # (the same guard ivf_ann_topk documents; kc remains the one
        # undetectable parameter, and the ADC CASE fails SAFE on it).
        cent = (
            corpus.join(
                index.select(F.col("list_id").alias(id_col)).distinct(), id_col
            ).select(
                F.col(id_col).alias("list_id"),
                as_double_vec(F.col(vec_col)).alias("centroid"),
            )
        )
    else:
        cent = (
            spread(corpus)
            .orderBy(F.col(id_col).asc())
            .limit(n_lists)
            .select(
                F.col(id_col).alias("list_id"), as_double_vec(F.col(vec_col)).alias("centroid")
            )
        )
    # ONE bounded head collect serves all three driver-side needs
    # (r11): the ADC codebook (first kc vectors), the literal
    # assignment centroids (first n_lists (id, vector) pairs), and —
    # threaded through pq_encode's ``codebook`` parameter — the PQ
    # encoder's seeds, which previously re-collected the same rows in
    # a second action.
    nhead = kc if index is not None else max(kc, n_lists)
    head = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(nhead)
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in head[:kc]]
    if len(cents) != kc:
        raise ValueError(
            f"corpus has only {len(cents)} vectors — smaller than the "
            f"codebook k={kc}"
        )

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )

    def assign(df, vec, n_best, out_cols):
        sim = F.expr(f"round({_cosine_sql(vec, 'centroid')}, 6)")
        scored = df.crossJoin(F.broadcast(cent)).withColumn("__sim", sim)
        w = Window.partitionBy(out_cols[0]).orderBy(
            F.col("__sim").desc(), F.col("list_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_best)
            .select(*out_cols, "list_id")
        )

    code_cols = [f"code{s}" for s in range(m)]

    # Literal-argmax corpus assignment fused INTO the PQ encode pass
    # (r11, see _list_assign_literal_sql): with the n_lists centroids
    # collected (bounded — the same contract as the `seeds` codebook
    # collect above), list assignment and PQ codes both become narrow
    # projections of the same corpus scan, so the whole index side of
    # the query is ZERO-shuffle. The relational form paid a corpus
    # Exchange for the assignment window plus an Exchange+sort pair
    # for the codes equi-join. Same per-row arithmetic, bit-identical
    # assignment (__cn hoists the row's self-norm out of the
    # per-centroid cosine — same subtree, evaluated once).
    cent_lits = None
    if index is None:
        cent_lits = [
            (int(r[id_col]), [float(x) for x in r[vec_col]])
            for r in head[:n_lists]
            if isinstance(r[id_col], int) and not isinstance(r[id_col], bool)
        ] or None
        if cent_lits is not None and len(cent_lits) != len(head[:n_lists]):
            cent_lits = None  # mixed/non-int ids: relational fallback
    if cent_lits is not None:
        # probes-side assignment (the `assign` closure reads `cent`
        # late-bound) reuses the SAME collected centroids as a local
        # relation — one less corpus scan under its broadcast build
        cent = corpus.sparkSession.createDataFrame(
            [(lid, vec) for lid, vec in cent_lits],
            schema="list_id long, centroid array<double>",
        ).select(
            F.col("list_id")
            .cast(corpus.schema[id_col].dataType.simpleString())
            .alias("list_id"),
            "centroid",
        )

    def _fused_lists():
        id_type = corpus.schema[id_col].dataType.simpleString()

        def _sim_of(lit: str) -> str:
            return (
                f"round(({_dot_sql('cv', lit)} / "
                f"(__cn * sqrt({_dot_sql(lit, lit)}))), 6)"
            )

        asg_sql = _list_assign_literal_sql(cent_lits, _sim_of, id_type)
        cwl = (
            spread(corpus)
            .withColumn("cv", as_double_vec(F.col(vec_col)))
            .withColumn("__cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
            .withColumn("__list", F.expr(asg_sql))
            .drop("cv", "__cn")
        )
        return pq_encode(
            cwl, m=m, k=kc, dim=dim, id_col=id_col, vec_col=vec_col,
            carry_cols=["__list"], codebook=cents,
        )

    if _emit_index:
        if cent_lits is not None:
            return _fused_lists().select(
                F.col(id_col), F.col("__list").alias("list_id"), *code_cols
            )
        codes = pq_encode(
            corpus, m=m, k=kc, dim=dim, id_col=id_col, vec_col=vec_col,
            codebook=cents,
        ).select(F.col(id_col).alias("neighbor_id"), *code_cols)
        return (
            assign(c, "cv", 1, ["neighbor_id"])
            .join(codes, "neighbor_id")
            .select(F.col("neighbor_id").alias(id_col), "list_id", *code_cols)
        )
    if index is not None:
        missing = [x for x in code_cols if x not in index.columns]
        if missing:
            raise ValueError(
                f"index lacks PQ code columns for m={m} (first missing: "
                f"{missing[0]}) — index built with a different m? (kc must "
                "also match the build; it is not schema-detectable)"
            )
        lists = index.select(
            F.col(id_col).alias("neighbor_id"), "list_id", *code_cols
        )
    elif cent_lits is not None:
        lists = _fused_lists().select(
            F.col(id_col).alias("neighbor_id"),
            F.col("__list").alias("list_id"),
            *code_cols,
        )
    else:
        codes = pq_encode(
            corpus, m=m, k=kc, dim=dim, id_col=id_col, vec_col=vec_col,
            codebook=cents,
        ).select(F.col(id_col).alias("neighbor_id"), *code_cols)
        lists = assign(c, "cv", 1, ["neighbor_id"]).join(codes, "neighbor_id")

    # ADC distance TABLE per query — the standard IVF-PQ query-prep
    # step: for each subspace s, an array of the kc squared distances
    # from the query's subvector to every codebook centroid, computed
    # ONCE per query row on the (small, broadcast) query side. The
    # previous form inlined the full m*kc*sub_d-term arithmetic as one
    # CASE expression per CANDIDATE row; at the default 8*16*8 that is
    # a ~2000-node expression tree, which janino refused to compile
    # inside the shortlist sort's whole-stage codegen — Spark silently
    # demoted the ranking sort to interpreted execution (the one
    # codegen ERROR in the r10 bare gate). HOF folds are deliberate
    # here (same rationale as _dot_sql): tiny expression tree, and the
    # interpreted per-element cost lands on query rows only, never on
    # the candidate stream. Bit-identical to the inlined form: each
    # element is the same left-associated (q[i]-c[i])^2 sum (the fold's
    # leading 0.0 add is an exact IEEE no-op on squares), and the
    # candidate-side sum keeps the same subspace order.
    adc_tabs = [
        "transform(array({cs}), c -> aggregate("
        "zip_with(slice(qv, {start}, {n}), c, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, v) -> acc + v)) as __adct{s}".format(
            cs=", ".join(
                _array_sql(cents[c_ix][s * sub_d:(s + 1) * sub_d])
                for c_ix in range(kc)
            ),
            start=s * sub_d + 1,
            n=sub_d,
            s=s,
        )
        for s in range(m)
    ]
    probes = (
        assign(q, "qv", n_probe, ["query_id"])
        .join(q, "query_id")
        .selectExpr("query_id", "list_id", "qv", *adc_tabs)
    )

    # Per-candidate ADC is now m table lookups. The range CASE keeps
    # the old fail-safe exactly: an out-of-range code (index built
    # with a larger kc than queried — the one undetectable mismatch)
    # must rank WORST, not ride a NULL to the top of the ascending
    # NULLS FIRST shortlist window and crowd out the rerank budget.
    adc = " + ".join(
        f"(CASE WHEN code{s} >= 0 AND code{s} < {kc} "
        f"THEN element_at(__adct{s}, code{s} + 1) "
        f"ELSE cast('Infinity' as double) END)"
        for s in range(m)
    )
    # Explicit broadcast: the probe side is (queries x n_probe) rows —
    # small by design at any corpus scale — but it sits under two
    # windows and a join, so the planner's size estimate balloons and
    # it previously chose a SortMergeJoin (full exchange+sort of the
    # corpus-sized code table on list_id).
    cand = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # single-assignment IVF: a (query, neighbor) pair meets in at
        # most one probed list — no dedup shuffle needed
        .withColumn("__adc", F.expr(f"round({adc}, 6)"))
        # drop qv (and the ADC tables) BEFORE the ranking shuffle: the
        # shortlist window needs only (query, neighbor, distance);
        # re-attach qv to the <= rerank survivors from the broadcast
        # query side instead of shuffling dim doubles per candidate
        .select("query_id", "neighbor_id", "__adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= rerank)
        .select("query_id", "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    exact = shortlist.join(c, "neighbor_id").withColumn(
        "score", F.expr(f"round({_cosine_sql('qv', 'cv')}, 6)")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "score")
    )


def embedding_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    *,
    threshold: float = 0.4,
    n_lists: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic (embedding-space) decontamination: every (train,
    benchmark) pair with cosine >= threshold — the embedding-level
    complement of the n-gram benchmark-overlap sweep
    (``text.decontaminate_pairs``): paraphrased or reformatted eval
    items that share no 8-gram with a training doc still collide in
    embedding space. Output grain is the qualifying pair
    (train_id, bench_id, score); dropping every train_id present in
    the output is the decontamination step.

    Same metric ball partitioning as
    ``embedding_near_duplicates_bucketed`` (see there for why
    sign-LSH loses at loose thresholds), two-set form: both sides are
    assigned to the SAME seed centroids (the n_lists smallest train
    ids), radii are tracked PER SIDE, and a (train list, bench list)
    pair survives only if ``theta(c_a, c_b) - r_a - r_b <=
    acos(threshold)`` — an equi-join on list ids, never a cartesian
    product, every surviving pair exact-cosine verified (pruning
    changes WORK, not the answer; the all-pairs oracle verifies
    output equality). Benchmarks are small (thousands of rows), so
    the bench side is the natural broadcast side at scale and the
    train corpus never self-joins at all."""
    import math

    t = train.select(F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v"))
    b = bench.select(F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v"))
    cents = _ball_centroids(t, n_lists)
    ta, ba = _ball_assign(t, cents), _ball_assign(b, cents)
    radii_t, radii_b = _ball_radii(ta), _ball_radii(ba)
    theta_t = math.acos(max(-1.0, min(1.0, threshold)))
    survivors = _ball_survivors(cents, cents, radii_t, radii_b, theta_t)
    spark = train.sparkSession
    cand = spark.createDataFrame(survivors or [(-1, -1)], "list_t long, list_b long")

    # norms hoisted per side, HOF-fold form — see
    # embedding_near_duplicates (codegen 64 KB method limit: per-row
    # fold islands, per-pair dot stays unrolled); bit-identical values
    lt = ta.select(
        F.col("id").alias("train_id"), F.col("v").alias("vt"),
        F.col("list_id").alias("list_t"),
    ).withColumn("nt", norm(F.col("vt"), None))
    lb_ = ba.select(
        F.col("id").alias("bench_id"), F.col("v").alias("vb"),
        F.col("list_id").alias("list_b"),
    ).withColumn("nb", norm(F.col("vb"), None))
    out = (
        lt.join(F.broadcast(cand), "list_t")
        .join(lb_, "list_b")
        .withColumn(
            "score",
            dot(F.col("vt"), F.col("vb"), dim) / (F.col("nt") * F.col("nb")),
        )
        .filter(F.col("score") >= threshold)
        .select("train_id", "bench_id", F.round("score", 6).alias("score"))
    )
    # Materialize ONCE (localCheckpoint cuts lineage to the two cached
    # assignments), then release both caches — nothing persisted is
    # handed back (the repo persist rule); the checkpoint blocks are
    # reclaimed by the ContextCleaner when the frame is GC'd.
    out = out.localCheckpoint()
    ta.unpersist()
    ba.unpersist()
    return out


def hybrid_retrieval(
    docs: DataFrame,
    emb: DataFrame,
    *,
    query_ids,
    k: int = 10,
    rrf_k: int = 60,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical + dense retrieval fused by Reciprocal Rank
    Fusion (Cormack, Clarke & Buettcher, SIGIR 2009, public) — the
    standard RAG serving pattern: keyword recall catches what the
    embedding misses (rare names, codes), dense recall catches
    paraphrases, and RRF combines the two rankings with no score
    calibration at all: ``score = sum(1 / (rrf_k + rank))`` over the
    lists a document appears in.

    Legs, both engine-exact:
    - dense: ``brute_force_topk`` cosine (rounded 6dp, ties by id);
    - lexical: shared-DISTINCT-token scoring with LINEAR idf weights
      ``N - df`` (integer-exact — the same engine-portable idf the
      tf-idf operator uses; no log), ties by id.
    RRF contributions round to 8dp before the one addition, so the
    fused score is two deterministic doubles added once — bit-equal
    across engines, no order-dependent accumulation.

    Scale: the lexical leg joins the QUERY docs' tokens (tiny side)
    against the corpus token relation on the token key — one
    broadcast-eligible equi-join + one (query, candidate) aggregation;
    the dense leg is the existing broadcast-query scoring stage. No
    all-pairs anywhere; at 100 TB swap the legs' candidate generators
    for the inverted-index and IVF operators, same fusion."""
    from .text import tokens as _tokens

    _require(k=k, rrf_k=rrf_k)
    qids = list(query_ids)
    if not qids:
        raise ValueError("query_ids is empty: nothing to retrieve for")
    tok = (
        _tokens(docs, id_col=doc_id_col, text_col=text_col)
        .filter(F.col("token") != "")
        .distinct()
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    nd = docs.agg(F.count(F.lit(1)).alias("__n"))
    qt = tok.filter(F.col(doc_id_col).isin(qids)).select(
        F.col(doc_id_col).alias("query_id"), "token"
    )
    cand = tok.select(F.col(doc_id_col).alias("doc_id"), "token")
    lex = (
        qt.join(cand, "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("__n") - F.col("__df")).cast("bigint").alias("__ls"))
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("__ls").desc(), F.col("doc_id"))
    lex_top = (
        lex.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= k)
        .select("query_id", "doc_id", "lex_rank")
    )
    dense_top = brute_force_topk(
        # .limit(len(qids)) is a semantic no-op (ids are unique) that
        # makes the broadcast query side PROVABLY bounded in the plan
        # (scale-audit certification) and lets the scan short-circuit
        emb, emb.filter(F.col(vec_id_col).isin(qids)).limit(len(qids)),
        k=k, dim=None, id_col=vec_id_col, vec_col=vec_col,
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("dense_rank")
    )
    fused = dense_top.join(lex_top, ["query_id", "doc_id"], "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0).cast("double") / (F.lit(rrf_k) + F.col(r)), 8), F.lit(0.0)
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rrf_score", contrib("dense_rank") + contrib("lex_rank"))
        .withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "dense_rank", "lex_rank", "rrf_score", "rnk")
    )
