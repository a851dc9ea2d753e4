"""Scale-out operators: deterministic sampling, histograms, and skew
mitigation (salted aggregation / salted join).

The reference has none of these (its only parallelism story is the
1-partition JdbcRDD TODO, SURVEY.md §6); a 100 TB training-data
pipeline needs all three constantly:

- ``deterministic_sample`` replaces ``df.sample()`` where the sample
  must be reproducible across engines, runs, and partitionings: the
  keep-decision hashes the ROW KEY (md5), not a partition-local RNG
  seed, so resharding the input cannot change membership and a DuckDB
  oracle can verify it exactly.
- ``histogram`` is one map-side-combinable groupBy over a closed-form
  bucket id — no sort, no per-bucket pass.
- ``salted_agg`` / ``salted_join`` break hot keys across ``salt``
  sub-keys. AQE's skew-join handles most cases at runtime; the salted
  forms are for the aggregations AQE cannot split (a single hot
  group) and for deterministic plans in pinned pipelines. Results are
  EXACT — salting only reshapes the shuffle — so both stay under the
  DuckDB oracle gate.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "deterministic_sample", "histogram", "salted_agg", "salted_join",
    "token_budget_cap", "shard_manifest", "mixture_rebalance", "pack_batches",
    "split_assign",
]


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, *, strata: Sequence[str] = ()
) -> DataFrame:
    """Keep a row iff the first 8 hex chars of md5(strata... ':' key)
    sort below ``fraction`` of the 32-bit space. Lowercase-hex string
    comparison IS numeric comparison (same length, '0'-'9' < 'a'-'f'),
    so the predicate is engine-portable as a plain string compare —
    md5 of a decimal-string key, reshuffle-stable, per-stratum
    uniform."""
    parts = [*[F.col(s).cast("string") for s in strata], F.col(key_col).cast("string")]
    bucket = F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8)
    return df.filter(bucket < F.lit(_hex_threshold(fraction)))


def _hex_threshold(fraction: float) -> str:
    """8-hex-char threshold for 'md5-prefix < threshold' keep rules.
    fraction >= 1.0 must keep EVERYTHING: format(0x100000000) would be
    a 9-char string whose lexicographic compare breaks the same-length
    invariant (only hashes starting '0' would pass) — the sentinel 'g'
    sorts above every hex string instead."""
    n = int(fraction * 0x100000000)
    return "g" if n >= 0x100000000 else format(n, "08x")


def histogram(
    df: DataFrame, value_col: str, *, lo: float, hi: float, buckets: int
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over [lo, hi): returns
    (bucket, lo_edge, count). Out-of-range rows clamp into the edge
    buckets. One partial-aggregated shuffle of at most ``buckets``
    groups."""
    width = (hi - lo) / buckets
    # clamp in the DOUBLE domain BEFORE floor (the numeric_drift rule,
    # r6 review): floor of a far-outlier/inf quotient overflows BIGINT
    # and dies under ANSI before a post-floor clamp could save it
    scaled = (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(buckets - 1)))
    b = F.floor(clamped).cast("int")
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("lo_edge", F.lit(lo) + F.col("bucket") * F.lit(width))
        .select("bucket", "lo_edge", "n")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys..., salt) — spreading one hot key over ``salt`` reducers —
    phase 2 merges the partials on keys alone (tiny input: at most
    |groups| * salt rows).

    ``aggs`` maps output column -> (source_col, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the mergeable set; avg = sum/count
    composed by the caller). Sums that need cross-engine determinism
    should pass an already-decimal-cast column.
    """
    keys = list(keys)
    # Salt from the FULL ROW CONTENT, never from
    # monotonically_increasing_id: a nondeterministic grouping key is
    # the SPARK-23207 retry-correctness class (a recomputed map task
    # can re-salt rows differently and partials double-count).
    # Identical duplicate rows share a salt — acceptable: skew relief
    # only needs the hot key's DISTINCT rows spread out.
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    partial_exprs = []
    merge_exprs = []
    for out, (src, fn) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(src).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(src).alias(p))
            merge_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(src).alias(p))
            merge_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(src).alias(p))
            merge_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-mergeable agg fn: {fn}")
    return (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*merge_exprs)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed (large) side salted and the small side
    replicated ``salt``-fold: left rows get a deterministic salt from
    their full row hash; right rows are exploded to every salt value,
    so (key, salt) matches exactly the unsalted (key) join. Use when a
    single hot key overflows one reducer and AQE's split (which needs
    sorted-shuffle stats) is unavailable — e.g., under a custom
    partitioner or inside a pinned-plan pipeline."""
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"how={how!r} unsupported: the right side is replicated "
            "salt-fold, so right/full outer joins would emit each "
            "unmatched right row salt times"
        )
    on = list(on)
    # deterministic content-hash salt (see salted_agg note)
    lefts = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    rights = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lefts.join(rights, [*on, "__salt"], how).drop("__salt")


def _md5_hash32(parts: Sequence[Column]) -> Column:
    """Deterministic 32-bit integer hash from md5 hex — the engine-
    portable hash (Spark ``conv(substr(md5(..)))`` == DuckDB
    ``('0x' || substr(md5(..)))::BIGINT``), reshuffle-stable because it
    hashes row CONTENT, never partition state."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts)), 1, 8), 16, 10
    ).cast("bigint")


def shard_manifest(
    df: DataFrame,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-data shard assignment + manifest: every doc gets a
    deterministic content-hashed shard in [0, n_shards); the output is
    the per-shard manifest (doc count, char and subword-estimate
    totals) an export job writes alongside the shards.

    This is the final step of a curation pipeline — the writer becomes
    ``df.withColumn('shard', ...).write.partitionBy('shard')`` with the
    SAME shard expression, so manifest and files agree by construction.
    One map-side-combinable aggregation of ``n_shards`` groups; at
    100 TB the hash balances shards to within statistical noise
    regardless of how doc ids are clustered."""
    est = F.ceil(
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")) / 4
    ).cast("bigint")
    shard = F.pmod(_md5_hash32([F.col(id_col).cast("string")]), F.lit(n_shards))
    return (
        df.select(
            shard.cast("int").alias("shard"),
            F.length(text_col).cast("bigint").alias("__chars"),
            est.alias("__est"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__chars").cast("bigint").alias("n_chars"),
            F.sum("__est").cast("bigint").alias("n_subword_est"),
        )
    )


def mixture_rebalance(
    df: DataFrame,
    *,
    by: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Uniform source mixture: downsample every group of ``by`` to the
    size of the SMALLEST group, taking each group's docs in
    deterministic md5 order — the rebalancing step that stops one
    over-crawled source from dominating a training mix. Exact,
    engine-portable, reshuffle-stable.

    Plan: one per-group count aggregate (broadcast back — it is
    |groups| rows), one rank window per group. No full sort: the
    window orders within groups only, which is the same partitioned
    sort any per-source rollup pays."""
    from pyspark.sql import Window

    counts = df.groupBy(by).agg(F.count("*").alias("__n"))
    cap = counts.select(F.min("__n").alias("__cap"))
    order_key = _md5_hash32([F.col(by).cast("string"), F.col(id_col).cast("string")])
    w = Window.partitionBy(by).orderBy(order_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(cap))
        .filter(F.col("__rk") <= F.col("__cap"))
        .select(F.col(id_col), F.col(by), F.col("__rk").alias("mix_rank"))
    )


def temperature_mixture(
    df: DataFrame,
    *,
    by: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened source mixture (the alpha=0.5 data-mixing
    step LLM pretraining uses to up-weight small sources without the
    uniform mixture's brutal downsampling): each group of ``by`` is
    thinned to ``min(n_s, floor(sqrt(n_s * mean_n)))`` docs — the
    geometric interpolation between the source's own size and the
    uniform share — taken in deterministic md5 order.

    Engine-exact BY CONSTRUCTION: the only floating-point steps are one
    division (total/k), one multiply and one sqrt, all IEEE correctly-
    rounded functions of exact integer inputs, immediately floored back
    to an integer target — no order-dependent double summation anywhere
    (a p^alpha normalization would sum doubles across groups, whose
    result depends on addition order and can differ between engines).
    Plan: one per-group count + one 2-row global aggregate broadcast
    back, one rank window per group — same shape as
    ``mixture_rebalance``."""
    from pyspark.sql import Window

    counts = df.groupBy(by).agg(F.count("*").alias("__n"))
    mean = counts.agg(
        (F.sum("__n").cast("double") / F.count("*")).alias("__mean")
    )
    targets = counts.join(F.broadcast(mean)).select(
        F.col(by),
        F.least(
            F.col("__n"),
            F.floor(F.sqrt(F.col("__n") * F.col("__mean"))).cast("bigint"),
        ).alias("target_n"),
    )
    order_key = _md5_hash32([F.col(by).cast("string"), F.col(id_col).cast("string")])
    w = Window.partitionBy(by).orderBy(order_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .join(targets, by)
        .filter(F.col("__rk") <= F.col("target_n"))
        .select(
            F.col(id_col),
            F.col(by),
            F.col("__rk").cast("long").alias("mix_rank"),
            "target_n",
        )
    )


def pack_batches(
    df: DataFrame,
    *,
    budget: int,
    by: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential batch packing: within each ``by`` group, docs
    are laid out in deterministic md5 order and cut into batches of at
    most ``budget`` estimated subword tokens (a doc larger than the
    budget gets its own batch) — the standard fixed-token-budget
    sharding of a tokenize-and-pack export.

    ``batch_id = floor((running_sum - own_tokens) / budget)`` — i.e.
    the batch a doc STARTS in. This closed form is one running-sum
    window (integer-exact, engine-portable) instead of an iterative
    packer, at the cost of letting a doc that straddles a boundary
    count its overflow into the next batch — the approximation every
    distributed packer makes to stay single-pass."""
    from pyspark.sql import Window

    est = F.ceil(
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")) / 4
    ).cast("bigint")
    order_key = _md5_hash32([F.col(by).cast("string"), F.col(id_col).cast("string")])
    w = (
        Window.partitionBy(by)
        .orderBy(order_key.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_subword_est", est)
        .withColumn("__cum", F.sum("n_subword_est").over(w))
        .select(
            F.col(id_col),
            F.col(by),
            "n_subword_est",
            F.floor((F.col("__cum") - F.col("n_subword_est")) / F.lit(budget))
            .cast("bigint")
            .alias("batch_id"),
        )
    )


def token_budget_cap(
    df: DataFrame,
    *,
    budget: int,
    by: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-budget sampling (the data-mixture step that
    caps each source/language at N tokens): docs are taken in
    deterministic md5-shuffled order within each group, keeping every
    doc while the group's running subword estimate stays within
    ``budget``. Reshuffle-stable and engine-exact — the order key is
    md5 of (group, id), the running sum is integer — so membership is
    reproducible across runs, partitionings, and the DuckDB oracle.

    One window over the group partitioning; at scale each group's
    running sum is a single sorted partition stream (groups are the
    parallelism unit, like any per-source rollup)."""
    est = F.ceil(
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")) / 4
    ).cast("bigint")
    order_key = F.md5(
        F.concat_ws(":", F.col(by).cast("string"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(by)
        .orderBy(order_key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_subword_est", est)
        .withColumn("cum_tokens", F.sum("n_subword_est").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, by, "n_subword_est", "cum_tokens")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    *,
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the leakage-safe way
    to split a training corpus: membership is a pure function of the
    row KEY (md5 of salt:key), so re-runs, re-shuffles, incremental
    appends, and different cluster sizes all assign every document to
    the same split, and a document can never migrate between train and
    holdout as the corpus grows. The salt namespaces independent
    splits of the same corpus.

    Engine-portable by the same construction as deterministic_sample:
    the first 8 md5 hex chars compared as strings IS a uniform 32-bit
    draw. Zero shuffles — a narrow projection."""
    assert 0 < train and 0 <= val and train + val <= 1
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    t_hi = _hex_threshold(train)
    v_hi = _hex_threshold(train + val)
    split = (
        F.when(bucket < F.lit(t_hi), F.lit("train"))
        .when(bucket < F.lit(v_hi), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def key_skew_profile(
    df: DataFrame, key: str | Column, *, top_n: int = 20
) -> DataFrame:
    """Heavy-hitter / skew diagnostic for a join-or-agg key: the
    top-N keys by row count with each key's share of the table and
    the running cumulative share — the table you read BEFORE choosing
    a salting factor or an AQE skew threshold (a key with share >
    1/shuffle-partitions is a straggler candidate).

    One map-side-combinable count shuffle over the key, a 1-row total
    aggregated FROM the counts (no second scan of the input), and a
    parallel TakeOrdered for the top-N; the total joins back as a
    broadcast of a true 1-row constant. Shares are integer counts with
    one final rounded division — engine-exact."""
    from pyspark.sql import Window

    k = F.col(key) if isinstance(key, str) else key
    counts = df.select(k.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_n)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(
                F.sum("n").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                / F.col("__total"),
                6,
            ).alias("cum_share"),
            "rank",
        )
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "cum",
    n_ranges: int = 32,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Scalable EXACT running total over a global numeric order — the
    primitive behind transaction-boundary clamping and any "take in
    order until a budget" cut. A bare ``SUM() OVER (ORDER BY ...)``
    collapses the whole table into ONE window partition (Spark's
    global-window bottleneck); this is the classic two-phase form:

      1. bucket rows into ``n_ranges`` fixed-width ranges of
         ``order_col`` (bounds from one tiny min/max agg — a
         DETERMINISTIC partitioning, unlike repartitionByRange's
         sampled boundaries, so the two passes can never disagree);
      2. one map-side-combinable agg of per-bucket sums, collected
         (``n_ranges`` rows) and turned into exclusive driver-side
         offsets;
      3. the running sum within each bucket (window partitioned BY
         bucket) plus the bucket's offset.

    Two shuffles + an O(n_ranges) collect, no global sort. Skewed
    ``order_col`` ranges only unbalance bucket sizes, never
    correctness. Ties on ``order_col`` break by the column's own
    value order within the window — pass ``tie_cols`` to break them
    deterministically (ties always share a bucket, so only the window
    order needs them)."""
    from pyspark.sql import Window

    vt = dict(df.dtypes)[value_col]
    if vt not in ("int", "bigint", "smallint", "tinyint", "long"):
        raise ValueError(
            f"prefix_sum is integer-exact only; {value_col!r} is {vt} "
            "(the driver-side bucket offsets are integers — cast "
            "fractional values to a scaled integer first)"
        )
    ot = dict(df.dtypes)[order_col]
    if ot not in (
        "int", "bigint", "smallint", "tinyint", "long", "float", "double"
    ) and not ot.startswith("decimal"):
        # fail fast naming the column (r6 review): a string order
        # column would hit CAST_INVALID_INPUT mid-job under ANSI — or
        # silently produce an all-NULL running total without it
        raise ValueError(
            f"prefix_sum needs a numeric order column (range bucketing "
            f"casts it to double); {order_col!r} is {ot}"
        )
    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    width = max((hi - lo) / n_ranges, 1e-12)
    bucket = F.least(
        F.lit(n_ranges - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(order_col).cast("double") - F.lit(lo)) / F.lit(width)).cast(
                "int"
            ),
        ),
    )
    b = df.withColumn("__psb", bucket)
    partials = {
        r["__psb"]: r["s"]
        for r in b.groupBy("__psb").agg(F.sum(value_col).alias("s")).collect()
    }
    running, offsets = 0, {}
    for i in range(n_ranges):
        offsets[i] = running
        running += int(partials.get(i, 0) or 0)
    off = F.lit(0).cast("bigint")
    for i, v in offsets.items():
        if v:
            off = F.when(F.col("__psb") == i, F.lit(v)).otherwise(off)
    w = (
        Window.partitionBy("__psb")
        .orderBy(F.col(order_col).asc(), *[F.col(c).asc() for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.withColumn(
        out_col, (F.sum(value_col).over(w) + off).cast("bigint")
    ).drop("__psb")


def clamp_to_txn_boundary(
    feed: DataFrame,
    *,
    txn_col: str,
    max_rows: int,
    order_col: str | None = None,
) -> DataFrame:
    """P5 extension: cut a change batch at a TRANSACTION boundary —
    include whole transactions in commit order until the cumulative
    row count would pass ``max_rows``, never splitting one. SQL Server
    CT gets this for free (SYS_CHANGE_VERSION is per-commit,
    CTInputDStream.java:114-115 clamps on it); the binlog wire feeds
    (Maxwell ``xid``, Canal ``id``, DMS ``transaction-id``) interleave
    many rows per transaction, and replaying half a transaction breaks
    the atomicity every consumer assumes.

    The first transaction is always kept even if it alone exceeds
    ``max_rows`` (guaranteed progress — the same rule as the
    reference's min-one-version pull). Cost: one groupBy(txn), the
    two-phase ``prefix_sum`` over O(#txns) rows, and a semi-join back
    to the feed — never a global sort of the rows."""
    order_col = order_col or txn_col
    # persisted: prefix_sum issues two driver actions over this frame
    # and the semi-join scans it again — without the cache the full
    # feed's groupBy recomputes three times (r6 review). O(#txns) rows.
    per_txn = feed.groupBy(F.col(txn_col).alias("__txn")).agg(
        F.count(F.lit(1)).alias("__n"), F.min(order_col).alias("__ord")
    ).persist()
    try:
        cum = prefix_sum(per_txn, "__ord", "__n", out_col="__cum", tie_cols=["__txn"])
        kept = cum.filter(
            (F.col("__cum") <= max_rows) | (F.col("__cum") == F.col("__n"))
        ).select(F.col("__txn").alias(txn_col))
        out = feed.join(kept, on=txn_col, how="left_semi").persist()
        out.count()  # materialize before releasing the txn cache
        return out
    finally:
        per_txn.unpersist()


def zorder_expr(
    *specs: tuple[str, float, float], bits: int = 16
) -> Column:
    """Z-order (Morton) interleave key over 2+ numeric columns — the
    multi-dimensional zone-map layout (Delta OPTIMIZE ZORDER BY;
    Morton 1966): pass the result to ``TableCatalog.compact(
    sort_by=[zorder_expr(...)])`` and parquet row-group min/max stats
    become selective for range predicates on EVERY spec'd column at
    once, where a lexicographic sort only prunes its leading column.

    ``specs`` are ``(column, lo, hi)`` triples: each column is scaled
    to a ``bits``-bit integer over its caller-known [lo, hi) range
    (values outside clamp into the edge cells — same rule as
    ``profile.numeric_drift`` bins), then bit-interleaved
    least-significant-first. Pure bigint shift/mask codegen — ~
    ``bits * n_cols`` JVM ops, no shuffle, no UDF."""
    n = len(specs)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns; sort plain columns instead")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed bigint")
    qs = []
    for name, lo, hi in specs:
        scaled = (
            (F.col(name).cast("double") - F.lit(float(lo)))
            / F.lit((float(hi) - float(lo)) / (1 << bits))
        )
        # clamp in the DOUBLE domain BEFORE floor (numeric_drift rule,
        # r6 review): floor of a far-outlier quotient overflows BIGINT
        # under ANSI before a post-floor clamp runs
        clamped = F.least(
            F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1))
        )
        qs.append(F.floor(clamped).cast("bigint"))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, q in enumerate(qs):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return key


def context_windows(
    docs: DataFrame,
    *,
    size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_offset: int = 0,
) -> DataFrame:
    """GPT-style pretraining sequence packing: concatenate the corpus
    in deterministic ``id_col`` order and cut it into fixed-``size``
    token context windows, emitting the (window, doc-span) manifest a
    tokenize-and-pack export job materializes — every window is full
    (except the last), documents crossing a boundary are SPLIT with
    exact in-doc token offsets, nothing is padded or dropped (the
    standard causal-LM packing; Brown et al. 2020 describe the
    concat-then-chunk form publicly).

    Built on the two-phase exact ``prefix_sum`` (no global window
    bottleneck): each doc's exclusive start offset in the corpus token
    stream places it in windows ``start div size`` through
    ``(start + n_tokens - 1) div size``; the per-doc explode is
    bounded by ``n_tokens/size + 1`` spans. Output grain is
    (window_id, doc span): ``tok_start``/``tok_end`` are the 0-based
    half-open token range OF THE DOC that lands in that window, and
    ``pos_in_window`` is where it starts inside the window. Integer
    arithmetic end to end — bit-identical across engines and
    partitionings.

    ``base_offset`` makes the packing INCREMENTAL for append-only
    ingest: pass the previous run's total token count and the new
    batch's windows continue exactly where the packed corpus ended —
    no repacking of 100 TB because a day's worth of documents
    arrived. Only the NEW batch's spans are emitted: when
    ``base_offset`` lands mid-window, the new docs' first spans carry
    that window's id with ``pos_in_window`` pointing past the prior
    run's remainder, and the caller unions them with the previous
    output to complete the shared window (prior-run spans are never
    re-emitted)."""
    if size <= 0:
        raise ValueError(f"window size must be positive, got {size}")
    if base_offset < 0:
        raise ValueError(f"base_offset must be >= 0, got {base_offset}")
    # empty/whitespace-only docs carry ZERO tokens — split("") returns
    # [""] (size 1) in both engines and would inflate the token stream
    # by one per empty doc, shifting every downstream offset and
    # breaking the base_offset incremental contract (r6 review)
    n_tokens = (
        F.when(F.trim(F.col(text_col)) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("long")
    )
    t = docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
    c = prefix_sum(t, id_col, "n_tokens", out_col="__cum")
    c = c.select(
        F.col(id_col),
        "n_tokens",
        (F.col("__cum") - F.col("n_tokens") + F.lit(base_offset)).alias("__start"),
    )
    first_w = F.expr(f"__start div {size}")
    last_w = F.expr(f"(__start + n_tokens - 1) div {size}")
    # zero-token docs occupy no window span (and sequence(first, last)
    # with last < first would emit a DESCENDING bogus span)
    c = c.filter(F.col("n_tokens") > 0)
    spans = c.select(
        F.col(id_col),
        "n_tokens",
        "__start",
        F.explode(F.sequence(first_w, last_w)).alias("window_id"),
    )
    tok_start = F.greatest(F.col("window_id") * size - F.col("__start"), F.lit(0))
    tok_end = F.least(
        (F.col("window_id") + 1) * size - F.col("__start"), F.col("n_tokens")
    )
    return spans.select(
        F.col("window_id").cast("long"),
        F.col(id_col),
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        F.greatest(
            F.col("__start") - F.col("window_id") * size, F.lit(0)
        ).cast("long").alias("pos_in_window"),
    )


def kth_order_statistic(
    df: DataFrame,
    value_col: str,
    k: int,
    *,
    n_ranges: int = 1024,
    collect_limit: int = 10_000,
) -> float | int | None:
    """EXACT k-th smallest value (0-indexed) by iterative histogram
    refinement — the distributed-selection primitive behind
    ``exact_quantiles``.

    Spark's exact ``percentile`` aggregate materializes a per-group
    value->count map in one executor's memory (OOM territory for a
    high-cardinality column at 100 TB); a global ``orderBy`` shuffles
    the whole table. This is the classic selection-by-counting
    alternative: each round computes one min/max/count aggregate and
    one ``n_ranges``-bucket count histogram (both map-side combinable,
    O(n_ranges) driver data, NO row shuffle), narrows to the one
    bucket containing index ``k``, and recurses. The candidate range
    shrinks ~n_ranges x per round, so doubles converge in <=6 rounds;
    value plateaus short-circuit on lo == hi, and once the candidate
    set fits ``collect_limit`` the exact element comes from a bounded
    ``orderBy().limit()`` TakeOrdered (never a full sort).

    Each round re-scans the (filtered) input — callers selecting many
    quantiles should ``.persist()`` the frame (``exact_quantiles``
    does). Returns None on an empty frame; raises on k out of range.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    # nulls stripped UP FRONT: count("__v") already excludes them, but
    # the small-frame orderBy path sorts NULLS FIRST and would return
    # a null (or shift every k by the null count) — r6 review.
    sub = df.select(F.col(value_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    for _ in range(64):  # floats collapse in ~6 rounds; hard stop
        lo, hi, cnt = sub.agg(
            F.min("__v"), F.max("__v"), F.count("__v")
        ).first()
        if cnt == 0 or lo is None:
            if k > 0:
                raise ValueError(f"k={k} out of range (no non-null values)")
            return None
        if k >= cnt:
            raise ValueError(f"k={k} out of range for {cnt} values")
        if lo == hi:
            return lo
        if cnt <= collect_limit:
            return sub.orderBy("__v").limit(k + 1).tail(1)[0]["__v"]
        width = max((float(hi) - float(lo)) / n_ranges, 1e-300)
        bucket = F.least(
            F.lit(n_ranges - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("__v").cast("double") - F.lit(float(lo))) / F.lit(width)
                ).cast("int"),
            ),
        )
        counts = dict(
            sub.groupBy(bucket.alias("__b")).count().collect()
        )
        running = 0
        for b in range(n_ranges):
            c = counts.get(b, 0)
            if k < running + c:
                sub = sub.filter(bucket == b)
                k -= running
                break
            running += c
        else:  # pragma: no cover - counts always sum to cnt
            raise AssertionError("histogram counts lost rows")
    raise AssertionError("selection did not converge")  # pragma: no cover


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    *,
    n_ranges: int = 1024,
    collect_limit: int = 10_000,
) -> DataFrame:
    """EXACT quantiles of ``value_col`` at any table size: each
    quantile q maps to the order statistic k = floor(q * (n-1))
    (0-indexed; the lower-element convention, so the result is always
    an ACTUAL element of the column — engine-portable, no
    interpolation arithmetic to disagree over) and is selected by
    ``kth_order_statistic``'s histogram refinement. Returns a
    (q, value) frame.

    The scale story versus the two built-ins: ``percentile`` (exact)
    concentrates a value->count map in one executor; a global sort
    shuffles everything. This touches only count histograms — the
    data rows never move.

    r11: delegates to ``exact_quantiles_by_group`` under a constant
    group so ALL quantiles refine SIMULTANEOUSLY — one histogram
    aggregate per round covers every quantile, and the bounded
    finishes batch into one action, where the old per-quantile
    ``kth_order_statistic`` loop paid ~3 independent jobs per
    quantile (pure scheduler fixed cost at any scale; the per-round
    scan work is unchanged). Same elements, same (q, value) frame."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    spark = df.sparkSession
    vtype = dict(df.dtypes)[value_col]
    tagged = df.select(F.lit(0).alias("__qg"), F.col(value_col))
    out_rows = exact_quantiles_by_group(
        tagged, ["__qg"], value_col, qs,
        n_ranges=n_ranges, collect_limit=collect_limit,
    ).collect()
    pairs = [(float(r["q"]), r["value"]) for r in out_rows] or [
        (float(q), None) for q in qs
    ]
    return spark.createDataFrame(pairs, f"q double, value {vtype}")


def _batched_kth(cands: DataFrame, idx: dict[int, int]) -> dict:
    """k-th smallest ``__v`` per ``__sid`` in ONE Spark action: each
    selector's candidate list (bounded by collect_limit at every call
    site) is sorted engine-side and the per-selector 0-based target
    index — a map literal — extracts the element, so only one value
    per selector crosses to the driver. Ties cannot change the result:
    the k-th order statistic of a multiset is a value, not a row."""
    m = F.create_map(
        *[x for s, k in idx.items() for x in (F.lit(s), F.lit(k))]
    )
    got = (
        cands.groupBy("__sid")
        .agg(
            F.element_at(
                F.sort_array(F.collect_list("__v")),
                (m[F.col("__sid")] + 1).cast("int"),
            ).alias("__kth")
        )
        .collect()
    )
    return {r["__sid"]: r["__kth"] for r in got}


def _selector_join(rows: DataFrame, sel_df: DataFrame, gcols: Sequence[str]) -> DataFrame:
    """Fan the data rows onto their group's live selectors. The
    selector table is driver-bounded metadata (O(#groups x #quantiles)
    rows) — broadcast it so the data rows NEVER shuffle; a sort-merge
    join here would move the whole input once per refinement round.
    Plan guard: tests/test_plans.py asserts BroadcastHashJoin."""
    return rows.join(
        F.broadcast(sel_df),
        [F.col(g) == F.col(f"__g{i}") for i, g in enumerate(gcols)],
    )


def exact_quantiles_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    *,
    n_ranges: int = 256,
    collect_limit: int = 10_000,
    max_rounds: int = 64,
    max_selectors: int = 10_000,
) -> DataFrame:
    """Per-group EXACT quantiles with every group refined
    SIMULTANEOUSLY — the grouped form of ``exact_quantiles``.

    Each (group, q) pair is a SELECTOR carrying driver-side state
    (current candidate range [lo, lo + n_ranges*width), remaining
    index k). One round = one equi-join of the rows onto the
    selector table by group key (a row fans out only to its own
    group's unresolved selectors — at most len(qs) copies) + ONE
    (selector, bucket) count aggregate for ALL groups together; the
    driver then narrows every selector's range at once. Selectors
    resolve on value plateaus (lo == hi) or via a bounded per-selector
    TakeOrdered once their candidate count fits ``collect_limit``.

    Scale contract: driver state and the selector table are
    O(#groups * len(qs)) — groups must be metadata-sized (sources,
    languages, shards...; same discipline as the profile/maintenance
    ops), and the op FAILS FAST with a ValueError once
    #groups * len(qs) exceeds ``max_selectors`` (default 10k) rather
    than melting the driver on a high-cardinality key. For unbounded
    group domains use a percent_rank window instead (one shuffle,
    `corpus_percentile_filter` shape). Rounds are
    O(log_{n_ranges} spread) — doubles resolve in <= ~6. The input is
    persisted across rounds and unpersisted at the end.
    """
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    gcols = list(group_cols)
    rows = df.select(
        *[F.col(g) for g in gcols], F.col(value_col).alias("__v")
    ).filter(F.col("__v").isNotNull()).persist()
    try:
        spark = df.sparkSession
        # Bounded base stats WITH the cardinality guard fused in (r11):
        # the guard used to be a separate distinct().limit().count()
        # probe — one whole extra pass over the rows. The limit bounds
        # driver materialization the same way (at most cap+1 group rows
        # cross, never the full key set), and overflow still fails fast
        # before any selector state exists.
        cap_groups = max(max_selectors // max(len(qs), 1), 1)
        base_rows = (
            rows.groupBy(*gcols)
            .agg(
                F.min("__v").alias("__lo"),
                F.max("__v").alias("__hi"),
                F.count("__v").alias("__n"),
            )
            .limit(cap_groups + 1)
            .collect()
        )
        if len(base_rows) > cap_groups:
            raise ValueError(
                f"exact_quantiles_by_group selector state would exceed "
                f"max_selectors={max_selectors} (> {cap_groups} groups x "
                f"{len(qs)} quantiles) — this op is for metadata-sized "
                f"group domains; use a percent_rank window for "
                f"high-cardinality keys (or raise max_selectors "
                f"deliberately)"
            )
        base = {
            tuple(r[g] for g in gcols): (r["__lo"], r["__hi"], r["__n"])
            for r in base_rows
        }
        # selector state: sid -> [group_key, q, k, lo, hi, resolved_value]
        sels: dict[int, list] = {}
        sid = 0
        small: dict[int, int] = {}  # sid -> group count n (direct finish)
        for gkey, (lo, hi, n) in base.items():
            for q in qs:
                k = int(math.floor(q * (n - 1)))
                sels[sid] = [gkey, q, k, lo, hi, lo if lo == hi else None]
                if sels[sid][5] is None and n <= collect_limit:
                    small[sid] = n
                sid += 1

        def unresolved():
            return {s: st for s, st in sels.items() if st[5] is None}

        sel_schema = ", ".join(
            [f"`__g{i}` {dict(df.dtypes)[g]}" for i, g in enumerate(gcols)]
            + ["__sid int", "__lo double", "__w double"]
        )
        if small:
            # Direct finish (r11): a selector whose WHOLE group fits
            # collect_limit needs no histogram refinement — its
            # candidate set is the group itself. Resolve all such
            # selectors in one batched action, so the common
            # metadata-sized-groups call is 2 actions total (base
            # stats + this) instead of probe + base + a count round +
            # one TakeOrdered per selector.
            sel_rows = []
            for s in small:
                gkey, _q, _k, lo, hi, _ = sels[s]
                w = max((float(hi) - float(lo)) / n_ranges, 1e-300)
                sel_rows.append((*gkey, s, float(lo), w))
            sel_df = spark.createDataFrame(sel_rows, sel_schema)
            joined = _selector_join(rows, sel_df, gcols)
            vals = _batched_kth(joined, {s: sels[s][2] for s in small})
            for s in small:
                sels[s][5] = vals[s]
        for _ in range(max_rounds):
            live = unresolved()
            if not live:
                break
            sel_rows = []
            for s, (gkey, _q, _k, lo, hi, _) in live.items():
                w = max((float(hi) - float(lo)) / n_ranges, 1e-300)
                sel_rows.append((*gkey, s, float(lo), w))
            sel_df = spark.createDataFrame(sel_rows, sel_schema)
            joined = _selector_join(rows, sel_df, gcols)
            # clamp the VALUE into the selector's range before the
            # divide: rows far above a narrowed range would otherwise
            # produce huge (ANSI int-overflowing, even inf) ordinals —
            # they belong in the last bucket regardless
            v_clamped = F.least(
                F.col("__v").cast("double"),
                F.col("__lo") + F.lit(float(n_ranges)) * F.col("__w"),
            )
            bucket = F.least(
                F.lit(n_ranges - 1).cast("bigint"),
                F.greatest(
                    F.lit(0).cast("bigint"),
                    F.floor((v_clamped - F.col("__lo")) / F.col("__w")),
                ),
            ).cast("int")
            # a selector's range only ever NARROWS, so rows outside it
            # were already excluded from k in an earlier round
            in_range = F.col("__v").cast("double") >= F.col("__lo")
            counts: dict[tuple[int, int], int] = {
                (r["__sid"], r["__b"]): r["count"]
                for r in joined.filter(in_range)
                .groupBy(F.col("__sid"), bucket.alias("__b"))
                .count()
                .collect()
            }
            finishers: dict[int, int] = {}  # sid -> winning bucket
            for s, st in live.items():
                gkey, q, k, lo, hi, _ = st
                w = max((float(hi) - float(lo)) / n_ranges, 1e-300)
                running = 0
                for b in range(n_ranges):
                    c = counts.get((s, b), 0)
                    if k < running + c:
                        st[2] = k - running
                        st[3] = float(lo) + b * w
                        st[4] = min(float(hi), float(lo) + (b + 1) * w)
                        if c <= collect_limit:
                            finishers[s] = b
                        elif st[3] == st[4] or w <= 1e-299:
                            st[5] = st[3]
                        break
                    running += c
                else:  # pragma: no cover
                    raise AssertionError("selector counts lost rows")
            if finishers:
                # bounded finish, BATCHED (r11): every selector whose
                # winning bucket fits collect_limit resolves in ONE
                # Spark action. The old form ran one TakeOrdered JOB
                # per selector, so a round resolving G groups x Q
                # quantiles paid G*Q scheduler round trips of pure
                # fixed cost.
                fin_cond = None
                for s, b in finishers.items():
                    c0 = (F.col("__sid") == s) & (bucket == b)
                    fin_cond = c0 if fin_cond is None else (fin_cond | c0)
                vals = _batched_kth(
                    joined.filter(in_range & fin_cond),
                    {s: sels[s][2] for s in finishers},
                )
                for s in finishers:
                    # KeyError here would mean the counts and the
                    # candidate fetch disagreed — loud, never silent
                    sels[s][5] = vals[s]
        still = unresolved()
        if still:  # pragma: no cover
            raise AssertionError(f"{len(still)} selectors did not converge")
        out_rows = [(*st[0], st[1], st[5]) for st in sels.values()]
        vtype = dict(df.dtypes)[value_col]
        out_schema = ", ".join(
            [f"`{g}` {dict(df.dtypes)[g]}" for g in gcols]
            + ["q double", f"value {vtype}"]
        )
        return spark.createDataFrame(out_rows, out_schema)
    finally:
        rows.unpersist()


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = 3,
    n_ranges: int = 256,
    collect_limit: int = 10_000,
) -> DataFrame:
    """Per-group ROBUST outlier summary by exact median + MAD (median
    absolute deviation): returns (group..., median, mad, n,
    n_outliers) where n_outliers counts rows with
    |value - median| > k * MAD. Mean/stddev z-scores move with the
    outliers they hunt; the median/MAD pair is the standard robust
    alternative (corpus hygiene: flagging length-freak documents per
    language before training).

    Both medians come from ``exact_quantiles_by_group`` — all groups
    refined simultaneously, counts-only driver traffic, data rows
    never shuffled (the two medians-frame joins broadcast the
    metadata-sized side). With an integer ``value_col`` and integer
    ``k`` every derived quantity (deviation, k*MAD, the comparison)
    stays in exact integer arithmetic, so the DuckDB oracle hashes
    bit-exact; doubles are IEEE-identical too (subtract/multiply/
    compare only — no accumulation order)."""
    gcols = list(group_cols)
    med = exact_quantiles_by_group(
        df, gcols, value_col, [0.5],
        n_ranges=n_ranges, collect_limit=collect_limit,
    ).select(*gcols, F.col("value").alias("__med"))
    dev = (
        df.join(F.broadcast(med), on=gcols)
        .select(
            *gcols,
            F.col(value_col).alias("__x"),
            F.col("__med"),
            F.abs(F.col(value_col) - F.col("__med")).alias("__dev"),
        )
        .filter(F.col("__x").isNotNull())
    )
    mad = exact_quantiles_by_group(
        dev, gcols, "__dev", [0.5],
        n_ranges=n_ranges, collect_limit=collect_limit,
    ).select(*gcols, F.col("value").alias("__mad"))
    return (
        dev.join(F.broadcast(mad), on=gcols)
        .groupBy(*gcols)
        .agg(
            F.max("__med").alias("median"),
            F.max("__mad").alias("mad"),
            F.count("__x").alias("n"),
            F.count_if(F.col("__dev") > F.lit(k) * F.col("__mad")).alias(
                "n_outliers"
            ),
        )
    )
