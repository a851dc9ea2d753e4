"""Incrementally-maintained derived tables (materialized aggregates)
over CDC-applied base tables.

The reference stops at upserting rows into a keyed store; a warehouse
consuming a change feed almost always maintains aggregates over it.
This module adds that as a first-class engine feature: a GROUP BY
materialization refreshed per batch by recomputing ONLY the groups a
batch touched — O(changed groups), not O(table) — with the same
versioned-publish/idempotence contract as the row store.

Incremental rule (set-oriented, exact):
  changed_pks = distinct PKs in the catalog change feed between the
                two versions (inserts, deletes, updates)
  affected    = group keys of the OLD version's rows at changed PKs
                UNION group keys of the change-feed rows — covering
                both the pre-image group (a group-moving update or a
                delete must drop its old contribution) and the
                post-image group
  fresh       = full aggregation of the post-apply base restricted to
                the affected groups (one semi-join scan; group-pruned)
  next        = previous materialization ANTI JOIN affected UNION fresh

Scale: the anti-join keys are the affected group set (small); the
fresh aggregation semi-joins the base on its group key before
aggregating, so a 100 TB base is touched only on the changed groups'
partitions. Correctness is engine-checked in tests by comparing
against a full recomputation after every batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .apply import TableCatalog, apply_changelog
from .schema import OP_DELETE


def maintain_aggregate(
    spark: SparkSession,
    catalog: TableCatalog,
    base_table: str,
    group_keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    prev: DataFrame | None = None,
    from_version: int | None = None,
) -> DataFrame:
    """Return the maintained aggregate of ``base_table``.

    - ``prev is None``: full initial materialization (one aggregation
      of the base).
    - otherwise: incremental refresh — group keys touched between
      ``from_version`` and the current version (via the catalog's
      change feed) are dropped from ``prev`` and recomputed from the
      current base; untouched groups pass through untouched.

    ``aggs`` maps output column name -> aggregate Column (caller
    routes double sums through DECIMAL per the determinism rules).
    """
    keys = list(group_keys)
    base = catalog.read(spark, base_table)
    agg_exprs = [expr.alias(name) for name, expr in aggs.items()]
    if prev is None:
        return base.groupBy(*keys).agg(*agg_exprs)
    assert from_version is not None, "incremental refresh needs from_version"

    meta = catalog.meta(base_table)
    pks = list(meta["pks"])
    changes = catalog.table_changes(spark, base_table, from_version)
    changed_pks = changes.select(*pks).distinct()
    # pre-image groups: the OLD version's rows at changed PKs (a
    # group-moving update or delete must drop its old contribution);
    # post-image groups: the change-feed rows themselves
    old = catalog.read(spark, base_table, version=from_version)
    affected = (
        old.join(changed_pks, pks, "left_semi")
        .select(*keys)
        .unionByName(changes.select(*keys))
        .distinct()
    )

    # NULL-SAFE key matching (r6 review): groupBy produces a NULL
    # group, but a plain semi/anti join on the keys is null-unsafe —
    # the NULL group would never be recomputed (fresh misses it) AND
    # never dropped from prev (anti keeps it), leaving its aggregate
    # permanently stale after any change to null-keyed rows.
    def _nullsafe(left, right):
        cond = None
        for c in keys:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        return cond

    aff1 = affected.alias("__a1")
    fresh = (
        base.join(aff1, _nullsafe(base, aff1), "left_semi")
        .groupBy(*keys)
        .agg(*agg_exprs)
    )
    aff2 = affected.alias("__a2")
    kept = prev.join(aff2, _nullsafe(prev, aff2), "left_anti")
    return kept.unionByName(fresh)


def maintain_join(
    spark: SparkSession,
    catalog: TableCatalog,
    fact_table: str,
    dim_table: str,
    fk_col: str,
    *,
    prev: DataFrame | None = None,
    fact_from: int | None = None,
    dim_from: int | None = None,
    dim_prefix: str = "dim_",
) -> DataFrame:
    """Return the maintained DENORMALIZED JOIN materialization
    ``fact INNER JOIN dim ON fact.fk_col = dim.pk`` — the second
    derived-table shape every warehouse keeps over a change feed
    (pre-joined wide rows for serving), refreshed per batch in
    O(changed), not O(table).

    - ``prev is None``: full initial materialization (one join).
    - otherwise: incremental refresh from the two bases' change feeds:

      rewrite_keys (fact PKs whose M rows can be stale) =
          PKs in the FACT change feed between fact_from and current
          (covers insert/update/delete, including an update that moved
          the row to another dim: M is keyed by fact PK, so dropping by
          PK erases the pre-image row wherever it pointed)
        UNION
          PKs of CURRENT fact rows whose ``fk_col`` is in the DIM
          change feed between dim_from and current (an unchanged fact
          row under a changed/deleted dim row is stale in place)

      next = prev ANTI JOIN rewrite_keys
             UNION (current fact SEMI JOIN rewrite_keys) JOIN current dim

    Scale: rewrite_keys is O(|fact changes| + |fact rows of changed dim
    keys|); the fresh join semi-joins the fact base down to those keys
    before joining the dim, so a 100 TB fact table is touched only on
    the changed keys' bucket partitions (the catalog read prunes by PK
    bucket), and the dim side of the fresh join is AQE-broadcastable.
    Dim non-PK columns are prefixed with ``dim_prefix`` to keep the
    wide schema collision-free. Exactness is engine-checked in tests by
    comparing against a full recompute after every batch."""
    fact = catalog.read(spark, fact_table)
    dim = catalog.read(spark, dim_table)
    dim_meta = catalog.meta(dim_table)
    (dk,) = list(dim_meta["pks"])  # single-column dim PK by contract
    dim_wide = dim.select(
        F.col(dk),
        *[
            F.col(c).alias(f"{dim_prefix}{c}")
            for c in dim.columns
            if c != dk
        ],
    )

    def joined(f: DataFrame) -> DataFrame:
        return f.join(dim_wide, f[fk_col] == dim_wide[dk]).drop(dk)

    if prev is None:
        return joined(fact)
    assert fact_from is not None and dim_from is not None

    fact_meta = catalog.meta(fact_table)
    fpks = list(fact_meta["pks"])
    fact_changed = (
        catalog.table_changes(spark, fact_table, fact_from).select(*fpks).distinct()
    )
    dim_changed = (
        catalog.table_changes(spark, dim_table, dim_from)
        .select(F.col(dk).alias("__dk"))
        .distinct()
    )
    stale_via_dim = fact.join(
        dim_changed, fact[fk_col] == dim_changed["__dk"], "left_semi"
    ).select(*fpks)
    rewrite_keys = fact_changed.unionByName(stale_via_dim).distinct()

    kept = prev.join(rewrite_keys, fpks, "left_anti")
    fresh = joined(fact.join(rewrite_keys, fpks, "left_semi"))
    return kept.unionByName(fresh)


def scd2_history(
    flat: DataFrame,
    pks: Sequence[str],
    *,
    op_col: str = "CDC_OP_TYPE",
    version_col: str = "CHANGE_TRACKING_VERSION",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a flattened DML
    changelog: one row per (PK, version interval) with
    ``valid_from``/``valid_to`` change versions and an ``is_current``
    flag.

    The reference applies changes destructively (last write wins,
    ``sink/CDCBigTable.java`` upserts); warehouses consuming a change
    feed routinely keep the full history instead. Interval rule, per PK
    in change-version order: every INSERT/UPDATE row opens an interval
    at its version; the NEXT change of the same PK (including a DELETE)
    closes it (``valid_to`` = that version, exclusive). DELETE rows
    close the previous interval and emit nothing. ``is_current`` =
    interval still open.

    Change versions must be unique per PK — guaranteed by the CT source
    (monotone SYS_CHANGE_VERSION per row, ``CTInputDStream.java:149-162``).

    Plan: ONE window shuffle on the PK (lead over version) — no joins,
    no iteration; at 100 TB this is the same single hash-partition any
    per-key rollup pays."""
    keys = list(pks)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).asc())
    data_cols = [c for c in flat.columns if c not in (op_col, version_col)]
    return (
        flat.withColumn("valid_to", F.lead(version_col).over(w))
        .filter(F.col(op_col) != OP_DELETE)
        .select(
            *data_cols,
            F.col(version_col).alias("valid_from"),
            F.col("valid_to"),
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def maintain_value_index(
    spark: SparkSession,
    catalog: TableCatalog,
    base_table: str,
    value_cols: Sequence[str],
    index_table: str,
    *,
    from_version: int | None = None,
) -> DataFrame:
    """GLOBAL SECONDARY INDEX over a non-PK column set, maintained as
    a derived catalog table — the HBase/Phoenix global-index /
    DynamoDB-GSI capability the reference's keyed sinks leave to the
    store (``sink/CDCHBase.java`` serves gets by ROWKEY only; any
    other predicate is a full scan).

    Index relation: ONE row per distinct live combination of
    ``value_cols`` whose values are all non-NULL (NULLs are unindexed,
    the standard secondary-index convention), with payload
    ``postings`` = the sorted array of base-PK structs carrying that
    value. The index's own PRIMARY KEY is the value columns, so it
    buckets, prunes, versions, vacuums, and replays idempotently like
    any other managed table — and ``apply.lookup_keys`` works on it
    unchanged, which is what makes ``lookup_by_index`` two pruned
    point reads instead of a scan.

    Maintenance is O(changed rows): the base's change feed between
    ``from_version`` (base CATALOG version; self-derived from the
    index's own applied-version stamp when omitted, so a scheduled
    refresh needs no external state) and current picks the affected
    values — the OLD version's values at changed PKs (a value-moving
    update or a delete must drop its old posting) union the change
    rows' NEW values — then fresh postings recompute from the base
    for those values only (one semi-join, value-pruned) and values
    with no remaining rows DELETE. Change versions stamp
    ``2*base_version`` (deletes) / ``2*base_version + 1`` (upserts):
    monotone across refreshes, replay-idempotent within one.

    Selectivity contract (100 TB): postings arrays are per-VALUE, so
    index selective columns (emails, URLs, names — the point-lookup
    use case); a low-cardinality column (language, status) would pack
    a corpus-sized posting into single rows — use a semi-join scan
    for those instead. Returns the refreshed index frame."""
    meta = catalog.meta(base_table)
    if meta is None or meta["schema"] is None:
        raise KeyError(f"unknown table {base_table!r}")
    pks = list(meta["pks"])
    vcols = list(value_cols)
    overlap = set(vcols) & set(pks)
    if overlap:
        raise ValueError(f"value_cols overlap base PK: {sorted(overlap)}")
    from .changelog import dml_records, snapshot_changelog

    base = catalog.read(spark, base_table)
    cv = int(catalog.versions(base_table)[-1])
    not_null = None
    for c in vcols:
        nn = F.col(c).isNotNull()
        not_null = nn if not_null is None else (not_null & nn)

    # collect_set infers NON-nullable struct fields, but parquet reads
    # them back nullable and Spark refuses the nullable->non-null cast
    # on re-read; register the postings type in its nullable DDL form.
    base_types = dict(base.dtypes)
    postings_type = "array<struct<{}>>".format(
        ", ".join(f"{p}: {base_types[p]}" for p in pks)
    )

    def postings_of(df: DataFrame) -> DataFrame:
        return (
            df.filter(not_null)
            .groupBy(*vcols)
            .agg(
                F.sort_array(F.collect_set(F.struct(*[F.col(p) for p in pks])))
                .cast(postings_type)
                .alias("postings")
            )
        )

    idx_meta = catalog.meta(index_table)
    if idx_meta is None or idx_meta["schema"] is None:
        log = snapshot_changelog(
            postings_of(base), index_table, vcols, insert_version=2 * cv + 1
        )
        apply_changelog(spark, log, catalog)
        return catalog.read(spark, index_table)

    if from_version is None:
        # the index's applied_version is 2*base_version (delete-only
        # refresh) or 2*base_version + 1 (any upserts) by construction,
        # and BOTH floor-divide back to the base version it last
        # indexed — no side-channel refresh state
        from_version = int(idx_meta.get("applied_version", 1)) // 2

    # The affected-value set mixes values read under DIFFERENT schemas
    # (the diff-basis version, the change feed, the index itself): a
    # re-type of the indexed column between the basis and current made
    # the naive typed union/joins coerce — and ANSI-crash on an
    # old-typed value like 'abc' that the re-type era deleted (r8 seam
    # review). The set is therefore computed in the CANONICAL STRING
    # domain — each value normalized through the INDEX's registered
    # column type when it fits (so a non-canonical source form like
    # '0100' maps to the '100' identity the index actually stores) and
    # kept raw otherwise (a raw form can never name a typed index key,
    # so its recompute/delete legs are no-ops, never crashes). The
    # base-side joins compare on cast-to-string expressions, so no
    # implicit cross-type coercion ever reaches the data.
    from .schema import schema_from_json

    idx_types = {
        f.name: f.dataType
        for f in schema_from_json(idx_meta["schema"]).fields
        if f.name in set(vcols)
    }

    def canon(df: DataFrame) -> DataFrame:
        cols = []
        for c in vcols:
            raw = F.col(c).cast("string")
            t = idx_types.get(c)
            e = (
                F.coalesce(F.col(c).cast("string").try_cast(t).cast("string"), raw)
                if t is not None
                else raw
            )
            cols.append(e.alias(c))
        return df.select(*cols)

    if int(from_version) not in catalog.versions(base_table):
        # Diff basis vacuumed away (manual vacuum; auto_maintain's
        # protect_from floor prevents this path): full resync — every
        # value currently in the index or the base is "affected", so
        # stale postings recompute and departed values delete. Still
        # one pass over metadata-grain value sets, no change feed.
        affected = (
            canon(base.filter(not_null))
            .unionByName(canon(catalog.read(spark, index_table)))
            .distinct()
        )
    else:
        changes = catalog.table_changes(spark, base_table, int(from_version))
        old = catalog.read(spark, base_table, version=int(from_version))
        changed_pks = changes.select(*pks).distinct()
        affected = (
            canon(old.join(changed_pks, pks, "left_semi").filter(not_null))
            .unionByName(canon(changes.filter(not_null)))
            .distinct()
        )
    aff = affected.select(*[F.col(c).alias(f"__a_{c}") for c in vcols])
    on = None
    for c in vcols:
        eq = F.col(c).cast("string") == F.col(f"__a_{c}")
        on = eq if on is None else (on & eq)
    fresh = postings_of(base.join(aff, on, "left_semi"))
    gone = affected.join(canon(fresh), vcols, "left_anti")
    # A raw form that cannot cast to the index's typed key (possible
    # only via a caller from_version below a re-type boundary) names
    # NO index entry — deleting it is a no-op, and letting it into the
    # DELETE envelope would ANSI-crash the typed decode instead.
    for c in vcols:
        t = idx_types.get(c)
        if t is not None and t.simpleString() != "string":
            gone = gone.filter(
                F.col(c).isNull() | F.col(c).try_cast(t).isNotNull()
            )
    log = dml_records(
        gone, index_table, vcols, op=OP_DELETE, version=2 * cv, keys_only=True
    ).unionByName(
        dml_records(fresh, index_table, vcols, version=2 * cv + 1)
    )
    apply_changelog(spark, log, catalog)
    return catalog.read(spark, index_table)


def lookup_by_index(
    spark: SparkSession,
    catalog: TableCatalog,
    base_table: str,
    index_table: str,
    values: DataFrame,
) -> DataFrame:
    """Non-PK point lookup through a ``maintain_value_index`` index:
    fetch the current base rows whose indexed columns match ``values``
    (a small frame carrying exactly the index's value columns) WITHOUT
    scanning either table.

    Two pruned point reads: ``lookup_keys`` on the index (bucketed by
    VALUE) yields the matching postings; the PK structs explode back
    into a key frame; ``lookup_keys`` on the base (bucketed by PK)
    fetches the rows. Cost is O(touched buckets) on both tables at any
    base size — the secondary-index serving contract, kept under
    Spark's scan model."""
    from .apply import lookup_keys

    postings = lookup_keys(spark, catalog, index_table, values)
    pk_rows = (
        postings.select(F.explode("postings").alias("__p"))
        .select("__p.*")
        .distinct()
    )
    return lookup_keys(spark, catalog, base_table, pk_rows)


def maintain_token_stats(
    spark: SparkSession,
    catalog: TableCatalog,
    docs_table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prev: DataFrame | None = None,
    from_version: int | None = None,
) -> DataFrame:
    """Incrementally-maintained corpus token statistics — per token,
    document frequency ``df`` and collection frequency ``cf``: the
    statistics table behind BM25 / tf-idf / OOV-rate / rarity scoring
    (``extensions/text.py``), kept fresh as the corpus changes through
    the CDC apply path WITHOUT re-tokenizing the corpus.

    Unlike ``maintain_aggregate`` (whose grain is the base row), the
    aggregation grain here is an EXPLODED derivation (doc x token), so
    value-pruned recomputation would still re-explode the whole corpus
    for common tokens. Both statistics are ADDITIVE, so the refresh is
    pure delta arithmetic instead: per changed doc, the old image's
    per-token counts subtract and the new image's add —
    ``cf += n_new - n_old``, ``df += [n_new>0] - [n_old>0]`` — then
    one full-outer merge against ``prev`` and tokens reaching df <= 0
    drop. Exact BIGINT arithmetic end-to-end; O(changed docs) tokens
    ever explode.

    ``prev is None``: full initial build (one corpus tokenization).
    Otherwise incremental from ``from_version`` (base CATALOG version
    of the previous refresh). Tokens are whitespace tokens of
    ``lower(trim(text))``, empty dropped — the same rule as the text
    operators, so the maintained table plugs into their formulas."""
    from .extensions.text import tokens as _tokens

    def per_token(df: DataFrame) -> DataFrame:
        return (
            _tokens(df, id_col=id_col, text_col=text_col)
            .filter(F.col("token") != "")
            .groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    if prev is None:
        return (
            per_token(catalog.read(spark, docs_table))
            .groupBy("token")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("df"),
                F.sum("n").cast("bigint").alias("cf"),
            )
        )
    assert from_version is not None, "incremental refresh needs from_version"
    meta = catalog.meta(docs_table)
    pks = list(meta["pks"])
    changes = catalog.table_changes(spark, docs_table, int(from_version))
    changed_pks = changes.select(*pks).distinct()
    old_slice = catalog.read(spark, docs_table, version=int(from_version)).join(
        changed_pks, pks, "left_semi"
    )
    new_slice = catalog.read(spark, docs_table).join(changed_pks, pks, "left_semi")
    deltas = (
        per_token(old_slice)
        .select("token", F.lit(-1).alias("s"), F.col("n"))
        .unionByName(per_token(new_slice).select("token", F.lit(1).alias("s"), "n"))
        .groupBy("token")
        .agg(
            F.sum("s").cast("bigint").alias("ddf"),
            F.sum(F.col("s") * F.col("n")).cast("bigint").alias("dcf"),
        )
    )
    return (
        prev.join(deltas, "token", "full_outer")
        .select(
            "token",
            (F.coalesce("df", F.lit(0)) + F.coalesce("ddf", F.lit(0)))
            .cast("bigint")
            .alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("dcf", F.lit(0)))
            .cast("bigint")
            .alias("cf"),
        )
        .filter(F.col("df") > 0)
    )
