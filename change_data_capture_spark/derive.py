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

from .apply import TableCatalog
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

    fresh = (
        base.join(affected, keys, "left_semi")
        .groupBy(*keys)
        .agg(*agg_exprs)
    )
    kept = prev.join(affected, keys, "left_anti")
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
