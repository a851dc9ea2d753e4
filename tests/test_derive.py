"""Incremental aggregate maintenance (derive.py): after every batch,
the incrementally-maintained materialization must equal a full
recomputation — including group-moving updates (old group's
contribution dropped) and deletes."""

import random

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import dml_records
from change_data_capture_spark.derive import maintain_aggregate

AGGS = lambda: {  # noqa: E731
    "n": F.count("*"),
    "total": F.sum(F.col("amount")).cast("long"),
}


def _full(spark, cat):
    return cat.read(spark, "t.sales").groupBy("region").agg(
        *[e.alias(n) for n, e in AGGS().items()]
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_agg_matches_full_recompute(spark, tmp_path):
    rng = random.Random(11)
    cat = TableCatalog(str(tmp_path / "cat"))
    regions = ["east", "west", "north", "south"]

    version = 1
    base = [(i, regions[i % 4], (i * 7) % 100) for i in range(60)]
    seed = spark.createDataFrame(base, "id long, region string, amount long")
    apply_changelog(
        spark, dml_records(seed, "t.sales", ["id"], op="INSERT", version=1), cat
    )
    agg = maintain_aggregate(spark, cat, "t.sales", ["region"], AGGS())
    assert _rows(agg) == _rows(_full(spark, cat))

    for _ in range(3):
        from_version = cat.versions("t.sales")[-1]
        prev = agg.localCheckpoint()  # freeze the previous materialization
        ops = []
        for _ in range(15):
            version += 1
            key = rng.randrange(80)  # moves groups, inserts new, hits existing
            if rng.random() < 0.3:
                ops.append((version, key, "DELETE", None, None))
            else:
                ops.append(
                    (version, key, "UPDATE", regions[rng.randrange(4)], rng.randrange(100))
                )
        df = spark.createDataFrame(
            [(v, k, op, r, a) for v, k, op, r, a in ops],
            "__ver long, id long, __op string, region string, amount long",
        )
        ups = dml_records(
            df.filter(F.col("__op") != "DELETE"),
            "t.sales", ["id"], op=F.col("__op"), version=F.col("__ver"),
        )
        dels = dml_records(
            df.filter(F.col("__op") == "DELETE"),
            "t.sales", ["id"], op=F.col("__op"), version=F.col("__ver"), keys_only=True,
        )
        apply_changelog(spark, ups.unionByName(dels), cat)

        agg = maintain_aggregate(
            spark, cat, "t.sales", ["region"], AGGS(),
            prev=prev, from_version=from_version,
        )
        assert _rows(agg) == _rows(_full(spark, cat))


def test_scd2_history_interval_semantics(spark):
    from change_data_capture_spark.derive import scd2_history

    flat = spark.createDataFrame(
        [
            # k=1: insert -> update -> delete (two closed intervals)
            (1, "a", "INSERT", 10),
            (1, "b", "UPDATE", 20),
            (1, None, "DELETE", 30),
            # k=2: insert only (one open interval)
            (2, "x", "INSERT", 15),
            # k=3: insert -> update, still current
            (3, "p", "INSERT", 5),
            (3, "q", "UPDATE", 25),
        ],
        "k int, val string, CDC_OP_TYPE string, CHANGE_TRACKING_VERSION long",
    )
    out = {
        (r["k"], r["valid_from"]): (r["val"], r["valid_to"], r["is_current"])
        for r in scd2_history(flat, ["k"]).collect()
    }
    assert out == {
        (1, 10): ("a", 20, False),
        (1, 20): ("b", 30, False),  # closed by the DELETE
        (2, 15): ("x", None, True),
        (3, 5): ("p", 25, False),
        (3, 25): ("q", None, True),
    }


def test_incremental_join_matches_full_recompute(spark, tmp_path):
    """The denormalized-join materialization must equal a full rejoin
    after every batch — including fact updates that MOVE a row to a
    different dim key, dim value updates that stale unchanged fact
    rows in place, and dim deletes that must erase their fact rows
    from the view."""
    from change_data_capture_spark.derive import maintain_join

    rng = random.Random(7)
    cat = TableCatalog(str(tmp_path / "cat"))

    dims = [(d, f"name{d}", d * 10) for d in range(8)]
    facts = [(i, i % 8, (i * 3) % 50) for i in range(40)]
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame(dims, "dk long, dname string, drank long"),
            "t.dim", ["dk"], op="INSERT", version=1,
        ),
        cat,
    )
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame(facts, "id long, dk_ref long, amount long"),
            "t.fact", ["id"], op="INSERT", version=1,
        ),
        cat,
    )

    def full():
        f, d = cat.read(spark, "t.fact"), cat.read(spark, "t.dim")
        dw = d.select("dk", F.col("dname").alias("dim_dname"), F.col("drank").alias("dim_drank"))
        return f.join(dw, f.dk_ref == dw.dk).drop("dk")

    view = maintain_join(spark, cat, "t.fact", "t.dim", "dk_ref")
    assert _rows(view) == _rows(full())

    version = 1
    for _ in range(3):
        fact_from = cat.versions("t.fact")[-1]
        dim_from = cat.versions("t.dim")[-1]
        prev = view.localCheckpoint()

        fops, dops = [], []
        for _ in range(10):
            version += 1
            key = rng.randrange(50)  # hits existing facts + inserts new
            if rng.random() < 0.25:
                fops.append((version, key, "DELETE", None, None))
            else:  # may move the fact to another dim (changed dk_ref)
                fops.append((version, key, "UPDATE", rng.randrange(10), rng.randrange(50)))
        for _ in range(3):
            version += 1
            d = rng.randrange(10)  # touches existing dims + inserts new
            if rng.random() < 0.2:
                dops.append((version, d, "DELETE", None, None))
            else:
                dops.append((version, d, "UPDATE", f"renamed{version}", rng.randrange(99)))

        fdf = spark.createDataFrame(
            fops, "__ver long, id long, __op string, dk_ref long, amount long"
        )
        ddf = spark.createDataFrame(
            dops, "__ver long, dk long, __op string, dname string, drank long"
        )
        log = dml_records(
            fdf.filter("__op != 'DELETE'"), "t.fact", ["id"],
            op=F.col("__op"), version=F.col("__ver"),
        ).unionByName(dml_records(
            fdf.filter("__op = 'DELETE'"), "t.fact", ["id"],
            op=F.col("__op"), version=F.col("__ver"), keys_only=True,
        )).unionByName(dml_records(
            ddf.filter("__op != 'DELETE'"), "t.dim", ["dk"],
            op=F.col("__op"), version=F.col("__ver"),
        )).unionByName(dml_records(
            ddf.filter("__op = 'DELETE'"), "t.dim", ["dk"],
            op=F.col("__op"), version=F.col("__ver"), keys_only=True,
        ))
        apply_changelog(spark, log, cat)

        view = maintain_join(
            spark, cat, "t.fact", "t.dim", "dk_ref",
            prev=prev, fact_from=fact_from, dim_from=dim_from,
        )
        assert _rows(view) == _rows(full())


def test_value_index_incremental_matches_rebuild_and_serves_lookups(spark, tmp_path):
    """The incrementally-maintained secondary index must equal a
    from-scratch rebuild after every batch — including value-moving
    updates (old posting dropped), deletes (value vanishing entirely
    -> index row deleted), shared values (multi-PK postings) — and
    lookup_by_index must serve current rows for current values and
    nothing for vacated ones."""
    import random

    from change_data_capture_spark.derive import lookup_by_index, maintain_value_index

    rng = random.Random(7)
    cat = TableCatalog(str(tmp_path / "cat"))
    emails = [f"u{i}@x.com" for i in range(30)]

    base = [(i, emails[i % 25], (i * 3) % 50) for i in range(40)]  # some shared
    seed = spark.createDataFrame(base, "id long, email string, amount long")
    apply_changelog(
        spark, dml_records(seed, "t.users", ["id"], op="INSERT", version=1), cat
    )
    idx = maintain_value_index(spark, cat, "t.users", ["email"], "t.users_by_email")

    def expected_index():
        return sorted(
            tuple(r)
            for r in cat.read(spark, "t.users")
            .filter(F.col("email").isNotNull())
            .groupBy("email")
            .agg(F.sort_array(F.collect_set(F.struct("id"))).alias("postings"))
            .collect()
        )

    assert sorted(tuple(r) for r in idx.collect()) == expected_index()

    version = 1
    for _ in range(3):
        ops = []
        for _ in range(12):
            version += 1
            key = rng.randrange(50)
            if rng.random() < 0.3:
                ops.append((version, key, "DELETE", None, None))
            else:
                # value-moving update / insert, occasionally NULL email
                em = None if rng.random() < 0.1 else rng.choice(emails)
                ops.append((version, key, "UPDATE", em, rng.randrange(50)))
        df = spark.createDataFrame(
            ops, "__ver long, id long, __op string, email string, amount long"
        )
        ups = dml_records(
            df.filter(F.col("__op") != "DELETE"),
            "t.users", ["id"], op=F.col("__op"), version=F.col("__ver"),
        )
        dels = dml_records(
            df.filter(F.col("__op") == "DELETE"),
            "t.users", ["id"], op=F.col("__op"), version=F.col("__ver"),
            keys_only=True,
        )
        apply_changelog(spark, ups.unionByName(dels), cat)
        # from_version self-derives from the index's own stamp
        idx = maintain_value_index(
            spark, cat, "t.users", ["email"], "t.users_by_email"
        )
        assert sorted(tuple(r) for r in idx.collect()) == expected_index()

    # point lookups: one live value, one vacated value
    live = cat.read(spark, "t.users").filter(F.col("email").isNotNull())
    some = live.select("email").first()["email"]
    got = lookup_by_index(
        spark, cat, "t.users", "t.users_by_email",
        spark.createDataFrame([(some,)], "email string"),
    )
    want = sorted(tuple(r) for r in live.filter(F.col("email") == some).collect())
    assert sorted(tuple(r) for r in got.collect()) == want
    vacated = spark.createDataFrame([("nobody@nowhere",)], "email string")
    assert lookup_by_index(spark, cat, "t.users", "t.users_by_email", vacated).count() == 0


def test_token_stats_incremental_matches_full_recompute(spark, tmp_path):
    """The delta-maintained df/cf table must equal a full corpus
    re-tokenization after every batch — including text rewrites (old
    counts subtracted), deletes (tokens vanishing entirely -> row
    dropped), and new docs."""
    import random

    from change_data_capture_spark.derive import maintain_token_stats

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def text():
        return " ".join(rng.choice(words) for _ in range(rng.randrange(1, 8)))

    cat = TableCatalog(str(tmp_path / "cat"))
    seed = spark.createDataFrame(
        [(i, text()) for i in range(25)], "doc_id long, text string"
    )
    apply_changelog(
        spark, dml_records(seed, "c.docs", ["doc_id"], op="INSERT", version=1), cat
    )
    stats = maintain_token_stats(spark, cat, "c.docs")

    def full():
        return sorted(
            tuple(r)
            for r in maintain_token_stats(spark, cat, "c.docs").collect()
        )

    assert sorted(tuple(r) for r in stats.collect()) == full()

    version = 1
    for _ in range(3):
        from_version = cat.versions("c.docs")[-1]
        prev = stats.localCheckpoint()
        ops = []
        for _ in range(10):
            version += 1
            key = rng.randrange(35)
            if rng.random() < 0.3:
                ops.append((version, key, "DELETE", None))
            else:
                ops.append((version, key, "UPDATE", text()))
        df = spark.createDataFrame(
            ops, "__ver long, doc_id long, __op string, text string"
        )
        ups = dml_records(
            df.filter(F.col("__op") != "DELETE"),
            "c.docs", ["doc_id"], op=F.col("__op"), version=F.col("__ver"),
        )
        dels = dml_records(
            df.filter(F.col("__op") == "DELETE"),
            "c.docs", ["doc_id"], op=F.col("__op"), version=F.col("__ver"),
            keys_only=True,
        )
        apply_changelog(spark, ups.unionByName(dels), cat)
        stats = maintain_token_stats(
            spark, cat, "c.docs", prev=prev, from_version=from_version
        )
        assert sorted(tuple(r) for r in stats.collect()) == full()


def test_derived_tables_survive_scheduled_ingest_loop(spark, tmp_path):
    """Three simulated ingest days through the declarative pipeline
    front door, with the secondary index refreshed after each day on
    its SELF-DERIVED watermark (no external refresh state) — the
    scheduled-job shape a production deployment runs. After every day
    the index must equal a from-scratch rebuild and lookups must see
    that day's rows."""
    from change_data_capture_spark.derive import lookup_by_index, maintain_value_index
    from change_data_capture_spark.pipeline import run_pipeline
    from change_data_capture_spark.sources import debezium

    cat = TableCatalog(str(tmp_path / "cat"))
    T = "crm.users"
    cfg = {"source": {"format": "debezium"}, "tables": {T: {"keys": ["id"]}}}

    def day(n, op, rows):
        df = spark.createDataFrame(rows, "id long, email string, score long")
        full = F.struct(F.col("id"), F.col("email"), F.col("score"))
        return debezium.encode_debezium_json(df, table=T, op=op, before=None,
                                             after=full, ts_ms=n)

    schema = "id long, email string, score long"
    cfg["tables"][T]["schema"] = spark.createDataFrame([], schema).schema.json()
    batches = [
        day(1, "r", [(i, f"u{i}@a", i) for i in range(10)]),
        day(2, "u", [(i, f"u{i}@b", i * 2) for i in range(0, 10, 2)]),  # emails move
        day(3, "c", [(i, f"u{i}@a", i) for i in range(10, 15)]),        # new users
    ]
    for msgs in batches:
        run_pipeline(spark, msgs, cfg, cat)
        idx = maintain_value_index(spark, cat, T, ["email"], "crm.users_by_email")
        expected = sorted(
            tuple(r)
            for r in cat.read(spark, T)
            .groupBy("email")
            .agg(F.sort_array(F.collect_set(F.struct("id"))).alias("postings"))
            .collect()
        )
        assert sorted(tuple(r) for r in idx.collect()) == expected
    # day-2 moved emails resolve to the moved rows; day-1 addresses vacated
    got = lookup_by_index(
        spark, cat, T, "crm.users_by_email",
        spark.createDataFrame([("u2@b",), ("u2@a",)], "email string"),
    ).collect()
    assert [(r["id"], r["email"], r["score"]) for r in got] == [(2, "u2@b", 4)]


def test_value_index_delete_only_refresh_keeps_watermark_exact(spark, tmp_path):
    """Review regression: a refresh whose only effect is DELETEs stamps
    the index at 2*base_version (no upsert leg), and the next
    self-derived from_version must still recover the exact base
    version — not one too early."""
    from change_data_capture_spark.derive import maintain_value_index

    cat = TableCatalog(str(tmp_path / "cat"))
    seed = spark.createDataFrame(
        [(1, "a@x"), (2, "b@x")], "id long, email string"
    )
    apply_changelog(
        spark, dml_records(seed, "t.u", ["id"], op="INSERT", version=1), cat
    )
    maintain_value_index(spark, cat, "t.u", ["email"], "t.u_idx")
    # batch 2: delete id=1 -> value 'a@x' vanishes; NO new/changed values
    apply_changelog(
        spark,
        dml_records(seed.filter(F.col("id") == 1), "t.u", ["id"],
                    op="DELETE", version=2, keys_only=True),
        cat,
    )
    idx = maintain_value_index(spark, cat, "t.u", ["email"], "t.u_idx")
    assert [r["email"] for r in idx.collect()] == ["b@x"]
    base_v2 = cat.versions("t.u")[-1]
    assert int(cat.meta("t.u_idx")["applied_version"]) // 2 == base_v2
    # batch 3 refresh self-derives from v2 (not v1) and stays exact
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(3, "c@x")], "id long, email string"),
            "t.u", ["id"], op="INSERT", version=3,
        ),
        cat,
    )
    idx = maintain_value_index(spark, cat, "t.u", ["email"], "t.u_idx")
    assert sorted(r["email"] for r in idx.collect()) == ["b@x", "c@x"]


def test_value_index_refresh_across_base_retype(spark, tmp_path):
    """r8 seam review: a re-type of the INDEXED column between the
    refresh basis and current made the affected-value union/joins
    coerce across types — ANSI-crashing on an old-typed value ('abc')
    that the re-type era deleted. The refresh now computes the value
    domain in canonical string form normalized through the index's
    registered types: stale postings delete, fresh ones land, no
    crash."""
    from change_data_capture_spark.apply import (
        TableCatalog,
        apply_changelog,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.derive import maintain_value_index
    from pyspark.sql import functions as F

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(1, "100"), (2, "200"), (3, "abc")], "id long, code string"
    )
    apply_changelog(spark, snapshot_changelog(df, "t.u", ["id"]), cat)
    maintain_value_index(spark, cat, "t.u", ["code"], "t.u_idx")
    apply_changelog(
        spark,
        dml_records(df.filter("id = 3"), "t.u", ["id"], op="DELETE",
                    version=2, keys_only=True),
        cat,
    )
    cat.announce_schema(
        "t.u",
        spark.createDataFrame([], "id long, code bigint").schema.json(),
        spark=spark,
    )
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(2, 999)], "id long, code bigint"),
            "t.u", ["id"], op="UPDATE", version=3,
        ),
        cat,
    )
    idx = maintain_value_index(spark, cat, "t.u", ["code"], "t.u_idx")
    got = sorted(
        (r.code, sorted(p.id for p in r.postings)) for r in idx.collect()
    )
    assert got == [("100", [1]), ("999", [2])]


def test_value_index_refresh_composite_cols_mixed_retype(spark, tmp_path):
    """Composite value_cols where only ONE column re-typed between the
    basis and current: the canonical-string value domain normalizes
    per column, so the composite affected set still lines up with the
    index's stored identities."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.derive import maintain_value_index
    from pyspark.sql import functions as F

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(1, "100", "US"), (2, "200", "DE"), (3, "bad", "FR")],
        "id long, code string, cc string",
    )
    apply_changelog(spark, snapshot_changelog(df, "t.m", ["id"]), cat)
    maintain_value_index(spark, cat, "t.m", ["code", "cc"], "t.m_idx")
    apply_changelog(
        spark,
        dml_records(df.filter("id = 3"), "t.m", ["id"], op="DELETE",
                    version=2, keys_only=True),
        cat,
    )
    cat.announce_schema(
        "t.m",
        spark.createDataFrame([], "id long, code bigint, cc string").schema.json(),
        spark=spark,
    )
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(2, 999, "DE")],
                                  "id long, code bigint, cc string"),
            "t.m", ["id"], op="UPDATE", version=3,
        ),
        cat,
    )
    idx = maintain_value_index(spark, cat, "t.m", ["code", "cc"], "t.m_idx")
    got = sorted(
        (r.code, r.cc, sorted(p.id for p in r.postings)) for r in idx.collect()
    )
    assert got == [("100", "US", [1]), ("999", "DE", [2])]


def test_value_index_refresh_typed_index_with_pre_retype_basis(spark, tmp_path):
    """The inverse re-type direction: the INDEX was built AFTER the
    base re-typed (typed bigint key), and a caller explicitly diffs
    from a PRE-re-type basis whose values include an uncastable raw
    form — the raw form names no typed index entry, so it must be
    silently excluded from the delete leg rather than ANSI-crashing
    the typed decode."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.derive import maintain_value_index
    from pyspark.sql import functions as F

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(1, "100"), (2, "200"), (3, "abc")], "id long, code string"
    )
    apply_changelog(spark, snapshot_changelog(df, "t.r", ["id"]), cat)
    apply_changelog(
        spark,
        dml_records(df.filter("id = 3"), "t.r", ["id"], op="DELETE",
                    version=2, keys_only=True),
        cat,
    )
    cat.announce_schema(
        "t.r",
        spark.createDataFrame([], "id long, code bigint").schema.json(),
        spark=spark,
    )
    # index built AFTER the re-type: its key column is bigint
    maintain_value_index(spark, cat, "t.r", ["code"], "t.r_idx")
    assert dict(cat.read(spark, "t.r_idx").dtypes)["code"] == "bigint"
    # explicit pre-re-type basis: version 1 still holds 'abc'
    idx = maintain_value_index(spark, cat, "t.r", ["code"], "t.r_idx",
                               from_version=1)
    got = sorted(
        (r.code, sorted(p.id for p in r.postings)) for r in idx.collect()
    )
    assert got == [(100, [1]), (200, [2])]
