"""Randomized fuzz for the bounded Canal ALTER parser and the
foreachBatch DDL dedup fold — the adversarial shapes (quoted defaults
with commas, backslash escapes, unsigned types, interleaved unhandled
clauses; arbitrary announcement sequences across batch boundaries)
that hand-picked fixtures miss."""

import random

from change_data_capture_spark.sources import ddl


# (mysql type text, expected spark type) — includes parens, spacing,
# case and unsigned variants
TYPES = [
    ("int", "int"),
    ("INT(11)", "int"),
    ("int unsigned", "bigint"),
    ("bigint", "bigint"),
    ("bigint(20) unsigned", "decimal(20,0)"),
    ("varchar(255)", "string"),
    ("decimal(10,2)", "decimal(10,2)"),
    ("DECIMAL( 8 , 3 )", "decimal(8,3)"),
    ("text", "string"),
    ("datetime", "timestamp"),
    ("tinyint(1)", "boolean"),
    ("double", "double"),
]
DEFAULTS = [
    "",
    " DEFAULT 0",
    " DEFAULT 'plain'",
    " DEFAULT 'a,b'",           # comma inside literal
    " DEFAULT 'it''s, ok'",     # doubled-quote escape + comma
    " DEFAULT 'back\\\\slash'",   # escaped backslash
    " DEFAULT 'q\\', tail'",     # backslash-escaped quote + comma
    " NOT NULL",
    " NULL COMMENT 'x, (y)'",   # comma AND paren inside comment
]
UNHANDLED = [
    "DROP COLUMN legacy",
    "MODIFY COLUMN old int",
    "RENAME COLUMN a TO b",
    "ADD INDEX idx_x (x)",      # ADD but not a column: name 'INDEX'
]


def test_canal_alter_parser_fuzz():
    """100 random multi-clause ALTERs: every generated ADD COLUMN must
    come back (name, mapped type) in order; non-ADD clauses surface as
    unhandled; the parser never raises."""
    rng = random.Random(1234)
    for _ in range(100):
        table = rng.choice(["db.t", "`db`.`t`", "orders", '"db"."users"'])
        want_added = []
        clauses = []
        for ci in range(rng.randint(1, 6)):
            if rng.random() < 0.7:
                name = f"c{ci}"
                typ, spark_t = rng.choice(TYPES)
                col_kw = rng.choice(["COLUMN ", "column ", ""])
                quote = rng.choice(["", "`"])
                clauses.append(
                    f"ADD {col_kw}{quote}{name}{quote} {typ}"
                    f"{rng.choice(DEFAULTS)}"
                )
                want_added.append((name, spark_t))
            else:
                clauses.append(rng.choice(UNHANDLED))
        sql = f"ALTER TABLE {table} " + ", ".join(clauses)
        got_table, added, unhandled = ddl.parse_canal_alter(sql)
        assert got_table == table.replace("`", "").replace('"', "")
        assert added == want_added, sql
        n_unhandled = len(clauses) - len(want_added)
        assert len(unhandled) == n_unhandled, (sql, unhandled)


def test_dedupe_ddl_batch_fold_fuzz(spark):
    """Random announcement sequences split across random batch
    boundaries: committing each batch's updates sequentially must make
    the kept-DDL stream equal a pure-Python consecutive-dedup fold
    over the whole sequence (the stateful operator's semantics)."""
    from change_data_capture_spark.changelog import ddl_record
    from change_data_capture_spark.streaming import dedupe_ddl_batch

    schemas = {
        "A": spark.createDataFrame([(1,)], "id bigint").schema.json(),
        "B": spark.createDataFrame([(1, "x")], "id bigint, v string").schema.json(),
        "C": spark.createDataFrame([(1.0,)], "w double").schema.json(),
    }
    rng = random.Random(77)
    for _trial in range(3):
        events = [
            (rng.choice(["t.x", "t.y"]), rng.choice(list(schemas)))
            for _ in range(rng.randint(4, 8))
        ]
        # reference: per-table consecutive dedup over the full sequence
        ref_last: dict = {}
        ref_kept = []
        for t, s in events:
            if ref_last.get(t) != s:
                ref_kept.append((t, s))
            ref_last[t] = s
        # split into 1-3 batches at random boundaries
        cuts = sorted(rng.sample(range(1, len(events)), rng.randint(0, 2)))
        batches, prev = [], 0
        for c in cuts + [len(events)]:
            batches.append(events[prev:c])
            prev = c
        state: dict = {}
        got_kept = []
        for batch in batches:
            frame = None
            for t, s in batch:
                r = ddl_record(spark, t, schemas[s])
                frame = r if frame is None else frame.unionByName(r)
            out, updates = dedupe_ddl_batch(frame, state)
            for row in out.filter(out["ddl"].isNotNull()).collect():
                got_kept.append((row["ddl"]["table"], row["ddl"]["schema"]))
            state.update(updates)  # the post-apply commit
        want = [(t, schemas[s]) for t, s in ref_kept]
        # batch rebuilds emit DDL-first per batch; compare as multiset
        # per batch boundary is unnecessary — the SEQUENCE of kept
        # announcements per table is what the fold defines
        per_table = lambda seq: {  # noqa: E731
            t: [s for tt, s in seq if tt == t] for t in ("t.x", "t.y")
        }
        assert per_table(got_kept) == per_table(want), (events, cuts)


def test_effective_schema_simulation_matches_real_announce(spark, tmp_path):
    """r8 property: TableCatalog.effective_schema_json — the PURE
    simulation typed_dead_letters uses to resolve the post-announce
    quarantine schema — must equal the registered schema the SAME
    announcement chain produces through announce_schema, over
    randomized evolution sequences (add / drop / re-type / widen /
    PK-omitting announcements). Any divergence is exactly the
    quarantine-vs-apply schema mismatch the r7 advisory flagged."""
    import random

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    rng = random.Random(4242)
    types = [LongType(), StringType(), DoubleType()]
    pool = [f"c{i}" for i in range(6)]

    def rand_schema():
        cols = rng.sample(pool, rng.randrange(1, 5))
        return StructType(
            [StructField("id", LongType(), True)]
            + [StructField(c, rng.choice(types), True) for c in cols]
        )

    for trial in range(6):
        cat = TableCatalog(str(tmp_path / f"cat{trial}"))
        # c0 seeds with a value castable under ANY random re-type —
        # announce's rewrite fail-loud on incompatible data is its own
        # documented behavior, not this property
        df = spark.createDataFrame([(1, "1")], "id long, c0 string")
        apply_changelog(spark, snapshot_changelog(df, "t.z", ["id"]), cat)
        chain = [rand_schema().json() for _ in range(rng.randrange(1, 4))]
        if rng.random() < 0.5:
            # an announcement that OMITS the PK: the survival rule
            # must agree between the two paths
            no_pk = StructType(
                [StructField("c5", StringType(), True)]
            )
            chain.insert(rng.randrange(len(chain) + 1), no_pk.json())
        predicted = cat.effective_schema_json("t.z", chain)
        for sj in chain:
            cat.announce_schema("t.z", sj, spark=spark)
        assert predicted == cat.meta("t.z")["schema"], (
            f"trial {trial}: simulation diverged from announce for "
            f"chain {chain}"
        )
