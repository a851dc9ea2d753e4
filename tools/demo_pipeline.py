"""End-to-end demo: every major engine surface in one runnable script.

    python tools/demo_pipeline.py [sf_dir]     (default sf0.001, ~40 s)

Walks the full life of a change-data pipeline on the test fixtures:
CT-style snapshot+mutation apply with the per-batch report, a Debezium
feed decoded/applied/re-emitted (with dead letters), an incrementally
maintained aggregate, the change-data-feed diff, catalog maintenance
(compact + vacuum + time travel), and a taste of the LLM-pipeline
extensions (MinHash dedup, language id, ANN top-k). Prints one short
section per stage — a living tour of COVERAGE.md for a human
evaluating the engine.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def section(title):
    print(f"\n=== {title} " + "=" * max(1, 60 - len(title)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from change_data_capture_spark.session import get_spark
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import mutation_changelog, snapshot_changelog
    from change_data_capture_spark.derive import maintain_aggregate
    from change_data_capture_spark.normalize import normalize_raw_ops
    from change_data_capture_spark.sources import debezium
    from change_data_capture_spark.extensions import dedup, similarity, text

    spark = get_spark("cdc-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="cdc_demo_")
    cat = TableCatalog(os.path.join(root, "catalog"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    section("1. CT-style snapshot apply (create-on-first-DML)")
    rep = apply_changelog(spark, snapshot_changelog(cust, "tpch.customer", ["c_custkey"]), cat)
    print("report:", rep)
    print("rows:", cat.read(spark, "tpch.customer").count())

    section("2. Mutation batch -> bucket-pruned MERGE")
    mut = mutation_changelog(
        cust, "tpch.customer", ["c_custkey"],
        update_where=F.col("c_custkey") % 7 == 3,
        update_set={"c_acctbal": F.col("c_acctbal") + 100.0}, update_version=2,
        delete_where=F.col("c_custkey") % 7 == 5, delete_version=3,
    )
    print("report:", apply_changelog(spark, mut, cat))

    section("3. Change data feed (version diff) -> outbound Debezium")
    feed = cat.table_changes(spark, "tpch.customer", 1, 2)
    feed.groupBy("_change_type").count().show()
    out = debezium.table_changes_to_debezium(feed, table="tpch.customer", ts_ms=2)
    print("sample outbound message:", out.first()["message"][:120], "...")

    section("4. Inbound Debezium decode + dead letters")
    junk = spark.range(3).select(F.concat(F.lit("junk"), F.col("id")).alias("message"))
    mixed = out.unionByName(junk)
    keys = {"tpch.customer": ["c_custkey"]}
    good = debezium.debezium_raw_ops(mixed, keys)
    dead = debezium.debezium_dead_letters(mixed, keys)
    print("good:", good.count(), "dead:", dead.count())
    normalize_raw_ops(good).select("dml.op_type").groupBy("op_type").count().show()

    section("5. Incrementally-maintained aggregate over the base table")
    agg = maintain_aggregate(
        spark, cat, "tpch.customer",
        ["c_mktsegment"],
        {"n": F.count("*"), "bal": F.sum(F.col("c_acctbal").cast("decimal(18,2)"))},
    )
    agg.orderBy("c_mktsegment").show(5)

    section("6. Catalog maintenance: compact, vacuum, time travel")
    cat.compact(spark, "tpch.customer", n_buckets=4)
    dropped = cat.vacuum("tpch.customer", keep_last=2)
    print("vacuumed versions:", dropped, "| buckets now:", cat.meta("tpch.customer")["buckets"])
    oldest = cat.versions("tpch.customer")[0]
    print(
        f"time travel to v{oldest} (oldest surviving) rows:",
        cat.read(spark, "tpch.customer", version=oldest).count(),
    )

    section("7. LLM-pipeline extensions on the documents/embeddings tables")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = dedup.minhash_lsh_duplicates(docs, threshold=0.8)
    print("near-dup pairs (MinHash-LSH, exact-verified):", pairs.count())
    text.language_id(docs).groupBy("detected_lang").count().show()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    similarity.brute_force_topk(emb, emb.filter("vec_id < 3"), k=3).show()

    section("8. Web curation + snapshot export")
    from change_data_capture_spark import registry

    curated = registry.REGISTRY["corpus_curation_pipeline"].fn(spark, sf_dir)
    curated.groupBy("split").count().show()
    man = cat.export_snapshot(spark, "tpch.customer", os.path.join(root, "export"))
    print("exported", man["n_rows"], "rows in", man["n_files"], "files + manifest.json")

    section("9. Round-3 additions: point lookup, handoff, linkage, graph")
    from change_data_capture_spark.apply import bootstrap_replica, lookup_keys

    keys = spark.createDataFrame([(r.c_custkey,) for r in
                                  cust.limit(3).collect()], "c_custkey long")
    lookup_keys(spark, cat, "tpch.customer", keys).show(3)
    replica = TableCatalog(os.path.join(root, "replica"))
    rep = bootstrap_replica(spark, cat, "tpch.customer", replica)
    print("replica bootstrapped + handed off:", rep.count(), "rows")
    print("pagerank over the doc link graph / blocked record linkage:")
    registry.REGISTRY["web_pagerank"].fn(spark, sf_dir).orderBy(
        F.col("rank_ppt").desc()).show(3)
    registry.REGISTRY["er_blocked_match"].fn(spark, sf_dir).show(3)

    section("10. Round-4 additions: wire formats, BPE, payload dedup, OCC")
    from change_data_capture_spark.apply import maintenance_report
    from change_data_capture_spark.extensions import multimodal
    from change_data_capture_spark.sources import wire_formats as wfmt

    mx = wfmt.encode_maxwell_json(
        cust.limit(5), table="tpch.customer", typ="insert",
        data=F.struct(*[F.col(c) for c in cust.columns]), ts=9,
    )
    print("maxwell decode ->", wfmt.maxwell_raw_ops(
        mx, {"tpch.customer": ["c_custkey"]}).count(), "raw ops")
    merges = text.bpe_train(docs, iters=3)
    print("BPE merges learned:")
    merges.show(3, truncate=False)
    enc = text.bpe_encode_counts(docs, iters=3)
    enc.agg(F.sum("n_chars_compact").alias("chars"),
            F.sum("n_bpe_tokens").alias("bpe_tokens")).show()
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"))
    print("binary payload exact dups:",
          multimodal.payload_exact_duplicates(payloads).count())
    print("full-convention pagerank (dangling mass + early stop):")
    registry.REGISTRY["web_pagerank_full"].fn(spark, sf_dir).orderBy(
        F.col("rank_ppt").desc()).show(3)
    print("maintenance advisor:", maintenance_report(cat)[:1])

    section("11. Chunked bootstrap, drift monitors, C4 gate, Z-order")
    from change_data_capture_spark.compat import check_compat
    from change_data_capture_spark.dblog import ChunkedSnapshot, select_chunk
    from change_data_capture_spark.extensions import profile as prof
    from change_data_capture_spark.extensions.scale import zorder_expr
    from change_data_capture_spark.changelog import dml_records

    # DBLog-style no-lock bootstrap: chunk, live feed batch, raced chunk
    tgt = TableCatalog(os.path.join(root, "dblog"))
    cs = ChunkedSnapshot(spark, tgt, "tpch.customer", ["c_custkey"], cust.schema.json())
    cs.begin()
    cs.apply_chunk(select_chunk(cust, "c_custkey", 0, 50))
    feed = dml_records(cust.filter(F.col("c_custkey") % 9 == 1), "tpch.customer",
                       ["c_custkey"], op="UPDATE", version=1000,
                       value_overrides={"c_acctbal": F.lit(0.0)})
    cs.apply_feed(feed)
    cs.apply_chunk(select_chunk(cust, "c_custkey", 50, None), window_events=feed)
    print("chunked-bootstrap replica rows:", cs.result().count())

    print("column profile (one pass):")
    prof.column_profile(cust, ["c_custkey", "c_acctbal"]).show(truncate=False)
    drift = prof.numeric_drift(
        cust.filter(F.col("c_custkey") % 2 == 0),
        cust.filter(F.col("c_custkey") % 2 == 1),
        "c_acctbal", lo=-1000.0, hi=10000.0, n_bins=8,
    )
    print("acctbal drift TVD:", prof.tvd(drift))
    print("C4 page gate kept:",
          text.c4_rules(docs).filter("kept").count(), "/", docs.count())
    print("schema-compat gate (drop required id, FORWARD):",
          check_compat("""{"type":"struct","fields":[
            {"name":"id","type":"long","nullable":false,"metadata":{}},
            {"name":"v","type":"double","nullable":true,"metadata":{}}]}""",
            '{"type":"struct","fields":[{"name":"v","type":"double","nullable":true,"metadata":{}}]}',
            "FORWARD"))
    cat.compact(spark, "tpch.customer",
                sort_by=[zorder_expr(("c_nationkey", 0, 32), ("c_acctbal", -1024.0, 10240.0), bits=5)])
    print("z-order compacted; rows unchanged:", cat.read(spark, "tpch.customer").count())

    section("12. Consistency audit, KS drift, gap fill, SQL views")
    from change_data_capture_spark.audit import (
        checksum_diff, replication_lag_report, table_checksum,
    )
    from change_data_capture_spark.extensions.temporal import resample_gapfill

    print("replica vs chunked-bootstrap replica checksums:")
    d = checksum_diff(
        table_checksum(spark, cat, "tpch.customer"),
        table_checksum(spark, tgt, "tpch.customer"),
    )
    print("  differing buckets:", d.count(), "(chunked replica missed the demo mutations)")
    print("  lag report:", replication_lag_report(cat, tgt))
    (ks,) = prof.ks_drift(
        cust.filter(F.col("c_custkey") % 2 == 0),
        cust.filter(F.col("c_custkey") % 2 == 1), "c_acctbal",
    ).collect()
    print("acctbal KS numerator:", ks["ks_num"], "/", ks["t_base"], "x", ks["t_cur"])
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    resample_gapfill(ev, key_col="event_type", ts_col="ts", value_col="value",
                     start="2024-01-01 00:00:00", end="2024-01-03 00:00:00",
                     interval="12 hour").show(4)
    print("spark.sql over managed tables:", cat.register_views(spark))
    print(spark.sql("SELECT COUNT(*) AS n FROM tpch_customer").first())

    section("13. Late-r4: blocklist, classifier, packing, decontamination")
    from change_data_capture_spark.audit import feed_gap_report
    from change_data_capture_spark.extensions import scale, web

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                   (F.col("doc_id") % 7).cast("string"))
    rules = spark.createDataFrame(
        [("src1.example.com", "domain"), ("https://src2.example.com/p/3", "url_prefix")],
        "pattern string, kind string")
    bl = web.blocklist_filter(docs.select("doc_id", url.alias("url")), rules)
    print("blocklist: blocked", bl.filter("blocked").count(), "of", bl.count())
    sc = text.hashed_ngram_score(docs)
    print("hashed-ngram classifier keeps:",
          sc.filter("keep").count(), "of", sc.count())
    cw = scale.context_windows(docs, size=512)
    print("context windows (512 tok):", cw.select("window_id").distinct().count(),
          "windows,", cw.count(), "doc spans")
    print("regex tokens sample:",
          text.regex_token_stats(docs).select("n_regex_tokens").agg(F.sum("n_regex_tokens")).first()[0],
          "corpus regex tokens")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dec = similarity.embedding_decontaminate(
        emb.filter(F.col("vec_id") % 10 != 0), emb.filter(F.col("vec_id") % 10 == 0),
        threshold=0.4, dim=64)
    print("semantic contamination pairs:", dec.count())
    feed = docs.select(F.lit("docs").alias("table"), F.col("doc_id").alias("version")) \
               .filter(F.col("version") % 9 != 4)
    print("feed-gap audit rows:", feed_gap_report(feed).count())

    section("14. Patch apply, decode DLQ, BM25, group AS-OF cut")
    from change_data_capture_spark.apply import decode_rows_safe, undecodable_rows
    from change_data_capture_spark.normalize import patch_updates

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    ck = F.col("c_custkey")
    patched = patch_updates(
        cust,
        cust.filter(ck % 5 == 0).select(
            ck.alias("c_custkey"), F.lit(1).alias("version"),
            F.create_map(F.lit("c_acctbal"), (ck % 100).cast("string")).alias("patch"),
        ),
        ["c_custkey"],
    )
    print("compressed-update patch: rows", patched.count(),
          "patched", patched.join(cust.select(ck.alias("c_custkey"),
          F.col("c_acctbal").alias("b")), "c_custkey")
          .filter("c_acctbal <> b").count())
    feed2 = cust.select(
        F.lit("INSERT").alias("op_type"),
        F.map_from_arrays(
            F.array(F.lit("c_custkey"), F.lit("c_acctbal")),
            F.array(ck.cast("string"),
                    F.when(ck % 11 == 0, F.lit("N/A")).otherwise(F.col("c_acctbal").cast("string"))),
        ).alias("rows_values"),
        ck.alias("change_tracking_version"),
    )
    slim = cust.select("c_custkey", "c_acctbal").schema
    print("decode DLQ: clean", decode_rows_safe(feed2, slim).count(),
          "quarantined", undecodable_rows(feed2, slim).count())
    print("BM25 top-3:",
          [(r.doc_id, r.score) for r in text.bm25_topk(docs, ["hash", "join"], k=3).collect()])
    wm = cat.meta("tpch.customer")["applied_version"]
    print("group AS-OF cut at current watermark:",
          cat.read_asof_watermark(spark, "tpch.customer", wm).count(), "rows;",
          "cut version", cat.version_at_watermark("tpch.customer", wm))

    section("15. Index persistence: vectors as CDC citizens")
    emb2 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    from change_data_capture_spark.changelog import snapshot_changelog as snap
    from change_data_capture_spark.extensions.similarity import ivf_ann_topk, ivf_index

    vcat = TableCatalog(os.path.join(root, "vectors"))
    apply_changelog(spark, snap(emb2, "ml.emb", ["vec_id"]), vcat)
    print("embeddings CDC-applied as typed arrays:",
          vcat.read(spark, "ml.emb").count(), "rows,",
          dict(vcat.read(spark, "ml.emb").dtypes)["embedding"])
    apply_changelog(spark, snap(ivf_index(emb2, dim=64), "ml.ivf", ["vec_id"]), vcat)
    hits = ivf_ann_topk(emb2, emb2.filter("vec_id < 2"), k=3, dim=64,
                        index=vcat.read(spark, "ml.ivf"))
    print("IVF top-3 from the PERSISTED index:",
          [(r.query_id, r.neighbor_id, r.score) for r in hits.collect()])
    apply_changelog(spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=96), vcat)
    idx_pairs = dedup.minhash_lsh_against_index(
        docs.limit(4).select((F.col("doc_id") + 900000).alias("doc_id"), "text"),
        vcat.read(spark, "ml.sigs"), docs, n=5, k=96, bands=24)
    print("new batch vs persisted MinHash index:", idx_pairs.count(), "dup pairs")
    wm2 = vcat.meta("ml.emb")["applied_version"]
    g = vcat.export_group_snapshot(spark, ["ml.emb", "ml.ivf"], wm2,
                                   os.path.join(root, "group_export"))
    print("consistent group export at watermark", g["watermark"], "->",
          {t: v["n_rows"] for t, v in g["tables"].items()})

    section("16. End-of-r4: config front door, secondary index, RAG serving")
    from change_data_capture_spark.derive import lookup_by_index, maintain_value_index
    from change_data_capture_spark.extensions.similarity import hybrid_retrieval
    from change_data_capture_spark.pipeline import run_pipeline
    from change_data_capture_spark.sources import mongodb as mgo

    # one config dict drives the document-store wire format end-to-end
    pcat = TableCatalog(os.path.join(root, "pipeline"))
    full = F.struct(F.col("c_custkey"), F.col("c_name"), F.col("c_acctbal"))
    msgs = mgo.encode_mongodb_json(
        cust.select("c_custkey", "c_name", "c_acctbal"), table="crm.customer",
        op="c", after=full, doc_id=F.col("c_custkey"), ts_ms=1,
    ).unionByName(
        mgo.encode_mongodb_json(  # $set/$unset partial updates, no post-image
            cust.filter(F.col("c_custkey") % 9 == 0), table="crm.customer", op="u",
            updated_fields=F.struct((F.col("c_acctbal") + 5).alias("c_acctbal")),
            removed_fields=F.array(F.lit("c_name")), doc_id=F.col("c_custkey"),
            ts_ms=2,
        )
    )
    cfg = {"source": {"format": "mongodb"},
           "tables": {"crm.customer": {
               "keys": ["c_custkey"],
               "schema": cust.select("c_custkey", "c_name", "c_acctbal").schema.json()}}}
    rep = run_pipeline(spark, msgs, cfg, pcat)
    print("config-driven mongodb pipeline:", pcat.read(spark, "crm.customer").count(),
          "rows; dead letters:", rep["dead_letters"].count())
    idx = maintain_value_index(spark, pcat, "crm.customer", ["c_name"], "crm.by_name")
    some = pcat.read(spark, "crm.customer").filter("c_name is not null").first()["c_name"]
    hit = lookup_by_index(spark, pcat, "crm.customer", "crm.by_name",
                          spark.createDataFrame([(some,)], "c_name string"))
    print("secondary index:", idx.count(), "values; point lookup", some, "->",
          hit.count(), "row (bucket-pruned twice)")
    rag = hybrid_retrieval(docs, emb2, query_ids=[0], k=5)
    print("hybrid RRF retrieval (lexical+dense):",
          [(r.doc_id, r.rnk) for r in rag.orderBy("rnk").collect()])
    from change_data_capture_spark.apply import auto_maintain
    print("auto_maintain plan:", auto_maintain(spark, pcat, dry_run=True))

    section("17. End-of-r5: in-band DDL, index auto-refresh, exact payload near-dup")
    import json as _json

    from change_data_capture_spark.apply import register_derived_index
    from change_data_capture_spark.changelog import dml_records
    from change_data_capture_spark.extensions import dedup, multimodal

    # one Maxwell batch evolves schema AND applies rows (DDL-before-DML)
    dcat = TableCatalog(os.path.join(root, "ddlpipe"))
    ddl_cfg = {"source": {"format": "maxwell", "apply_ddl": True},
               "tables": {"shop.orders": {"keys": ["id"]}}}
    create = _json.dumps(
        {"type": "table-create", "database": "shop", "table": "orders", "ts": 1,
         "def": {"database": "shop", "table": "orders",
                 "columns": [{"name": "id", "type": "bigint"},
                             {"name": "amount", "type": "double"}],
                 "primary-key": ["id"]}})
    ins = ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":1,'
           '"data":{"id":1,"amount":10.0}}')
    rep5 = run_pipeline(
        spark, spark.createDataFrame([(create,), (ins,)], "message string"),
        ddl_cfg, dcat)
    print("in-band DDL applied:", rep5["ddl_applied"],
          "rows:", dcat.read(spark, "shop.orders").count())

    # persisted MinHash index kept fresh by the maintenance loop
    icat = TableCatalog(os.path.join(root, "idx"))
    dsmall = docs.limit(120).select("doc_id", "text")
    apply_changelog(spark, snapshot_changelog(dsmall, "ml.docs", ["doc_id"]), icat)
    apply_changelog(spark, dedup.signature_changelog(dsmall, "ml.sigs", n=5, k=32), icat)
    register_derived_index(icat, "ml.sigs", base_table="ml.docs",
                           kind="minhash_sigs", params={"n": 5, "k": 32})
    newdoc = dsmall.limit(3).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text")
    apply_changelog(
        spark, dml_records(newdoc, "ml.docs", ["doc_id"], op="INSERT", version=2), icat)
    acts = auto_maintain(spark, icat)
    print("index auto-refresh:",
          [(a["table"], a.get("refresh")) for a in acts if a.get("refreshed")])

    # exact (recall-1) binary payload near-dup + fake-codec features
    payloads = dsmall.limit(40).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    tagged = payloads.limit(10).select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat("payload", F.lit(b"TOOLTAG!")).alias("payload"))
    nd = multimodal.payload_jaccard_duplicates(payloads.unionByName(tagged))
    print("exact payload near-dups (integer counts):", nd.count(), "pairs")
    png = payloads.limit(5).select(
        "doc_id",
        F.concat(multimodal.png_header_expr(F.lit(16), F.lit(12)), "payload")
        .alias("payload"))
    feats = multimodal.image_feature_extract(
        png, decode=multimodal.decode_image_pixels_fake)
    print("fake-codec pooled features:", feats.count(), "rows, dim",
          len(feats.first()["feature"]))

    print("\ndemo complete:", root)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
