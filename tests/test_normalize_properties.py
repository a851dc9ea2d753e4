"""Property-based check of the normalizer's invariants (hypothesis).

The reference's Normalizer semantics (Normalizer.java:59-237) hold for
EVERY raw-op shape, not just the golden fixtures: hypothesis generates
arbitrary interleavings of insert/update/delete images (including
missing images, extra columns, PK rewrites) and asserts the four
invariants the golden tests sample by hand. Each example is one Spark
job over a small generated frame, so example count is kept low and the
deadline disabled (Spark actions are seconds, not milliseconds).
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from change_data_capture_spark.normalize import RAW_OP_DDL, normalize_raw_ops

COLS = ["a", "b", "c"]

_val = st.one_of(st.none(), st.text(alphabet="xyz0", min_size=0, max_size=3))


def _image(pk):
    return st.fixed_dictionaries(
        {"id": st.sampled_from([pk, str(int(pk) + 1)])},
        optional={c: _val for c in COLS},
    )


@st.composite
def raw_op(draw):
    pk = draw(st.sampled_from(["1", "2", "3"]))
    op = draw(st.sampled_from(["I", "U", "D"]))
    before = draw(st.none() | _image(pk)) if op in ("U", "D") else None
    after = draw(st.none() | _image(pk)) if op in ("I", "U") else None
    if op == "U" and before is None and after is None:
        after = {"id": pk}
    if op == "D" and before is None:
        before = {"id": pk}
    if op == "I" and after is None:
        after = {"id": pk}
    version = draw(st.integers(min_value=1, max_value=9))
    return ("t.x", op, ["id"], before, after, None, version, version * 10)


@given(st.lists(raw_op(), min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_normalizer_invariants(spark, ops):
    raw = spark.createDataFrame(ops, RAW_OP_DDL)
    out = normalize_raw_ops(raw).select("dml.*").collect()

    split_expected = 0
    plain_expected = 0
    for _, op, _, before, after, _, _, _ in ops:
        pk_changed = (
            op == "U"
            and before is not None
            and after is not None
            and before["id"] != after["id"]
        )
        split_expected += 2 if pk_changed else 0
        plain_expected += 0 if pk_changed else 1

    # 1: row budget — every input op yields exactly 1 record, except a
    # PK-changing update which yields DELETE+INSERT
    assert len(out) == split_expected + plain_expected

    for r in out:
        # 2: op codes parse to the full names, never pass through raw
        assert r["op_type"] in ("INSERT", "UPDATE", "DELETE")
        # 3: every record carries a non-null values map with the PK set
        assert r["rows_values"] is not None and r["rows_values"].get("id")

    # 4: a PK-changing update's two records target the two distinct keys
    by_version = {}
    for r in out:
        by_version.setdefault(r["change_tracking_version"], []).append(r)
    for (_, op, _, before, after, _, version, _) in ops:
        if (
            op == "U"
            and before is not None
            and after is not None
            and before["id"] != after["id"]
        ):
            recs = [
                r
                for r in by_version[version]
                if r["op_type"] in ("DELETE", "INSERT")
            ]
            keys = {(r["op_type"], r["rows_values"]["id"]) for r in recs}
            assert ("DELETE", before["id"]) in keys
            assert ("INSERT", after["id"]) in keys


@given(st.lists(raw_op(), min_size=1, max_size=8))
@settings(max_examples=6, deadline=None)
def test_update_merge_after_wins_per_column(spark, ops):
    """Non-split UPDATEs merge before+after per column with a key
    PRESENT in the after map winning EVEN WHEN ITS VALUE IS NULL — an
    explicit SET NULL must reach the replica (r6 review; the map
    encoding of the reference's per-column _isMissing flags,
    Normalizer.java:176-186, where 'missing' is map-key ABSENCE, not a
    null value). Only keys absent from the after map fall back to the
    before image. With only one image present, that image passes
    through as-is — nulls retained, since there is nothing to fall
    back to."""
    raw = spark.createDataFrame(ops, RAW_OP_DDL)
    out = normalize_raw_ops(raw).select("dml.*").collect()
    # versions are NOT unique across generated ops, so group the UPDATE
    # records by (version, record PK) and check each op's expected merge
    # is present in its group — one record per op is already asserted by
    # the row-budget invariant above.
    updates: dict[tuple, list] = {}
    for r in out:
        if r["op_type"] == "UPDATE":
            key = (r["change_tracking_version"], r["rows_values"]["id"])
            updates.setdefault(key, []).append(dict(r["rows_values"]))
    for (_, op, _, before, after, _, version, _) in ops:
        if op != "U":
            continue
        pk_changed = (
            before is not None and after is not None and before["id"] != after["id"]
        )
        if pk_changed:  # split updates emit DELETE+INSERT, no UPDATE record
            continue
        if before is None:
            expect = dict(after)
        elif after is None:
            expect = dict(before)
        else:
            expect = {
                k: (after[k] if k in after else before.get(k))
                for k in {*before, *after}
            }
        group = updates.get((version, expect["id"]), [])
        assert expect in group, f"v{version}: {expect} not in {group}"


_patch_val = st.one_of(st.none(), st.sampled_from(["1", "2.5", "x", ""]))


@st.composite
def patch_row(draw):
    key = draw(st.integers(min_value=1, max_value=4))
    version = draw(st.integers(min_value=1, max_value=8))
    cols = draw(st.sets(st.sampled_from(["name", "amount"]), min_size=1, max_size=2))
    patch = {c: draw(_patch_val) for c in cols}
    # keep castability: amount patches stay numeric-or-null so the
    # typed merge is the thing under test, not DLQ routing
    if "amount" in patch and patch["amount"] in ("x", ""):
        patch["amount"] = None
    return (key, version, patch)


@settings(max_examples=12, deadline=None)
@given(st.lists(patch_row(), min_size=0, max_size=10))
def test_patch_updates_composes_over_version_splits(spark, patches):
    """Algebra of compressed updates: splitting a patch stream at any
    version boundary and applying the halves in order equals applying
    the whole stream at once — the property that makes per-batch patch
    application equivalent to a full-history replay. (Split at a
    VERSION boundary: last-writer-wins is defined per version, so only
    version-ordered splits preserve the winner.)"""
    from change_data_capture_spark.normalize import patch_updates

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, amount double",
    )
    pdf = spark.createDataFrame(patches, "id long, version int, patch map<string,string>") \
        if patches else spark.createDataFrame([], "id long, version int, patch map<string,string>")
    whole = sorted(map(tuple, patch_updates(base, pdf, ["id"]).collect()))
    lo, hi = pdf.filter("version <= 4"), pdf.filter("version > 4")
    stepped = sorted(
        map(tuple, patch_updates(patch_updates(base, lo, ["id"]), hi, ["id"]).collect())
    )
    assert whole == stepped
