"""Property-based check of the exact prefix-filtered payload
near-dup join (multimodal.payload_jaccard_duplicates).

The AllPairs/PPJoin prefix theorem guarantees recall 1 at any
threshold; hypothesis generates small corpora biased toward
near-duplicates (shared blocks with random edits/tags) and asserts
the Spark output EQUALS a brute-force Python computation of the same
shingle definition — pairs, intersections, and unions, exactly.
Each example is a Spark job, so example count stays low and the
deadline is disabled (Spark actions are seconds, not milliseconds)."""

import itertools

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from change_data_capture_spark.extensions import multimodal

N, STRIDE = 8, 4

_block = st.text(alphabet="abcd ", min_size=30, max_size=80)
_tag = st.text(alphabet="XYZ!", min_size=0, max_size=12)


@st.composite
def _corpus(draw):
    blocks = draw(st.lists(_block, min_size=1, max_size=3))
    docs = {}
    next_id = 1
    for b in blocks:
        # each block spawns 1-3 variants: identical, tagged, halved
        for variant in draw(
            st.lists(st.sampled_from(["same", "tag", "half"]), min_size=1, max_size=3)
        ):
            text = b if variant == "same" else (
                b + draw(_tag) if variant == "tag" else b[: max(len(b) // 2, 1)]
            )
            docs[next_id] = text
            next_id += 1
    return docs


def _shingles(payload: bytes):
    top = max(len(payload) - (N - 1), 1)
    return {payload[p : p + N] for p in range(0, top, STRIDE)}


@settings(max_examples=12, deadline=None)
@given(_corpus(), st.sampled_from([(1, 2), (4, 5), (1, 5)]))
def test_prefix_filter_join_equals_bruteforce(spark, docs, threshold):
    num, den = threshold
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    got = {
        (r.a_id, r.b_id): (r.inter_shingles, r.union_shingles)
        for r in multimodal.payload_jaccard_duplicates(
            df, n=N, stride=STRIDE, threshold_num=num, threshold_den=den
        ).collect()
    }
    want = {}
    sets = {i: _shingles(t.encode("utf-8")) for i, t in docs.items()}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if den * inter >= num * uni:
            want[(a, b)] = (inter, uni)
    assert got == want
