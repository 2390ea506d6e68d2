"""Repeated-substring runs: every reported run must be a real, equal,
MAXIMAL token span in both documents — verified by re-extracting the
raw text slices in Python (independent of the gram/island machinery)."""

from deltacat_spark.workloads.base import load
from deltacat_spark.workloads.positional import (
    _MIN_RUN,
    repeated_substring_runs,
)

SF = "/root/testdata/sf0.001"


def test_runs_are_equal_and_maximal_spans(spark):
    runs = repeated_substring_runs(spark, SF).collect()
    assert runs, "expected at least one repeated run"
    texts = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in runs:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        n = r["n_tokens"]
        assert n >= _MIN_RUN
        sa, sb = r["start_a"] - 1, r["start_b"] - 1  # 1-based positions
        assert a[sa : sa + n] == b[sb : sb + n], (r, "span mismatch")
        # maximal: extending either end must break the match (or run
        # off a document boundary)
        if sa > 0 and sb > 0:
            assert a[sa - 1] != b[sb - 1], (r, "extendable left")
        if sa + n < len(a) and sb + n < len(b):
            assert a[sa + n] != b[sb + n], (r, "extendable right")


def test_runs_unique_per_diagonal(spark):
    rows = repeated_substring_runs(spark, SF).collect()
    seen = set()
    for r in rows:
        key = (
            r["doc_a"],
            r["doc_b"],
            r["start_a"] - r["start_b"],
            r["start_a"],
        )
        assert key not in seen, "duplicate/overlapping run on a diagonal"
        seen.add(key)
