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


def test_winnow_guarantee_and_no_false_pairs(spark):
    """Winnowing's core guarantee (Schleimer et al. §2): two documents
    sharing a token run of at least K + W - 1 tokens MUST share a
    fingerprint — verified with a Python reimplementation independent
    of the Spark array machinery, plus pairwise counts cross-checked
    exactly."""
    import hashlib

    from deltacat_spark.workloads.positional import (
        _WN_DF_CAP,
        _WN_K,
        _WN_MIN_SHARED,
        _WN_W,
        winnow_fingerprint_pairs,
    )

    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_fingerprint_pairs(spark, SF).collect()
    }
    texts = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def prints(ws):
        if len(ws) < _WN_K + _WN_W - 1:
            return set()
        ghs = [
            hashlib.md5(
                " ".join(ws[j : j + _WN_K]).encode()
            ).hexdigest()
            for j in range(len(ws) - _WN_K + 1)
        ]
        return {
            min(ghs[j : j + _WN_W])
            for j in range(len(ghs) - _WN_W + 1)
        }

    fp = {d: prints(ws) for d, ws in texts.items()}
    df = {}
    for d, s in fp.items():
        for p in s:
            df[p] = df.get(p, 0) + 1
    live = {p for p, n in df.items() if 2 <= n <= _WN_DF_CAP}
    expected = {}
    docs = sorted(fp)
    for i, da in enumerate(docs):
        sa = fp[da] & live
        if not sa:
            continue
        for db in docs[i + 1 :]:
            n = len(sa & fp[db])
            if n >= _WN_MIN_SHARED:
                expected[(da, db)] = n
    assert got == expected
    assert got, "fixture should contain near-dup pairs"


def test_cdc_chunks_partition_and_python_parity(spark):
    """CDC chunking invariants vs an independent Python
    reimplementation: identical per-source counts, and for each doc the
    chunks PARTITION the token list (concatenation restores the doc)."""
    import hashlib

    from deltacat_spark.workloads.positional import (
        _CDC_B,
        _CDC_D,
        cdc_chunk_dedup,
    )

    got = {
        r.source: (r.n_chunks, r.n_distinct, r.dup_x10000)
        for r in cdc_chunk_dedup(spark, SF).collect()
    }

    def doc_chunks(ws):
        n = len(ws)
        if n < _CDC_B + 1:
            return None
        cuts = [
            j
            for j in range(_CDC_B, n)
            if (
                "0123456789abcdef".index(
                    hashlib.md5(
                        " ".join(ws[j - _CDC_B : j]).encode()
                    ).hexdigest()[31]
                )
            )
            % _CDC_D
            == 0
        ]
        bnds = [0] + cuts + [n]
        spans = [
            (lo, hi) for lo, hi in zip(bnds, bnds[1:]) if hi > lo
        ]
        # partition property: spans tile [0, n) exactly
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
            assert h1 == l2
        return [
            hashlib.md5(" ".join(ws[lo:hi]).encode()).hexdigest()
            for lo, hi in spans
        ]

    per_source = {}
    for r in (
        load(spark, SF, "documents").select("source", "text").collect()
    ):
        ws = [w for w in r["text"].split(" ") if w]
        ch = doc_chunks(ws)
        if ch is None:
            continue
        per_source.setdefault(r["source"], []).append(ch)
    expected = {}
    for src, lists in per_source.items():
        flat = [c for l in lists for c in l]
        n, d = len(flat), len(set(flat))
        expected[src] = (n, d, (n - d) * 10000 // n)
    assert got == expected
    assert any(v[2] > 0 for v in got.values()), "fixture has chunk dups"
