"""Round-end discipline gate (judge r11 item 2: two consecutive rounds
ended with the final bench re-run uncommitted and its host-variance
evidence dropped). Run BEFORE the closing commit of every round:

    python tools/round_end.py

Fails (exit 1) when any of:
  1. the git tree is dirty (uncommitted/untracked files — the exact
     failure r10/r11 shipped);
  2. the newest BENCH_local_r*.json lacks BOTH `calibration` (the r12+
     first-class probe) and `env_note` (the r10/r11 manual evidence);
  3. the newest BENCH_local_r*.json is not tracked by git;
  4. (r13, judge r12 item 4) the committed record's query-row set !=
     the CURRENT bench tier (`bench.py BENCH_QUERIES`) — r12 shipped a
     108-row record against a 110-row tier because two rows were added
     after the final bench run; re-run bench.py and commit.

On failure: commit the bench record (and everything else) first, or
re-run bench.py if the record predates the final code state — then run
this gate again. It exists so "the official artifact carries the
variance evidence" is mechanical, not remembered.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench_local() -> str | None:
    paths = glob.glob(os.path.join(REPO, "BENCH_local_r*.json"))
    best, best_n = None, -1
    for p in paths:
        m = re.search(r"BENCH_local_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


def main() -> int:
    failures: list[str] = []

    dirty = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if dirty:
        failures.append(
            "git tree is DIRTY — commit before ending the round:\n"
            + dirty
        )

    bench = newest_bench_local()
    if bench is None:
        failures.append("no BENCH_local_r*.json record exists")
    else:
        rec = json.load(open(bench))
        if "calibration" not in rec and "env_note" not in rec:
            failures.append(
                f"{os.path.basename(bench)} carries neither "
                "`calibration` nor `env_note` — the host-variance "
                "evidence is missing (re-run bench.py; r12+ records "
                "it automatically)"
            )
        tracked = subprocess.run(
            ["git", "ls-files", "--error-unmatch", bench],
            cwd=REPO,
            capture_output=True,
        ).returncode
        if tracked != 0:
            failures.append(
                f"{os.path.basename(bench)} is NOT tracked by git — "
                "`git add` + commit it"
            )
        sys.path.insert(0, REPO)
        import bench as _bench  # noqa: E402

        tier = set(_bench.BENCH_QUERIES)
        have = set(rec.get("queries") or {})
        # the record also carries synthetic instrumentation rows
        # (lakehouse_*, mv_refresh_*) — extras are fine; what must
        # never happen again is a tier row with no timing (r12 shipped
        # 108 rows against a 110-row tier)
        missing = sorted(tier - have)
        if missing:
            failures.append(
                f"{os.path.basename(bench)} is missing bench-tier rows "
                f"{missing} — the record predates a bench.py/registry "
                "change; re-run bench.py and commit the new record"
            )

    if failures:
        for f in failures:
            print(f"ROUND-END FAIL: {f}", file=sys.stderr)
        return 1
    print(
        f"round-end OK: clean tree; {os.path.basename(bench)} committed "
        "with variance evidence"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
