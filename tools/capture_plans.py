"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt (judge deliverable: before/after plan
evidence for optimization rounds).

Usage: python tools/capture_plans.py <tag> <suffix> <query> [<query>...]
e.g.   python tools/capture_plans.py r15 before hudi_mor_snapshot
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from deltacat_spark.session import build_session
    from deltacat_spark.workloads import REGISTRY

    spark = build_session(f"capture-plans-{tag}")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') of the returned "
                f"DataFrame ({suffix}, sf_dir={sf_dir})\n"
                f"# pipeline build took {time.time() - t0:.2f}s "
                "(composite rows run their write phases during build)\n\n"
            )
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
