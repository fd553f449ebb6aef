"""Full driver-style oracle pass at sf0.01 (what the driver grades).
Prints one line per query; summary at the end."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from meerkat_spark import suite
from meerkat_spark.session import get_spark
from tests.oracle_harness import compare, register_views

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("oracle_check", cpus=16)
    con = duckdb.connect()
    register_views(con, SF)
    qs = suite.queries()
    bad = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, SF)
            if name in suite.ORACLE:
                problems = compare(df, con, suite.ORACLE[name], name)
            else:
                df.count()
                problems = []
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        status = "OK" if not problems else "FAIL"
        print(f"{status:4s} {name:28s} {time.time()-t0:6.1f}s", flush=True)
        if problems:
            bad.append(problems)
            for p in problems[:4]:
                print("     ", p[:300], flush=True)
    print(f"\n{len(qs) - len(bad)}/{len(qs)} queries match at {SF}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
