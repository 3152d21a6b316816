"""Driver-mirror correctness sweep: every catalog entry vs its DuckDB
oracle at the DRIVER'S scale factor (sf0.01), not the test suite's
sf0.001 — catches anything scale-sensitive (DF caps, bucket skips,
rounding at bigger aggregates) before the round's CORRECTNESS_r{N}
gate does. Prints one status line per entry and a final summary;
exit code 1 on any mismatch.

Usage: python BENCH/driver_mirror.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from etl_spark.session import get_session  # noqa: E402
from tests.compare import duckdb_connection, run_and_compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry

    spark = get_session()
    q = entry.queries()
    o = entry.oracle_sql()
    con = duckdb_connection(sf_dir)
    failures = []
    for name, fn in q.items():
        t0 = time.monotonic()
        try:
            if name in o:
                n = run_and_compare(spark, con, fn, o[name], sf_dir, name)
                status = f"ok rows={n}"
            else:
                n = fn(spark, sf_dir).count()
                status = f"no_oracle rows={n}"
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            status = f"FAIL {type(e).__name__}: {e}"
        print(f"{name:28s} {time.monotonic() - t0:6.1f}s  {status}", flush=True)
    con.close()
    print(f"\n{len(q) - len(failures)}/{len(q)} green at {sf_dir}")
    if failures:
        print("failed:", failures)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
