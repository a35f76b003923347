"""Environment doctor — the engine's analogue of the reference's
`scripts/verify.py:17-112` (config loads, store reachable, topics exist,
deps import). Here the "infrastructure" is a SparkSession, the testdata
parquet, a writable checkpoint dir, and the DuckDB oracle, so those are
the checks. One command, exit 0 iff every check passes:

    python tools/verify_env.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_checks(sf_dir: str) -> list[tuple[str, bool, str]]:
    """[(check name, ok, detail)] — importable for pytest."""
    results: list[tuple[str, bool, str]] = []

    # 1. core deps import
    try:
        import duckdb
        import pandas
        import pyarrow
        import pyspark

        results.append(
            (
                "deps",
                True,
                f"pyspark {pyspark.__version__}, pyarrow {pyarrow.__version__}, "
                f"pandas {pandas.__version__}, duckdb {duckdb.__version__}",
            )
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        results.append(("deps", False, str(e)))
        return results

    # 2. session builds (JVM up, UTC timezone pinned)
    try:
        from data_pipeline_for_autonomous_vehicles_spark.session import get_spark

        spark = get_spark("verify_env")
        tz = spark.conf.get("spark.sql.session.timeZone")
        results.append(("session", tz == "UTC", f"local[*] up, session tz={tz}"))
    except Exception as e:  # pragma: no cover
        results.append(("session", False, str(e)))
        return results

    # 3. testdata present and readable (all ten tables at the given SF)
    missing = [t for t in TABLES if not os.path.exists(f"{sf_dir}/{t}.parquet")]
    if missing:
        results.append(("testdata", False, f"{sf_dir} missing: {missing}"))
    else:
        try:
            from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table

            n = load_table(spark, sf_dir, "region").count()
            results.append(("testdata", n > 0, f"{sf_dir}: 10 tables, region={n} rows"))
        except Exception as e:  # pragma: no cover
            results.append(("testdata", False, str(e)))

    # 4. checkpoint/scratch dir writable (streaming + exactly-once sinks)
    try:
        with tempfile.TemporaryDirectory(prefix="verify_env_") as d:
            probe = os.path.join(d, "probe")
            spark.range(1).write.mode("overwrite").parquet(probe)
            ok = spark.read.parquet(probe).count() == 1
        results.append(("scratch", ok, "parquet write+readback in tempdir"))
    except Exception as e:  # pragma: no cover
        results.append(("scratch", False, str(e)))

    # 5. DuckDB oracle runs against the same parquet
    try:
        con = duckdb.connect()
        n = con.execute(f"SELECT COUNT(*) FROM '{sf_dir}/region.parquet'").fetchone()[0]
        results.append(("oracle", n > 0, f"duckdb reads region.parquet ({n} rows)"))
    except Exception as e:  # pragma: no cover
        results.append(("oracle", False, str(e)))

    # 6. driver contract importable and complete
    try:
        import __spark_entry__ as entry

        qs, oracles = entry.queries(), entry.oracle_sql()
        extra = set(oracles) - set(qs)
        results.append(
            (
                "contract",
                len(qs) > 0 and not extra,
                f"{len(qs)} queries, {len(oracles)} oracles"
                + (f", {len(extra)} orphan oracles" if extra else ""),
            )
        )
    except Exception as e:  # pragma: no cover
        results.append(("contract", False, str(e)))

    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    results = run_checks(sf_dir)
    for name, ok, detail in results:
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}")
    bad = [n for n, ok, _ in results if not ok]
    print(f"\n{len(results) - len(bad)}/{len(results)} checks passed"
          + (f" — failing: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
