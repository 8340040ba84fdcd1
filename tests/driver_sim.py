"""Standalone driver-harness simulation (see .claude/skills/verify/SKILL.md).

Loads /root/repo/__spark_entry__.py by path exactly like the driver, runs the
entry() smoke check, then every queries()[name] at sf0.01 against its
oracle_sql()[name] via DuckDB. Exits non-zero on any mismatch.

Not a pytest file — run directly: ``python tests/driver_sim.py``.
"""

from __future__ import annotations

import datetime as dt
import importlib.util
import sys

ENTRY = "/root/repo/__spark_entry__.py"
# override with SIM_SF_DIR to check determinism at other scales
import os
SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


_DUCK_TYPE_MAP = {
    "varchar": "string",
    "integer": "int",
    "float[]": "array<float>",
    "double[]": "array<double>",
    "integer[]": "array<int>",
    "time stamp": "timestamp",
}


def _canon_duck_type(t: str) -> str:
    t = str(t).lower()
    return _DUCK_TYPE_MAP.get(t, t)


def types_match(spark_df, duck_cols_types: list[tuple[str, str]]) -> list[str]:
    """Compare schemas by (name -> canonical type); returns mismatch notes."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    notes = []
    for name, dt in duck_cols_types:
        st = spark_types.get(name)
        ct = _canon_duck_type(dt)
        if st is not None and st != ct:
            notes.append(f"{name}: spark={st} duck={ct}")
    return notes


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = mod.entry(spark)
    n = len(df.collect())
    print(f"SMOKE entry: rows={n} schema={[f.name for f in df.schema.fields]}")
    ok = n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # SIM_SKIP: comma-separated query names to leave out — used for the
    # cross-scale determinism run at sf0.1+, where the deliberately-O(n^2)
    # exactness-baseline ORACLES (DuckDB list-lambda cross joins) take tens
    # of minutes; the Spark side is checked at sf0.01 by the default run.
    skip = {s for s in os.environ.get("SIM_SKIP", "").split(",") if s}
    # SIM_ONLY: comma-separated allowlist for fast iteration on new queries
    # (entry smoke still runs; the full run stays the pre-commit gate).
    only = {s for s in os.environ.get("SIM_ONLY", "").split(",") if s}
    qs, osql = mod.queries(), mod.oracle_sql()
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name in skip:
            print(f"{name}: SKIPPED (SIM_SKIP)")
            continue
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name}: rows-only check rows={len(srows)}")
            continue
        rel = con.sql(osql[name])
        dcols = list(rel.columns)
        dtypes = [str(t) for t in rel.types]
        drows = rel.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        s = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        d = sorted(tuple(canon(r[i]) for i in do) for r in drows)
        type_notes = types_match(sdf, list(zip(dcols, dtypes)))
        match = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and s == d
            and not type_notes
        )
        ok &= match
        print(
            f"{name}: rows {len(srows)}=={len(drows)} "
            f"cols {sorted(scols) == sorted(dcols)} MATCH: {match}"
            + (f" TYPES: {type_notes}" if type_notes else "")
        )
        if not match and s != d:
            for a, b in list(zip(s, d))[:3]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
