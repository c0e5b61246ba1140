"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage:
    python tools/check.py [sf_dir] [query ...]

For each declared query: run the Spark DataFrame and the oracle SQL via
DuckDB on the same parquet, compare row count, sorted column names, and
an order-insensitive multiset of normalized row values. Queries without
an oracle get a rows-only check (>=0 rows, stable schema).
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

sys.path.insert(0, ".")


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        return f"flt:{v!r}"
    if isinstance(v, bool):
        return f"bool:{v}"
    return f"{type(v).__name__}:{v}"


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in order) for r in rows)


# DuckDB types that land as int64 in a pandas conversion; everything
# else numeric (HUGEINT, DECIMAL, DOUBLE) becomes float64/object there
_DUCK_INT = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
_SPARK_INT = {"bigint", "int", "smallint", "tinyint"}


def dtype_asymmetries(spark_dtypes: dict, con, sql: str) -> list[str]:
    """Flag column-type pairs that hash-match HERE but diverge in a
    pandas-based compare (the external driver's): DuckDB SUM(BIGINT)
    yields HUGEINT -> float64 while Spark stays int64, and a Spark
    DECIMAL output stays Decimal while DuckDB's becomes float64. Both
    sides fetch as plain Python ints/Decimals in this harness, so the
    value multiset can't catch it — the type plan can (DESCRIBE is
    planning-only, no second execution)."""
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:
        return []
    od = {r[0]: str(r[1]).upper() for r in desc}
    out = []
    for c, st in spark_dtypes.items():
        o = od.get(c)
        if o is None:
            continue
        if st in _SPARK_INT and o not in _DUCK_INT:
            out.append(f"driver-dtype: {c} spark {st} vs oracle {o} "
                       f"(pandas float64) — CAST the oracle to BIGINT")
        elif st in ("double", "float") and o in _DUCK_INT:
            out.append(f"driver-dtype: {c} spark {st} vs oracle {o} "
                       f"(pandas int64) — CAST one side")
        elif st.startswith("decimal"):
            out.append(f"driver-dtype: {c} spark {st} stays Decimal in "
                       f"pandas while DuckDB's becomes float64 — emit "
                       f"DOUBLE on both sides")
    return out


def main():
    import duckdb
    from tb_lakehouse_enhanced_spark.plans.queries import ORACLE_SQL, SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(SPARK_QUERIES)

    spark = get_session()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed = failed = 0
    for name in names:
        fn = SPARK_QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failed += 1
            continue
        if name not in ORACLE_SQL:
            print(f"ok    {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s) cols={scols}")
            passed += 1
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            failed += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        problems += dtype_asymmetries(dict(sdf.dtypes), con,
                                      ORACLE_SQL[name])
        if not problems:
            sm, om = row_multiset(scols, [tuple(r) for r in srows]), row_multiset(ocols, orows)
            if sm != om:
                diffs = [(a, b) for a, b in zip(sm, om) if a != b]
                problems.append(f"values: {len(diffs)} differing rows; first: "
                                f"spark={diffs[0][0]} oracle={diffs[0][1]}" if diffs
                                else "values: multiset mismatch (ordering)")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failed += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
