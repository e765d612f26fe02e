#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [key ...]

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (views over the sfDir
parquet tables), sorts columns by name, and compares row-by-row.
"""
import json, sys, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact — determinism is the contract
    return str(a) == str(b)


# Driver-hash dtype sensitivity model (r7 timestamp era, r9 x57 HUGEINT):
# int32<->int64 normalizes, but int128 (DuckDB HUGEINT/UHUGEINT) and
# cross-class mismatches (int vs float vs decimal vs string) do NOT.
# Map both engines' dtypes to a comparison class and require equality.
_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "int128", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "bytes",
}


def _duck_class(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]"):
        return "list"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return _CLASS.get(t, t.lower())


def _arrow_class(t) -> str:
    """Comparison class from the Spark result's REAL parquet schema (pyarrow
    type) — pandas dtypes lie (nullable int64 parquet reads as float64)."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_decimal(t):
        return "decimal"
    return "obj"  # lists, structs — value compare covers them


def _spark_schema_classes(result_dir: str):
    """colname -> comparison class from the Spark result parquet schema."""
    import glob
    import pyarrow.parquet as pq
    files = glob.glob(f"{result_dir}/*.parquet")
    if not files:
        return {}
    sch = pq.read_schema(files[0])
    return {f.name: _arrow_class(f.type) for f in sch}


def dtype_parity(con, name, sql, spark_classes):
    """Return a list of dtype-parity violations for one oracle key.

    Two checks: (1) the oracle must not produce HUGEINT/UHUGEINT — the
    driver's value-hash is dtype-sensitive at the int128 boundary; (2) the
    oracle column's comparison class must match the Spark parquet result's
    (int32<->int64 is fine; int vs float/decimal/str is not). List/struct
    columns are skipped — the value compare covers them.
    """
    bad = []
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception as e:
        return [f"DESCRIBE failed: {e}"]
    for cname, ctype, *_ in desc:
        dclass = _duck_class(ctype)
        if dclass == "int128":
            bad.append(f"col {cname}: oracle dtype {ctype} (int128 — "
                       f"driver hash diverges; CAST to BIGINT)")
            continue
        sclass = spark_classes.get(cname)
        if sclass is None:
            continue  # column-set mismatch is reported by the value compare
        if sclass == "obj" or dclass in ("list", "nested"):
            continue
        if dclass == "decimal" and sclass in ("int", "float"):
            bad.append(f"col {cname}: oracle DECIMAL vs spark {sclass} — "
                       f"CAST the oracle to match")
            continue
        if dclass in ("int", "float", "bool", "ts", "str", "date", "bytes") \
                and sclass != dclass:
            bad.append(f"col {cname}: oracle {ctype}({dclass}) vs "
                       f"spark parquet {sclass}")
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no result parquet ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not cells_equal(g[c].iloc[i], w[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], w[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got={bad[2]!r} want={bad[3]!r}")
            n_fail += 1
            continue
        dt_bad = dtype_parity(con, name, sql,
                              _spark_schema_classes(f"{out_dir}/{name}"))
        if dt_bad:
            for m in dt_bad:
                print(f"FAIL {name}: dtype-parity: {m}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
