#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate:
run graft.Verify output (parquet per query) against DuckDB executing
SparkEntry.oracleSql over the same testdata tables; compare values
exactly (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_mod

def duck_family(t) -> str:
    """Normalize a DuckDB column type to the family the driver's
    type-sensitive hash distinguishes. int8..int64 are one family (the
    driver passes Spark int32 vs DuckDB BIGINT, e.g. row_number cols);
    HUGEINT is NOT — pandas materializes it as float64/object, which is
    exactly the class of silent drift this check exists to catch."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if s in ("UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "uint"
    if s in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    if s == "VARCHAR":
        return "string"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s == "BLOB":
        return "binary"
    if s.endswith("[]") or s.startswith(("LIST", "STRUCT", "MAP")):
        return "nested"
    return s.lower()

def arrow_family(t) -> str:
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_unsigned_integer(t):
        return "uint"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return "nested"
    return str(t)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df, spark_types=None, duck_types=None):
    problems = []
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return [f"schema mismatch: spark={sc} duck={dc}"]
    # dtype-family equality: the driver's hash is type-sensitive — a
    # value-equal HUGEINT vs BIGINT column fails there while numpy
    # coercion hides it here. Check families BEFORE values.
    if spark_types and duck_types:
        for col in sc:
            sf, df_ = spark_types.get(col), duck_types.get(col)
            if sf is not None and df_ is not None and sf != df_:
                problems.append(f"col {col} DTYPE: spark={sf} duck={df_}")
        if problems:
            return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        av, bv = a[col].values, b[col].values
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
            av = np.asarray(av, dtype=np.float64); bv = np.asarray(bv, dtype=np.float64)
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(f"col {col}: {int(neq.sum())} diffs, first at row {i}: spark={av[i]!r} duck={bv[i]!r} delta={av[i]-bv[i]!r}")
        else:
            av = pd.Series(av).astype(object).where(pd.Series(av).notna(), None)
            bv = pd.Series(bv).astype(object).where(pd.Series(bv).notna(), None)
            neq = [x != y and not (x is None and y is None) for x, y in zip(av, bv)]
            if any(neq):
                i = neq.index(True)
                problems.append(f"col {col}: {sum(neq)} diffs, first at row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return problems

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Big-SF runs (sf1 KN-style bigram joins) can spill tens of GB;
    # keep DuckDB's temp on the big filesystem and bounded so a heavy
    # oracle degrades to slow instead of ENOSPC-failing the gate.
    tmp = os.environ.get("DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    lim = os.environ.get("DUCKDB_MEM")
    if lim:
        con.execute(f"SET memory_limit='{lim}'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        # partial datasets (e.g. the documents-only sf10 stretch) are fine:
        # a view over a missing file only matters if a checked query uses it
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pq}")
            fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            sk = pq_mod.read_schema(files[0])
            spark_types = {n: arrow_family(t) for n, t in zip(sk.names, sk.types)}
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            fail += 1
            continue
        try:
            rel = con.sql(sql)
            duck_types = {n: duck_family(t) for n, t in zip(rel.columns, rel.types)}
            duck_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        problems = compare(name, spark_df, duck_df, spark_types, duck_types)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            ok += 1
    # rows-only queries: just report presence
    for pq in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(pq)
        if os.path.isdir(pq) and name not in oracles and not (only and name not in only):
            files = glob.glob(os.path.join(pq, "*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
            print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{ok} passed, {fail} failed")
    sys.exit(1 if fail else 0)

main()
