#!/usr/bin/env python3
"""Local pre-flight of the driver's t2 oracle compare (SURVEY §5.1).

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]

Replicates the driver's check: for each key in oracle_sql.json, run the SQL
in DuckDB over views named after the fixture tables, load the Spark parquet
output, sort columns by name, and require EXACT equality (values and row
order). Never ship a query that hasn't passed here at sf0.01.
"""
import sys, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def strip_tz(df):
    """Normalize tz-AWARE datetime columns to UTC-naive before compare.

    The driver fixture's parquet carries naive timestamps
    (isAdjustedToUTC=false) while Spark-written fixtures (the sf1/sf10
    SynthScale decades) carry isAdjustedToUTC=true, which DuckDB surfaces
    as TIMESTAMPTZ — same UTC instants, different pandas dtype. Both
    engines run in UTC, so stripping the tz loses nothing and keeps the
    strict dtype check meaningful across both fixture generations.
    """
    for c in df.columns:
        if getattr(df[c].dtype, "tz", None) is not None:
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        # Guard (r16): the PHYSICAL spark parquet must not carry DECIMAL
        # columns. fetchdf coerces DECIMAL->float64, which masked a real
        # driver hash-mismatch in r15 (driver loads the parquet natively and
        # hashes Decimal('1.23') != 1.23). Emit policy: money leaves as
        # double (Det.emit) before the final projection.
        dec = [(r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out}/{name}/*.parquet')"
        ).fetchall() if "DECIMAL" in str(r[1]).upper()]
        if dec:
            print(f"FAIL {name}: DECIMAL column(s) in spark output {dec} — "
                  f"cast to double (Det.emit) before returning")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sdf = strip_tz(sdf[sorted(sdf.columns)])
        ddf = strip_tz(ddf[sorted(ddf.columns)])
        errs = []
        if list(sdf.columns) != list(ddf.columns):
            errs.append(f"columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        elif len(sdf) != len(ddf):
            errs.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        else:
            for c in sdf.columns:
                a, b = sdf[c].tolist(), ddf[c].tolist()
                for i, (x, y) in enumerate(zip(a, b)):
                    same = (x == y) or (x is None and y is None)
                    try:
                        if not same and isinstance(x, float) and isinstance(y, float):
                            same = (math.isnan(x) and math.isnan(y))
                    except Exception:
                        pass
                    # pandas NaT/NaN cross-type nulls
                    if not same:
                        try:
                            import pandas as pd
                            same = pd.isna(x) and pd.isna(y)
                        except Exception:
                            pass
                    if not same:
                        errs.append(f"col {c} row {i}: spark={x!r} duck={y!r}")
                        if len(errs) > 5:
                            break
                if len(errs) > 5:
                    break
            # dtype check — intentionally STRICT (counts as FAIL): aligned
            # dtypes keep the driver's value-hash comparison trivially safe
            for c in sdf.columns:
                if str(sdf[c].dtype) != str(ddf[c].dtype):
                    errs.append(f"DTYPE col {c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
        if errs:
            print(f"FAIL {name}:")
            for e in errs[:8]:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
