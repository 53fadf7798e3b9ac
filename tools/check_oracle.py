#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt -batch "runMain graft.Verify <sfDir> <outDir>"`), then
`python3 tools/check_oracle.py <sfDir> <outDir>`.

For every query in <outDir>/oracle_sql.json: run the SQL in DuckDB over
views named after the parquet tables in <sfDir>, load the Spark parquet
result, sort columns by name, sort rows, and compare row counts, schemas
(coarse dtype classes) and exact values.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so list/float representations compare stably.
    # Values are TYPE-TAGGED: the driver hashes stringified values, so an
    # int64 Spark column vs a float64/Decimal oracle column (e.g. DuckDB
    # sum() returning HUGEINT -> float in fetchdf) must FAIL here even
    # though Python's `1000000 == 1000000.0` — that laxness is exactly how
    # the q53/q54 r4 driver-only hash failures slipped past this replica.
    def cell(v):
        if isinstance(v, (list, tuple)):
            return tuple(cell(x) for x in v)
        if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            return cell(v.tolist())
        if v is None or v != v:  # None/NaN: normalize for sort comparability
            return None
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, float):
            return ("f", v)
        return v
    rows = sorted((tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)),
                  key=lambda r: tuple((v is None, str(type(v)), v) for v in r))
    return df, rows


def main(sf_dir: str, out_dir: str) -> int:
    print(f"duckdb={duckdb.__version__} pandas={pd.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        sdf = pd.read_parquet(spark_path)
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        sdf, srows = canon(sdf)
        odf, orows = canon(odf)
        rows_ok = len(srows) == len(orows)
        cols_ok = list(sdf.columns) == list(odf.columns)
        vals_ok = srows == orows
        if rows_ok and cols_ok and vals_ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures += 1
            print(f"{name}: MISMATCH rows={len(srows)}/{len(orows)} cols_ok={cols_ok} "
                  f"spark_cols={list(sdf.columns)} oracle_cols={list(odf.columns)}")
            if rows_ok and cols_ok:
                for i, (a, b) in enumerate(zip(srows, orows)):
                    if a != b:
                        print(f"  first diff at sorted row {i}: spark={a} oracle={b}")
                        break
            else:
                only_s = [r for r in srows if r not in orows][:3]
                only_o = [r for r in orows if r not in srows][:3]
                print(f"  spark-only: {only_s}")
                print(f"  oracle-only: {only_o}")
    n = len(oracle)
    print(f"== {n - failures}/{n} oracle queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
