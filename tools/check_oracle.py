"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at sf0.01 and compare to oracle_sql() via DuckDB —
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified with float
rounding at 1e-9 granularity).

Usage: python tools/check_oracle.py [query ...]
GEOSPARK_ORACLE_SF_DIR overrides the comparison scale (both engines
switch together — queries.py's IVF oracle already honors it).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("GEOSPARK_ORACLE_SF_DIR",
                        "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        df[c] = df[c].map(lambda v: "NULL" if v is None or
                          (isinstance(v, float) and np.isnan(v)) else str(v))
    rows = sorted(df.itertuples(index=False, name=None))
    import hashlib
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name:20s} rows={len(sdf):6d}  (rows-only check)")
                continue
            odf = con.execute(oracles[name]).df()
            sn, sc, sh = canon(sdf)
            on, oc, oh = canon(odf)
            ok = (sn == on) and (sc == oc) and (sh == oh)
            mark = "OK " if ok else "FAIL"
            print(f"{name:20s} {mark} spark={sn} oracle={on} "
                  f"cols={'=' if sc == oc else f'{sc} vs {oc}'} "
                  f"hash={'=' if sh == oh else 'DIFF'}")
            if not ok:
                n_fail += 1
                if sc == oc and sn and on:
                    merged = sdf.merge(odf, how="outer", indicator=True,
                                       on=list(sdf.columns))
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(6).to_string())
        except Exception as e:
            n_fail += 1
            print(f"{name:20s} ERROR {type(e).__name__}: {e}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
