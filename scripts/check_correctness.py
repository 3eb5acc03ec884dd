"""Local replica of the driver's correctness gate: run each queries() entry
in Spark and its oracle_sql() in DuckDB over the same sf dir, compare
row-count + column names + order-insensitive values.

Usage:
    PYTHONPATH=/root/repo python scripts/check_correctness.py --sf sf0.01 [-q name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from azure_workflow_for_kml_satellite_spark import get_spark  # noqa: E402

TESTDATA = "/root/testdata"
VIEWS = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows: list[tuple], ndigits: int = 9) -> list[tuple]:
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, ndigits))
            elif isinstance(v, bool):
                vals.append(bool(v))
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("-q", "--query", action="append")
    ap.add_argument("--exact", action="store_true", help="no float rounding before compare")
    args = ap.parse_args()
    sf_dir = f"{TESTDATA}/{args.sf}"

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for v in VIEWS:
        p = f"{sf_dir}/{v}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or list(qs)
    ndigits = 17 if args.exact else 9
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: ROWS-ONLY {len(srows)} rows ({time.time()-t0:.1f}s)")
                continue
            od = con.sql(oracles[name])
            ocols = [c.lower() for c in od.columns]
            # Type-strict guard replicating the driver's typed hasher: DuckDB
            # HUGEINT (from sum(CASE...)/sum() OVER) vs Spark BIGINT passes a
            # python-int value compare but fails the driver's hash. Map both
            # sides to a canonical name and require equality for scalar types.
            _DUCK2CANON = {
                "BIGINT": "long", "INTEGER": "int", "SMALLINT": "int",
                "TINYINT": "int", "HUGEINT": "HUGEINT!", "UBIGINT": "ulong",
                "DOUBLE": "double", "FLOAT": "float", "VARCHAR": "string",
                "DATE": "date", "BOOLEAN": "boolean",
            }
            _SPARK2CANON = {
                "bigint": "long", "int": "int", "smallint": "int",
                "tinyint": "int", "double": "double", "float": "float",
                "string": "string", "date": "date", "boolean": "boolean",
            }
            sdtypes = dict(sdf.dtypes)
            for cname, dtyp in zip(od.columns, od.types):
                dcanon = _DUCK2CANON.get(str(dtyp).upper())
                scanon = _SPARK2CANON.get(sdtypes.get(cname, sdtypes.get(cname.lower(), "")))
                if dcanon and scanon and dcanon != scanon:
                    print(f"{name}: TYPE-MISMATCH col {cname}: duckdb {dtyp} vs spark "
                          f"{sdtypes.get(cname)}")
                    failed.append(name)
                elif dcanon == "HUGEINT!":
                    print(f"{name}: TYPE-WARN col {cname} is HUGEINT — driver hash will differ")
                    failed.append(name)
            orows_raw = od.fetchall()
            ocol_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = [tuple(r[i] for i in ocol_order) for r in orows_raw]
            ok = True
            msgs = []
            if sorted(scols) != sorted(ocols):
                ok = False
                msgs.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
            if len(srows) != len(orows):
                ok = False
                msgs.append(f"rows {len(srows)} vs {len(orows)}")
            if ok:
                a, b = normalize(srows, ndigits), normalize(orows, ndigits)
                if a != b:
                    ok = False
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    msgs.append(f"values differ, first diffs: {diff}")
            status = "OK" if ok else "FAIL"
            print(f"{name}: {status} {len(srows)} rows ({time.time()-t0:.1f}s)"
                  + ("" if ok else " — " + "; ".join(msgs)))
            if not ok:
                failed.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
    spark.stop()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
