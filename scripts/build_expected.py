"""Regenerate the expected-parquet oracle tables under data/<sf>/expected.

Runs the sequential geometry pipeline (oracle/sequential.py) on the engine
tables in data/<sf>/, plus the independent text/dedup expected builders
(oracle/textdata.py) on the driver testdata documents table.

Usage:
    MALLOC_MMAP_THRESHOLD_=1073741824 PYTHONPATH=/root/repo \
        python scripts/build_expected.py [sf0.001 sf0.01]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from azure_workflow_for_kml_satellite_spark.oracle.sequential import build_expected
from azure_workflow_for_kml_satellite_spark.oracle.textdata import build_expected_text

REPO_DATA = Path(__file__).resolve().parent.parent / "data"
TESTDATA = Path("/root/testdata")


def main() -> None:
    sfs = sys.argv[1:] or ["sf0.001", "sf0.01"]
    for sf in sfs:
        t0 = time.time()
        build_expected(REPO_DATA / sf)
        print(f"{sf}: geometry expected rebuilt in {time.time() - t0:.1f}s")
        docs = TESTDATA / sf / "documents.parquet"
        if docs.exists():
            t0 = time.time()
            build_expected_text(docs, REPO_DATA / sf / "expected")
            print(f"{sf}: text expected rebuilt in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
