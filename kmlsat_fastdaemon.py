"""PySpark worker daemon with the CPython-3.12 zipimport cache fix.

Why this exists (round-8 profiling, OPTIMIZATION_r08.md §7): every PySpark
task's preamble calls ``importlib.invalidate_caches()``
(pyspark/worker_util.py ``setup_spark_files``).  On CPython 3.11,
``zipimporter.invalidate_caches()`` re-reads the ENTIRE zip central
directory unconditionally; the worker ``sys.path`` carries pyspark.zip,
py4j-*.zip and the spark-core jar, and ``sys.path_importer_cache`` holds a
zipimporter per *subpath* (~20 entries), so each task paid ~200-300 ms of
pure directory re-parsing — measured as a 185-625 ms gap between
consecutive tasks on a reused, otherwise idle worker, dwarfing millisecond
task bodies.  CPython 3.12 fixed exactly this upstream by skipping the
re-read when the archive is unchanged (gh-84481); this module backports
that semantics — re-read only when the zip's (mtime, size) changed — and
then defers to the stock ``pyspark.daemon``.  Behaviour is preserved: a
genuinely modified archive is still re-read.

Wiring: ``spark.python.daemon.module`` (see ``get_spark``); disable with
``SPARK_GRAFT_FAST_DAEMON=0``.  Scale note: this is not a local[32] tune —
any Python-on-Spark deployment on CPython < 3.12 pays this per task, and
the patch is a no-op on interpreters that already have the upstream fix
behaviour (the first call per archive still re-reads once).
"""

import os
import zipimport

_ZIP_KEYS: dict[str, tuple] = {}
_ORIG_INVALIDATE = zipimport.zipimporter.invalidate_caches


def _invalidate_caches(self):
    try:
        st = os.stat(self.archive)
        key = (st.st_mtime, st.st_size)
    except OSError:
        # archive vanished — preserve stock behaviour (marks importer stale)
        _ORIG_INVALIDATE(self)
        return
    if _ZIP_KEYS.get(self.archive) == key:
        return
    _ORIG_INVALIDATE(self)
    _ZIP_KEYS[self.archive] = key


zipimport.zipimporter.invalidate_caches = _invalidate_caches


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
