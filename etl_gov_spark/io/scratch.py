"""Process-private scratch directories for write-then-read queries.

The snapshot / COW / z-order queries materialize a small working
table, mutate it, and return a DataFrame that *lazily* reads the
result — so the directory must outlive the query function but must
never be shared between two concurrent sessions (driver gate +
bench, or gate + pytest). A fixed path keyed on the sf-dir basename
raced: one session's ``rmtree`` could delete the other's
half-written table mid-query.

Design:

- One **process root** ``$TMPDIR/etl_gov_spark_scratch/p<pid>-<tok>``
  (random token, created once per interpreter). No two live
  processes ever share a root, so there is nothing to lock.
- ``scratch_dir(tag)`` hands out a fresh ``<tag>-<uuid4>`` subdir
  per call — even two threads of the same session cannot collide.
- The root is removed by ``atexit`` when the interpreter exits; on
  first use we also sweep sibling roots whose PID is no longer
  alive, so crashed runs do not accumulate garbage in ``$TMPDIR``.

At cluster scale the same queries would target object-store table
locations owned by a catalog (see io/snapshots.py); this module is
only the local-run stand-in for that isolation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_BASE = os.path.join(tempfile.gettempdir(), "etl_gov_spark_scratch")
_root: str | None = None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _sweep_stale() -> None:
    """Remove sibling roots left by processes that no longer exist."""
    try:
        entries = os.listdir(_BASE)
    except FileNotFoundError:
        return
    for name in entries:
        if not name.startswith("p"):
            continue
        pid_s = name[1:].split("-", 1)[0]
        if not pid_s.isdigit():
            continue
        if int(pid_s) == os.getpid() or _pid_alive(int(pid_s)):
            continue
        shutil.rmtree(os.path.join(_BASE, name), ignore_errors=True)


def _process_root() -> str:
    global _root
    if _root is None:
        _sweep_stale()
        _root = os.path.join(
            _BASE, f"p{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        os.makedirs(_root, exist_ok=True)
        atexit.register(shutil.rmtree, _root, ignore_errors=True)
    return _root


def scratch_dir(tag: str) -> str:
    """A fresh, empty, process-private directory for one query run."""
    path = os.path.join(_process_root(), f"{tag}-{uuid.uuid4().hex[:8]}")
    os.makedirs(path)
    return path
