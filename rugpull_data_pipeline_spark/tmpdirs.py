"""Session-scoped scratch directories with automatic hygiene.

The streaming replays and bucketed-table fixtures need throwaway on-disk
locations (source slices, checkpoints, parquet sinks). Creating them with
bare ``tempfile.mkdtemp`` litters ``$TMPDIR`` with one orphan per run —
harmless once, unbounded growth under repeated CI runs.

This module gives every process ONE scratch root,
``$TMPDIR/rugpull_scratch_<pid>``, and hands out subdirectories inside it.
On first use it sweeps scratch roots left behind by processes that no
longer exist (liveness-checked via ``os.kill(pid, 0)``), plus any older
than ``_MAX_AGE_S`` as a backstop for pid reuse — so a fresh test run
leaves ``$TMPDIR`` no larger than it found it.

Deliberately NOT swept: the content-keyed cached corpora
(``rugpull_guard_corpus_*``, ``rugpull_solana_*``, ``rugpull_blobs_*``,
``rugpull_bucketed_*``, the shipped package zip). Those carry their
parameters in the name, are reused across runs, and rebuilding them is the
expensive part — exactly the cache-key convention the rest of the repo uses.
"""

from __future__ import annotations

import errno
import os
import shutil
import tempfile

_MAX_AGE_S = 6 * 3600
_SWEPT = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as ex:
        return ex.errno == errno.EPERM  # alive but not ours
    return True


def _sweep_stale_roots() -> None:
    """Remove scratch roots of dead processes (and very old ones)."""
    import time

    base = tempfile.gettempdir()
    now = time.time()
    try:
        entries = os.listdir(base)
    except OSError:  # pragma: no cover
        return
    for name in entries:
        if not name.startswith("rugpull_scratch_"):
            continue
        path = os.path.join(base, name)
        try:
            pid = int(name.rsplit("_", 1)[-1])
        except ValueError:
            pid = -1
        if pid == os.getpid():
            continue
        stale_age = False
        try:
            stale_age = now - os.path.getmtime(path) > _MAX_AGE_S
        except OSError:
            pass
        if (pid > 0 and not _pid_alive(pid)) or stale_age:
            shutil.rmtree(path, ignore_errors=True)


def scratch_root() -> str:
    """This process's scratch root (created on demand; sweeps once)."""
    global _SWEPT
    if not _SWEPT:
        _sweep_stale_roots()
        _SWEPT = True
    root = os.path.join(tempfile.gettempdir(), f"rugpull_scratch_{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return root


def scratch_dir(prefix: str = "tmp_") -> str:
    """A fresh unique directory under the session scratch root.

    Drop-in for ``tempfile.mkdtemp(prefix=...)`` at every replay call site;
    the whole root is reclaimed by the next process's sweep once this one
    exits, so repeated runs cannot grow ``$TMPDIR`` unboundedly.
    """
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
