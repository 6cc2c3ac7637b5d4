"""Deferred cleanup for query-scoped temp directories.

Queries that stage data through a local temp directory (connector
round-trips, foreachBatch delta sinks, partitioned-layout demos) must
NOT delete the directory while the DataFrame they return is alive:
``cache() + count() + rmtree`` only works until a cached block is
evicted or an executor is lost, after which recomputation re-reads
the deleted path and fails. Registering the directory here keeps the
returned DataFrame recomputable for the caller's whole lifetime and
removes the backing files at interpreter exit instead.
"""

from __future__ import annotations

import atexit
import shutil

_DIRS: list[str] = []


def cleanup_at_exit(path: str) -> None:
    """Defer removal of ``path`` to interpreter exit."""
    _DIRS.append(path)


def _purge() -> None:
    for p in _DIRS:
        shutil.rmtree(p, ignore_errors=True)


atexit.register(_purge)
