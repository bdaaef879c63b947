"""Atomic directory saves: write to a temp dir, then rename-swap.

The reference's pickle save (/root/reference/vervectordb/__init__.py:556-573)
truncates the target before writing — an interrupted save loses the store.
Our loads already DETECT half-written artifacts (empty-meta guards); this
helper PREVENTS them: every `save` writes its complete artifact tree under
`{path}.__tmp__` and only then swaps it in with two renames. An interrupt
at any point leaves either the previous complete artifact or the new one —
never a torn mix (the worst case, dying between the two renames, leaves the
old tree at `{path}.__old__`, which `recover_old` restores).

This is the local-FS / HDFS guarantee (rename is atomic per dir). On object
stores rename is copy+delete, and a real mutable 100 TB deployment should
put artifacts behind a table format (Delta/Iceberg) whose commit protocol
does this transactionally; this helper is the no-dependency equivalent for
the plain-parquet layout. For MUTABLE data (not write-once artifacts) the
full protocol — versioned manifests, snapshot isolation, optimistic
concurrency, time travel — lives in sources/versioned.py.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager


@contextmanager
def atomic_save(path: str):
    """Yield a temp dir to write the artifact tree into; on clean exit,
    swap it over `path`. On exception the temp is removed and `path` is
    untouched."""
    tmp = path + ".__tmp__"
    old = path + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    # a prior save that died between its two renames left the ONLY copy of
    # the artifact at __old__ — restore it, never delete it (rmtree here
    # would lose the previous artifact if THIS save also fails)
    recover_old(path)
    shutil.rmtree(old, ignore_errors=True)  # only reached if path exists too
    try:
        yield tmp
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if not os.path.isdir(tmp) or not os.listdir(tmp):
        # the body wrote nothing into the temp tree: renaming the live
        # artifact away first would strand it at __old__ with path missing
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            f"atomic_save body produced no artifact under {tmp}; "
            f"{path} left untouched"
        )
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def recover_old(path: str) -> bool:
    """If a save died between its two renames, the previous complete
    artifact sits at `{path}.__old__` — move it back. Returns True if a
    recovery happened."""
    old = path + ".__old__"
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)
        return True
    return False
