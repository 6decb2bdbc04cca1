"""Per-process fixture cache + scratch-dir hygiene.

Query fixtures (stream sources, persisted state/pair tables) are written
once per process and reused, and every scratch dir is removed at
interpreter exit — repeated driver/bench invocations in one process
neither leak disk nor re-pay the fixture write (round-3 verdict). Cache
keys carry a content stamp of the input dir, so a long-lived process
whose underlying testdata parquet changed re-materializes instead of
serving stale fixtures.

Scale note: these fixtures are a test/bench-harness concern (the driver
hands every query a bare sf_dir). In production the equivalents —
persisted state tables, persisted pair tables, stream staging dirs —
are durable tables with their own lifecycle, not process-scoped caches.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

_SCRATCH: list[str] = []
_CACHE: dict[tuple, str] = {}


def dir_stamp(path: str) -> tuple[int, int]:
    """Content stamp of an input dir: (total bytes, max mtime_ns) over
    its files. Changed/rewritten inputs produce a different stamp, so a
    per-process cache keyed on it re-materializes instead of serving
    stale data."""
    total, mtime = 0, 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            try:
                st = os.stat(os.path.join(root, name))
            except OSError:
                continue
            total += st.st_size
            mtime = max(mtime, st.st_mtime_ns)
    return total, mtime


def force_mtime_order(path: str, seen: set[str], slice_idx: int, base: float) -> None:
    """Pin strictly increasing mtimes on the data files a sequential
    slice append just produced. FileStreamSource orders micro-batches by
    file modification time; on a filesystem with coarse mtime
    granularity two back-to-back appends can tie, letting the source
    drain slices out of time order and silently corrupting any
    order-sensitive cross-batch carry (round-4 advice,
    stream_attribution). Files not yet in `seen` belong to slice
    `slice_idx` and get mtime base+slice_idx — batch order becomes time
    order by construction, on every filesystem."""
    for fn in os.listdir(path):
        if not fn.startswith("_") and fn not in seen:
            seen.add(fn)
            t = base + slice_idx
            os.utime(os.path.join(path, fn), (t, t))


def scratch_dir(prefix: str) -> str:
    """mkdtemp registered for removal at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _SCRATCH:
        shutil.rmtree(d, ignore_errors=True)


def cached_fixture(
    name: str, sf_dir: str, writer: Callable[[str], None], prefix: str
) -> str:
    """Path to the per-process fixture dir for (name, sf_dir),
    materialized by `writer(path)` on first use; keyed on the input
    dir's content stamp so changed testdata invalidates the cache."""
    key = (name, sf_dir, dir_stamp(sf_dir))
    if key not in _CACHE:
        path = scratch_dir(prefix)
        writer(path)
        _CACHE[key] = path
    return _CACHE[key]
