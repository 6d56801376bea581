"""Session-scoped memoization with per-key locking.

The query modules keep module-level caches of expensive shared frames
(calc staging cascade, builder criteria, LSH pair index, ANN
constants...). ``session.warm_shared_caches`` populates them from
CONCURRENT chains, and user code may race a warm-up thread into the
same accessor. A bare ``if key not in cache: cache[key] = build()``
is check-then-act: two threads can both miss and double-build — at
best wasted cluster work, at worst a leaked eager localCheckpoint
that nothing ever references.

``locked_get`` makes the invariant structural instead of
conventional: per-(cache, key) locks serialize builders for the SAME
entry while leaving distinct entries (and distinct caches) fully
concurrent, so the warm-up chains keep their parallelism.
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Hashable
from typing import TypeVar

V = TypeVar("V")

#: Sentinel key under which each cache dict carries its OWN per-key
#: lock table.  Storing the locks on the cache itself (rather than a
#: module-level table keyed by id(cache)) means lock state dies with
#: its cache — no unbounded growth across test-local caches, and no
#: id() recycling aliasing an unrelated cache's locks.  The sentinel
#: is a private object() so it can never collide with (or be observed
#: through) a real ``in`` / ``[]`` lookup on user keys.
_LOCK_TABLE_KEY = object()
_LOCKS_GUARD = threading.Lock()


def locked_get(cache: dict, key: Hashable, build: Callable[[], V]) -> V:
    """Memoize ``build()`` under ``cache[key]`` with double-checked
    per-key locking: the fast path is a lock-free hit; on a miss,
    exactly one thread runs the builder while others for the same key
    block, and builders for different keys never contend."""
    try:
        return cache[key]
    except KeyError:
        pass
    with _LOCKS_GUARD:
        locks = cache.setdefault(_LOCK_TABLE_KEY, {})
        lock = locks.setdefault(key, threading.Lock())
    with lock:
        if key not in cache:
            cache[key] = build()
    return cache[key]
