"""The driver-gate prefix contract: the external harness oracle-checks
exactly the FIRST 50 registry entries, so the prefix must stay an
intentional choice (registry.DRIVER_PRIORITY) rather than a
registration-order accident — and it must fit the gate session's
default 1g driver heap (empirically ~60-67 queries before cumulative
checkpoints/broadcasts exhaust it; see scripts/check_oracle.py
--range)."""

from __future__ import annotations

from apl_commissions_etl_spark.registry import DRIVER_PRIORITY, all_queries


def test_prefix_is_exactly_the_priority_list():
    qs = list(all_queries())
    assert len(DRIVER_PRIORITY) == 50, (
        "the driver checks exactly 50 slots; a shorter list leaks "
        "registration-order entries into the gate, a longer one is "
        "silently truncated"
    )
    assert qs[:50] == list(DRIVER_PRIORITY)
    assert len(set(DRIVER_PRIORITY)) == 50


def test_every_query_has_an_oracle():
    # 276/276 as of r6: zero rows-only entries. A new query without an
    # oracle downgrades its driver check — keep that a deliberate,
    # visible choice, not an omission.
    missing = [n for n, q in all_queries().items() if q.oracle is None]
    assert missing == [], f"queries without oracle SQL: {missing}"
