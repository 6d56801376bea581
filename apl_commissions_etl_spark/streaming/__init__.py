"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; its nearest incremental features are
resumable run state (ref sql/00a-state-management-tables.sql,
scripts/lib/state-manager.ts:1-50) and idempotent anti-join inserts
(ref sql/transforms/00-references.sql:79-82). This module is the
flagged NEW surface: the same windowed/dedup transforms exposed over
``readStream`` with watermark-driven late-data handling.
"""

from .windows import (  # noqa: F401
    dedup_keep_first,
    session_stats,
    sliding_counts,
    stream_events,
    tumbling_counts,
)
