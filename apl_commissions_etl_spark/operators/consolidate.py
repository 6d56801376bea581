"""Proposal consolidation: the reference's strict ordered fold
(scripts/transforms/consolidate-proposals.ts:130-245) as a grouped-map
pandas UDF — SURVEY.md §2.9 composite #3 and §2.11's sanctioned
applyInPandas case (the ONE place the accumulated state feeds the next
step's decision, so no window rewrite exists).

Rules, per group, over proposals sorted by (EffectiveDateFrom,
SplitConfigurationMD5, Id — Id added as a deterministic tiebreak; the
reference relies on engine sort stability):

    R1 new group                 -> close retained, start new
    R2 config MD5 differs        -> close retained, start new
       (compared against the RUN-OPENING proposal's MD5 — the retained
       MD5 is never mutated by merges)
    R3 plan-code conflict        -> close retained, start new
       conflict := no '*' wildcard on either side AND the sets
       partially overlap (disjoint or identical sets are fine);
       incoming is compared against the ACCUMULATED plan set
    R4 same config               -> merge into retained:
       EffectiveDateFrom/DateRangeFrom := min
       EffectiveDateTo: incoming NULL  -> keep retained (even if open)
                        retained NULL  -> take incoming (closes it!)
                        else           -> max
       DateRangeTo:     incoming NULL  -> NULL (re-opens!)
                        retained NULL  -> take incoming
                        else           -> max
       (the two null-asymmetries are faithful to the reference,
        :180-186 vs :196-209)
       plan/product codes := set union

Scale posture: one hash shuffle on GroupId + sortWithinPartitions,
then a streaming mapInPandas row loop per partition (state carried
across Arrow batches). Per-group applyInPandas would pay fixed pandas
overhead per group — ruinous with millions of tiny groups (measured
78s -> ~3s at sf0.1 with 150K groups).

Code lists are comma-joined strings with '*' sentinel; output lists
are canonically sorted-distinct-joined on BOTH engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = (
    "GroupId string, RetainedId string, EffectiveDateFrom date, "
    "EffectiveDateTo date, DateRangeFrom int, DateRangeTo int, "
    "ProductCodes string, PlanCodes string, ConsumedCount int"
)


def parse_codes(s) -> set[str]:
    """'*' -> wildcard set; else comma-split (ref parseCodesIntoSet,
    consolidate-proposals.ts:265-282, JSON-array path)."""
    if s is None or pd.isna(s):
        return set()
    s = str(s)
    if s == "*":
        return {"*"}
    return {c for c in s.split(",") if c != ""}


def has_plan_conflict(s1: set[str], s2: set[str]) -> bool:
    """Partial overlap without wildcard (ref :250-260)."""
    if "*" in s1 or "*" in s2:
        return False
    inter = s1 & s2
    if not inter:
        return False
    if len(inter) == len(s1) and len(inter) == len(s2):
        return False
    return True


def _null(v):
    return v is None or pd.isna(v)


_OUT_COLS = [
    "GroupId", "RetainedId", "EffectiveDateFrom", "EffectiveDateTo",
    "DateRangeFrom", "DateRangeTo", "ProductCodes", "PlanCodes",
    "ConsumedCount",
]


def _result_frame(out: list[dict]) -> pd.DataFrame:
    res = pd.DataFrame(out, columns=_OUT_COLS)
    res["DateRangeFrom"] = res["DateRangeFrom"].astype("Int32")
    res["DateRangeTo"] = res["DateRangeTo"].astype("Int32")
    res["ConsumedCount"] = res["ConsumedCount"].astype("Int32")
    return res


def _fold_partition(pdfs) -> "pd.DataFrame":
    """Fold an iterator of Arrow batches whose rows arrive sorted by
    (GroupId, EffectiveDateFrom, SplitConfigurationMD5, Id), with each
    group wholly inside this partition. One plain-Python row loop per
    PARTITION: per-group applyInPandas paid ~0.5 ms of pandas overhead
    per group, which at 150K two-row groups was 50x slower than the
    fold itself (measured 78s -> ~3s at sf0.1)."""
    out: list[dict] = []
    # retained-proposal state: [GroupId, RetainedId, EffectiveDateFrom,
    # EffectiveDateTo, DateRangeFrom, DateRangeTo, ConsumedCount] as a
    # list + the run-opening MD5 — r13: per-row ``dict(zip(cols, tup))``
    # materialization cost ~2x the fold's decision logic (guide §4.2:
    # do less per row inside the Python stage); tuple-index access
    # keeps the loop allocation-free except for the code sets.
    st: list | None = None
    st_md5 = None
    plans: set[str] = set()
    prods: set[str] = set()

    def close():
        if st is not None:
            out.append(
                {
                    "GroupId": st[0],
                    "RetainedId": st[1],
                    "EffectiveDateFrom": st[2],
                    "EffectiveDateTo": None if _null(st[3]) else st[3],
                    "DateRangeFrom": int(st[4]),
                    "DateRangeTo": None if _null(st[5]) else int(st[5]),
                    "ProductCodes": ",".join(sorted(prods)),
                    "PlanCodes": ",".join(sorted(plans)),
                    "ConsumedCount": st[6],
                }
            )

    for pdf in pdfs:
        idx = {c: i for i, c in enumerate(pdf.columns)}
        i_id, i_g = idx["Id"], idx["GroupId"]
        i_ef, i_et = idx["EffectiveDateFrom"], idx["EffectiveDateTo"]
        i_df, i_dt = idx["DateRangeFrom"], idx["DateRangeTo"]
        i_md5 = idx["SplitConfigurationMD5"]
        i_pc, i_prc = idx["PlanCodes"], idx["ProductCodes"]
        for tup in pdf.itertuples(index=False, name=None):
            incoming_plans = parse_codes(tup[i_pc])
            if (
                st is None
                or tup[i_g] != st[0]  # R1 new group
                or st_md5 != tup[i_md5]  # R2 (vs the RUN-OPENING MD5)
                or has_plan_conflict(plans, incoming_plans)  # R3
            ):
                close()
                st = [
                    tup[i_g], tup[i_id], tup[i_ef], tup[i_et],
                    tup[i_df], tup[i_dt], 0,
                ]
                st_md5 = tup[i_md5]
                plans = incoming_plans
                prods = parse_codes(tup[i_prc])
                continue
            # R4 merge
            st[2] = min(st[2], tup[i_ef])
            if not _null(tup[i_et]):
                st[3] = tup[i_et] if _null(st[3]) else max(st[3], tup[i_et])
            st[4] = min(st[4], tup[i_df])
            if _null(tup[i_dt]):
                st[5] = None
            elif _null(st[5]):
                st[5] = tup[i_dt]
            else:
                st[5] = max(st[5], tup[i_dt])
            plans |= incoming_plans
            prods |= parse_codes(tup[i_prc])
            st[6] += 1
    close()
    yield _result_frame(out)


def consolidate_proposals(prestage: DataFrame) -> DataFrame:
    """Fold each group's prestage proposals into retained proposals.

    Physical shape: ONE hash shuffle on GroupId (groups never split),
    sort within partitions to establish the fold order, then a
    streaming mapInPandas row loop per partition — state is carried
    across Arrow batches, so partition size is unbounded by memory."""
    from ..shipping import ensure_package_on_executors

    # the fold closure references this module by name; ship the
    # package so workers can unpickle it even when the driver imported
    # __spark_entry__ by path from an arbitrary cwd
    ensure_package_on_executors(prestage.sparkSession)
    sorted_parts = prestage.repartition("GroupId").sortWithinPartitions(
        "GroupId", "EffectiveDateFrom", "SplitConfigurationMD5", "Id"
    )
    return sorted_parts.mapInPandas(_fold_partition, RESULT_SCHEMA)
