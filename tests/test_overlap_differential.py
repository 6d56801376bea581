"""Differential test: the LEAD+array-set-ops overlap fix
(plans/builder.py) against a direct Python simulation of the
reference's per-group loop (proposal-builder.ts:1503-1620) on seeded
random inputs — the strongest evidence the window rewrite preserves
the fold's semantics on shapes the fixtures don't plant."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from apl_commissions_etl_spark.plans.builder import fix_overlapping_date_ranges

PAIR_SEP = "~"


def simulate_reference(groups: dict[str, list[dict]]) -> list[tuple]:
    """The reference loop, verbatim semantics: sort by from-date
    (ProposalId tiebreak, matching the engine's documented
    determinism deviation), compare ADJACENT proposals with their
    ORIGINAL pair sets, truncate on overlap, spawn -CONT rows for
    pairs only in the earlier proposal."""
    out = []
    for gid, props in groups.items():
        props = sorted(props, key=lambda p: (p["from"], p["id"]))
        conts = []
        eff_to = {p["id"]: p["to"] for p in props}
        for i in range(len(props) - 1):
            cur, nxt = props[i], props[i + 1]
            overlap = cur["pairs"] & nxt["pairs"]
            only_cur = cur["pairs"] - nxt["pairs"]
            if not overlap:
                continue
            eff_to[cur["id"]] = nxt["from"] - dt.timedelta(days=1)
            if only_cur:
                prods = sorted({p.split(PAIR_SEP)[0] for p in only_cur})
                plans = sorted({p.split(PAIR_SEP)[1] for p in only_cur})
                conts.append(
                    (
                        cur["id"] + "-CONT", gid, nxt["from"],
                        dt.date(2099, 1, 1),
                        ",".join(prods), ",".join(plans), 1,
                    )
                )
        for p in props:
            prods = sorted({x.split(PAIR_SEP)[0] for x in p["pairs"]})
            plans = sorted({x.split(PAIR_SEP)[1] for x in p["pairs"]})
            out.append(
                (p["id"], gid, p["from"], eff_to[p["id"]],
                 ",".join(prods), ",".join(plans), 0)
            )
        out.extend(conts)
    return sorted(out)


def test_overlap_window_rewrite_matches_reference_loop(spark):
    rng = random.Random(1234)
    products = ["PA", "PB", "PC"]
    plans = ["1", "2", "3", "*"]
    groups: dict[str, list[dict]] = {}
    rows = []
    for g in range(120):
        gid = f"G{g}"
        n = rng.randint(1, 4)
        props = []
        for i in range(n):
            start = dt.date(1992, 1, 1) + dt.timedelta(days=rng.randint(0, 3000))
            pairs = {
                f"{rng.choice(products)}{PAIR_SEP}{rng.choice(plans)}"
                for _ in range(rng.randint(1, 4))
            }
            pid = f"P-{gid}-{i}"
            props.append(
                {
                    "id": pid,
                    "from": start,
                    "to": start + dt.timedelta(days=rng.randint(30, 400)),
                    "pairs": pairs,
                }
            )
            rows.append((pid, gid, props[-1]["from"], props[-1]["to"],
                         sorted(pairs)))
        groups[gid] = props

    schema = T.StructType(
        [
            T.StructField("ProposalId", T.StringType()),
            T.StructField("GroupId", T.StringType()),
            T.StructField("EffectiveDateFrom", T.DateType()),
            T.StructField("EffectiveDateTo", T.DateType()),
            T.StructField("ProductPlanPairs", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(rows, schema).select(
        "*",
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        "ProductPlanPairs",
                        lambda p: F.split_part(p, F.lit(PAIR_SEP), F.lit(2)),
                    )
                )
            ),
            ",",
        ).alias("PlanCodes"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        "ProductPlanPairs",
                        lambda p: F.split_part(p, F.lit(PAIR_SEP), F.lit(1)),
                    )
                )
            ),
            ",",
        ).alias("ProductCodes"),
    )
    got = sorted(
        (r.Id, r.GroupId, r.EffectiveDateFrom, r.EffectiveDateTo,
         r.ProductCodes, r.PlanCodes, r.IsContinuation)
        for r in fix_overlapping_date_ranges(df).collect()
    )
    want = simulate_reference(groups)
    assert got == want
