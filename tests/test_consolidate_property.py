"""Property-based differential for the consolidation fold: the
engine's fold logic vs the DuckDB RECURSIVE CTE oracle on RANDOM
proposal sets — the two implementations share no code, so agreement on
arbitrary inputs is strong evidence for rules R1-R4 (wildcard
conflicts, the asymmetric NULL date merges, accumulated-set state).

The pandas-level fold (_fold_partition) is exactly what each Spark
partition executes; the shuffle/sort wrapper above it is covered by
the fixture-backed oracle query (consolidate_proposals)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from apl_commissions_etl_spark.operators.consolidate import _fold_partition
from apl_commissions_etl_spark.queries.builder import CONSOLIDATE_ORACLE

_CODES = ["*", "A", "B", "C", "A,B", "B,C", "A,C", "A,B,C"]
_DATES = [dt.date(2024, m, 1) for m in (1, 2, 3, 4)]

_row = st.tuples(
    st.sampled_from(["G1", "G2"]),               # GroupId
    st.sampled_from(["m1", "m2", "m3"]),         # SplitConfigurationMD5
    st.sampled_from(_DATES),                      # EffectiveDateFrom
    st.one_of(st.none(), st.sampled_from(_DATES)),  # EffectiveDateTo
    st.integers(min_value=0, max_value=4),        # DateRangeFrom
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),  # DateRangeTo
    st.sampled_from(_CODES),                      # ProductCodes
    st.sampled_from(_CODES),                      # PlanCodes
)


def _frame(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        [
            {
                "Id": f"P{i:03d}",
                "GroupId": g,
                "SplitConfigurationMD5": md5,
                "EffectiveDateFrom": eff_from,
                "EffectiveDateTo": eff_to,
                "DateRangeFrom": dr_from,
                "DateRangeTo": dr_to,
                "ProductCodes": prods,
                "PlanCodes": plans,
            }
            for i, (g, md5, eff_from, eff_to, dr_from, dr_to, prods, plans)
            in enumerate(rows)
        ]
    )
    df["DateRangeFrom"] = df["DateRangeFrom"].astype("Int32")
    df["DateRangeTo"] = df["DateRangeTo"].astype("Int32")
    return df


def _norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)) or pd.isna(v):
        return None
    if hasattr(v, "isoformat"):
        return str(v)[:10]
    return v


def _engine_fold(df: pd.DataFrame):
    ordered = df.sort_values(
        ["GroupId", "EffectiveDateFrom", "SplitConfigurationMD5", "Id"]
    )
    (res,) = list(_fold_partition(iter([ordered])))
    return sorted(
        tuple(_norm(v) for v in t)
        for t in res.itertuples(index=False, name=None)
    )


def _oracle_fold(df: pd.DataFrame):
    con = duckdb.connect()
    con.register("proposals_input", df)
    sql = CONSOLIDATE_ORACLE.format(
        fixtures=(
            "prestage_proposals AS ("
            "SELECT Id, GroupId, SplitConfigurationMD5, "
            "CAST(EffectiveDateFrom AS DATE) AS EffectiveDateFrom, "
            "CAST(EffectiveDateTo AS DATE) AS EffectiveDateTo, "
            "DateRangeFrom, DateRangeTo, ProductCodes, PlanCodes "
            "FROM proposals_input)"
        )
    )
    cur = con.execute(sql)
    rows = cur.fetchall()
    return sorted(tuple(_norm(v) for v in t) for t in rows)


@settings(max_examples=120, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=12))
def test_fold_matches_recursive_cte_on_random_proposals(rows):
    df = _frame(rows)
    assert _engine_fold(df) == _oracle_fold(df)
