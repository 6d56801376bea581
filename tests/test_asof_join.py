"""Differential test: the union-marker as-of join vs pandas
``merge_asof`` on seeded random event streams — proves the window
re-expression implements true backward as-of semantics (latest click
at-or-before each purchase, per user), not just the one oracle-checked
dataset's shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def _spark_asof(spark, clicks_pd, purchases_pd):
    """The engine's asof_join_backward operator (the same plan
    seq_asof_attribution runs) over arbitrary click/purchase frames."""
    from apl_commissions_etl_spark.operators.asof import asof_join_backward

    joined = asof_join_backward(
        spark.createDataFrame(purchases_pd),
        spark.createDataFrame(clicks_pd),
        by="user_id",
        left_on="ts",
        right_on="ts",
        right_cols=["event_id"],
        tie_break="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("click_event_id"),
        F.col("ts_asof").alias("click_ts"),
    ).toPandas()


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_users, n_clicks, n_purch = 13, 400, 300
    clicks = pd.DataFrame(
        {
            "event_id": np.arange(n_clicks, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n_clicks).astype(np.int64),
            # integer ts with deliberate duplicates (same user, same ts)
            "ts": rng.integers(0, 150, n_clicks).astype(np.int64),
        }
    )
    purchases = pd.DataFrame(
        {
            "event_id": np.arange(10_000, 10_000 + n_purch, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n_purch).astype(np.int64),
            "ts": rng.integers(0, 150, n_purch).astype(np.int64),
        }
    )

    got = _spark_asof(spark, clicks, purchases).sort_values("event_id")

    # pandas reference: dedup clicks to max event_id per (user, ts),
    # then backward merge_asof per user
    cd = (
        clicks.groupby(["user_id", "ts"], as_index=False)["event_id"]
        .max()
        .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
        .sort_values("click_ts")
    )
    want = pd.merge_asof(
        purchases.sort_values("ts"),
        cd,
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("event_id")

    assert len(got) == len(want) == n_purch
    for g, w_ in zip(got.itertuples(index=False), want.itertuples(index=False)):
        assert g.event_id == w_.event_id
        gc = None if pd.isna(g.click_event_id) else int(g.click_event_id)
        wc = None if pd.isna(w_.click_event_id) else int(w_.click_event_id)
        assert gc == wc, (g, w_)
