"""Differential test: the day-bucket-explode interval join must equal
the naive theta join (point BETWEEN start AND end) on seeded random
intervals — including zero-width intervals and points on boundaries.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

BASE = dt.date(2020, 1, 1)


def test_bucketed_interval_join_matches_theta(spark):
    rng = np.random.default_rng(11)
    n_pts, n_iv = 150, 200
    pts = spark.createDataFrame(
        [
            (int(i), BASE + dt.timedelta(days=int(d)))
            for i, d in enumerate(rng.integers(0, 60, n_pts))
        ],
        "pid long, d date",
    )
    ivs = []
    for j in range(n_iv):
        s = int(rng.integers(0, 60))
        width = int(rng.integers(0, 10))  # includes zero-width
        ivs.append(
            (j, BASE + dt.timedelta(days=s), BASE + dt.timedelta(days=s + width))
        )
    iv = spark.createDataFrame(ivs, "ivid long, s date, r date")

    # bucketed: explode covered days, equi-join on the day
    days = iv.withColumn("d", F.explode(F.sequence("s", "r")))
    got = {
        (r.pid, r.ivid)
        for r in pts.join(days, "d").select("pid", "ivid").collect()
    }

    # naive theta join reference
    want = {
        (r.pid, r.ivid)
        for r in pts.join(
            iv, (pts.d >= iv.s) & (pts.d <= iv.r)
        ).select("pid", "ivid").collect()
    }
    assert got == want and len(got) > 0
