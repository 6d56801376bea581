"""audit_observed_gl: in-flight metrics must equal a dedicated audit
pass, and must ride the write job (CollectMetrics in the plan), not a
second scan."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from apl_commissions_etl_spark.queries.auditq import audit_observed_gl
from apl_commissions_etl_spark.queries.calcdomain import _stages


def test_observed_metrics_equal_direct_audit(spark, sf_dir):
    row = audit_observed_gl(spark, sf_dir).collect()[0]
    gl = _stages(spark, sf_dir)["gl"]
    direct = gl.agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.round(F.col("Amount") * 100).cast("long")).alias(
            "amount_cents"
        ),
    ).collect()[0]
    assert row["n_entries"] == direct["n_entries"]
    assert row["amount_cents"] == direct["amount_cents"]
    assert row["n_original"] + row["n_assigned"] == row["n_entries"]
    assert row["null_broker_entries"] == 0
    assert row["negative_entries"] == 0


def test_observe_rides_the_action_as_collect_metrics(spark, sf_dir):
    gl = _stages(spark, sf_dir)["gl"]
    obs = Observation()
    observed = gl.observe(obs, F.count(F.lit(1)).alias("n"))
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    # exactly one scan feeds the metrics: the observe node wraps the
    # SAME subtree the write consumes, so an audit costs zero extra
    # jobs beyond the materializing action itself
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == gl.count()
