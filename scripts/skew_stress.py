"""Measure task-time balance of the group-skewed cascade + builder.

The r9 verdict asked for proof that the 8-stage cascade and the
builder stay correct AND balanced when one group holds ~40% of
certificates (the reference's own volume shape,
proposal-builder.ts:819-862). Correctness is pinned by the two
oracle-checked parity queries (calc_skewed_group_parity,
builder_skewed_group_parity); this script supplies the task-time
numbers for SCALING.md's skew section.

Method: one fresh session with the Spark event log enabled; the
unskewed baseline and the skewed twin of each pipeline run one-shot
(no session caches) under their own job group; after spark.stop() the
event log is parsed into per-(group, stage) task-duration
distributions. The number that matters is max/median task time within
a stage — a skew-concentrated plan shows one straggler task holding
the hot group (ratio ~ tasks-per-stage); a skew-immune plan stays
near 1-3 even though 40% of rows share one key.

Usage: python scripts/skew_stress.py [sf_dir] [--append]
    --append: rewrite the '## Skew replication' section of SCALING.md
    (the section survives scripts/gen_scaling.py regeneration, which
    preserves everything from the first '## ' heading on).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING = os.path.join(REPO, "SCALING.md")
SECTION = "## Skew replication — one group holding ~40% of certificates"


def _run(spark, sf_dir: str) -> dict[str, float]:
    """Run the four variants one-shot under named job groups; return
    wall seconds per variant."""
    from apl_commissions_etl_spark.plans import builder as bplans
    from apl_commissions_etl_spark.plans import calc
    from apl_commissions_etl_spark.plans.builder_fixtures import cert_info
    from apl_commissions_etl_spark.queries.builder import (
        builder_skewed_group_parity,
    )
    from apl_commissions_etl_spark.queries.calcdomain import (
        _staging,
        calc_skewed_group_parity,
    )

    par = spark.sparkContext.defaultParallelism
    walls: dict[str, float] = {}

    def timed(group: str, make_df):
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        walls[group] = round(time.time() - t0, 2)
        spark.sparkContext.setJobGroup("idle", "idle")
        print(f"[skew] {group}: {walls[group]}s", file=sys.stderr)

    def baseline_gl():
        stg = dict(_staging(spark, sf_dir))
        stg["stg_premium_transactions"] = stg[
            "stg_premium_transactions"
        ].repartition(par)
        return calc.run_calc(stg)["gl"]

    def baseline_proposals():
        return bplans.build_proposals(
            bplans.selection_criteria(cert_info(spark, sf_dir))
        )

    # untimed warmup under the skipped 'idle' group: populate the
    # session staging/cert-info caches and JIT/broadcast machinery so
    # the four timed one-shot runs are comparable (otherwise whichever
    # variant runs first absorbs the fixture build and the table reads
    # as if skew made things FASTER)
    spark.sparkContext.setJobGroup("idle", "idle")
    baseline_gl().write.format("noop").mode("overwrite").save()
    baseline_proposals().write.format("noop").mode("overwrite").save()

    timed("calc_baseline", baseline_gl)
    timed("calc_skewed", lambda: calc_skewed_group_parity(spark, sf_dir))
    timed("builder_baseline", baseline_proposals)
    timed(
        "builder_skewed", lambda: builder_skewed_group_parity(spark, sf_dir)
    )
    return walls


def _parse_events(log_dir: str):
    """(group, stage) -> [task seconds]; skips the 'idle' group."""
    stage_to_group: dict[int, str] = {}
    tasks: dict[tuple[str, int], list[float]] = {}
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        # eventlog v2 layout: a directory per app containing
        # events_* files plus an empty appstatus_* marker
        paths += [
            os.path.join(root, f)
            for f in files
            if f.startswith("events") or f.startswith("local-")
        ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                ev = json.loads(line)
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id", ""
                    )
                    for si in ev.get("Stage Infos", []):
                        stage_to_group[si["Stage ID"]] = grp
                elif kind == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    grp = stage_to_group.get(sid, "")
                    if not grp or grp == "idle":
                        continue
                    ti = ev.get("Task Info", {})
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                    tasks.setdefault((grp, sid), []).append(dur)
    return tasks


def _summarize(tasks, walls, sf: str) -> list[str]:
    lines = [
        SECTION,
        "",
        f"Generated by `scripts/skew_stress.py` at {sf} on local[32]: the",
        "oracle-checked skew twins (`calc_skewed_group_parity`,",
        "`builder_skewed_group_parity` — ~40% of valid groups folded into",
        "G1 before staging, hash-proven equal to the verbatim fixture SQL",
        "over the same skewed input) timed one-shot against their",
        "unskewed baselines, with per-stage task-duration distributions",
        "from the Spark event log. `worst max/med` is the highest",
        "max-over-median task-time ratio across that run's stages with",
        "8+ tasks and a non-trivial median — the straggler signal: a plan",
        "that concentrates the hot group on one task shows a ratio near",
        "the task count; a skew-immune plan stays in low single digits.",
        "",
        "| variant | wall s | stages | worst max/med | worst-stage tasks |",
        "|---|---|---|---|---|",
    ]
    for grp in (
        "calc_baseline", "calc_skewed", "builder_baseline", "builder_skewed"
    ):
        stage_rows = {
            sid: durs for (g, sid), durs in tasks.items() if g == grp
        }
        worst, worst_n = 0.0, 0
        for sid, durs in stage_rows.items():
            if len(durs) < 8:
                continue
            med = statistics.median(durs)
            if med < 0.05:  # sub-50ms medians are scheduling noise
                continue
            ratio = max(durs) / med
            if ratio > worst:
                worst, worst_n = ratio, len(durs)
        lines.append(
            f"| {grp} | {walls.get(grp, '')} | {len(stage_rows)} | "
            f"{round(worst, 1) if worst else 'n/a (no 8+-task stage above 50ms median)'} | "
            f"{worst_n if worst_n else '-'} |"
        )
    lines += [
        "",
        "Reading it: the cascade never hash-partitions the fact by the",
        "hot key — every group/proposal/broker lookup broadcasts the dim",
        "side and the aggregations key on premium grain — so the skewed",
        "run's balance matches the baseline's. The builder's three",
        "aggregations keep certificate- or config-grain keys alongside",
        "GroupId (the pure-GroupId rollups aggregate config-scale",
        "inputs), with AQE skew-join splitting as the backstop for any",
        "future group-keyed shuffle join.",
        "",
    ]
    return lines


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    append = "--append" in sys.argv

    from apl_commissions_etl_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="skew_evlog_")
    spark = get_spark(
        "skew-stress",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file://" + log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    walls = _run(spark, sf_dir)
    spark.stop()
    lines = _summarize(
        _parse_events(log_dir), walls, os.path.basename(sf_dir.rstrip("/"))
    )
    print("\n".join(lines))
    if append:
        with open(SCALING) as fh:
            old = fh.read()
        if SECTION in old:
            head, _, rest = old.partition(SECTION)
            # drop the old section body (up to the next '## ' or EOF)
            nxt = rest.find("\n## ")
            tail = rest[nxt + 1 :] if nxt != -1 else ""
            old = head + tail
        with open(SCALING, "w") as fh:
            fh.write(old.rstrip("\n") + "\n\n" + "\n".join(lines))
        print(f"appended section to {SCALING}", file=sys.stderr)


if __name__ == "__main__":
    main()
