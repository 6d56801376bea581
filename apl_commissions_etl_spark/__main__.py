"""CLI: the reference's entry points (SURVEY.md §3) as engine commands.

    python -m apl_commissions_etl_spark pipeline  [--root DIR] [--sf-dir DIR]
        [--no-resume] [--limit N] [--dry-run]
        == `npm run pipeline` (scripts/run-pipeline.ts): resumable
        staged ETL with a manifest; re-running skips completed stages.

    python -m apl_commissions_etl_spark build-proposals [--groups G1,G2]
        [--limit N] [--dry-run] [--out DIR] [--sf-dir DIR]
        == `npm run build-proposals` (scripts/proposal-builder.ts).

    python -m apl_commissions_etl_spark calculate [--out DIR] [--sf-dir DIR]
        == `sqlcmd ... sql/calc/run-calculation.sql`: the 8-stage
        cascade; writes GL entries, broker trace, and traceability.

    python -m apl_commissions_etl_spark audit [--sf-dir DIR]
        == sql/99-audit-and-cleanup.sql: FK orphan checks; exit 1 when
        any check reports orphans.

    python -m apl_commissions_etl_spark validate [--samples N] [--sf-dir DIR]
        == scripts/validate-with-sampling.ts: per-scenario stratified
        sample, config hashes re-derived via SQL text and compared.

    python -m apl_commissions_etl_spark query NAME [--sf-dir DIR] [--show N]
    python -m apl_commissions_etl_spark sql STATEMENT [--sf-dir DIR] [--show N]
        ad-hoc SQL over the base tables and the reporting views
        (reference names: EarningBrokers, GLJournalEntries, ...)
    python -m apl_commissions_etl_spark explain NAME [--mode MODE]
    python -m apl_commissions_etl_spark list [PREFIX]
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark():
    from .session import get_spark

    return get_spark("apl-commissions-etl-cli")


def _default_sf() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cmd_pipeline(args: argparse.Namespace) -> int:
    from .plans.pipeline import domain_pipeline

    spark = _spark()
    pipe = domain_pipeline(args.sf_dir)
    results = pipe.run(
        spark,
        args.root,
        resume=not args.no_resume,
        limit=args.limit,
        dry_run=args.dry_run,
    )
    for r in results:
        print(f"{r.status:>9}  {r.name:<28} rows={r.rows} {r.seconds:.1f}s")
    return 0 if all(r.status != "failed" for r in results) else 1


def cmd_build_proposals(args: argparse.Namespace) -> int:
    from .plans.builder import run_builder
    from .queries.builder import _certs

    spark = _spark()
    certs = _certs(spark, args.sf_dir)
    groups = args.groups.split(",") if args.groups else None
    out = run_builder(
        spark, certs, limit=args.limit, groups=groups, dry_run=args.dry_run
    )
    if args.dry_run:
        return 0
    for name, df in out.items():
        if args.out:
            path = os.path.join(args.out, name)
            df.write.mode("overwrite").parquet(path)
            print(f"wrote {path}")
        else:
            print(f"{name}: {df.count()} rows")
    return 0


def cmd_calculate(args: argparse.Namespace) -> int:
    from .plans import calc
    from .plans.fixtures import FIXTURE_VIEWS, register_fixture_views

    spark = _spark()
    register_fixture_views(spark, args.sf_dir)
    staging = {name: spark.table(name) for name, _ in FIXTURE_VIEWS}
    out = calc.run_calc(staging)
    for name in ("gl", "broker_trace", "trace"):
        df = out[name]
        if args.out:
            path = os.path.join(args.out, name)
            df.write.mode("overwrite").parquet(path)
            print(f"wrote {path}")
        else:
            print(f"{name}: {df.count()} rows")
    return 0


def cmd_audit(args: argparse.Namespace) -> int:
    from .plans.audit import referential_checks
    from .plans.fixtures import FIXTURE_VIEWS, register_fixture_views

    spark = _spark()
    register_fixture_views(spark, args.sf_dir)
    staging = {name: spark.table(name) for name, _ in FIXTURE_VIEWS}
    rc = 0
    for r in referential_checks(staging).collect():
        flag = "" if r["orphan_count"] == 0 else "  <-- ORPHANS"
        if r["orphan_count"]:
            rc = 1
        print(f'{r["check_name"]:<40} {r["orphan_count"]}{flag}')
    return rc


def cmd_validate(args: argparse.Namespace) -> int:
    from .plans.validate import validate_sample

    spark = _spark()
    result = validate_sample(spark, args.sf_dir, args.samples)
    rc = 0
    for scenario, (matched, sampled) in sorted(result.items()):
        ok = matched == sampled
        if not ok:
            rc = 1
        print(f"{scenario:<24} {matched}/{sampled}"
              f"{'' if ok else '  <-- MISMATCH'}")
    return rc


def cmd_query(args: argparse.Namespace) -> int:
    from .registry import all_queries

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; try: "
              f"python -m apl_commissions_etl_spark list", file=sys.stderr)
        return 2
    df = qs[args.name].spark_fn(_spark(), args.sf_dir)
    df.show(args.show, truncate=False)
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc Spark SQL over the base tables (registered as views under
    their parquet names) and the reporting schema (reference view
    names: EarningBrokers, GLJournalEntries, ...) — the reference's
    ``sqlcmd`` / check-*.ts workflow as one command.

    Base tables register through the guarded ``register_base_tables``
    (a redundant createOrReplaceTempView would uncache every cached
    plan built on the view). Reporting views register ON DEMAND: only
    the ones the statement actually names — constructing a report's
    DataFrame triggers the session's calc-stage materialization, so a
    base-table query must not pay for the reporting layer."""
    import re as _re

    from .queries.reporting import REPORTING_VIEW_QUERIES, register_reporting_views
    from .sources.testdata import register_base_tables

    spark = _spark()
    register_base_tables(spark, args.sf_dir)
    # Spark resolves temp-view names case-insensitively; match likewise
    tokens = {
        t.lower()
        for t in _re.findall(r"[A-Za-z_][A-Za-z0-9_]*", args.statement)
    }
    wanted = [
        v for v in REPORTING_VIEW_QUERIES.values() if v.lower() in tokens
    ]
    if wanted:
        register_reporting_views(spark, args.sf_dir, only=wanted)
    df = spark.sql(args.statement)
    df.show(args.show, truncate=False)
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Formatted physical plan of a registered query — the '.explain
    and iterate' loop as a first-class command (PLANS.md pins the
    flagship trees; this inspects any of the registered queries)."""
    from .registry import all_queries

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; try: "
              f"python -m apl_commissions_etl_spark list", file=sys.stderr)
        return 2
    df = qs[args.name].spark_fn(_spark(), args.sf_dir)
    df.explain(args.mode)
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from .registry import all_queries

    for name, q in all_queries().items():
        if not args.prefix or name.startswith(args.prefix):
            ref = (q.survey_ref or "").split("(")[0].strip()
            print(f"{name:<40} {ref[:70]}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="apl_commissions_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="resumable staged ETL (§3.1)")
    p.add_argument("--root", default="/tmp/apl_pipeline")
    p.add_argument("--sf-dir", default=_default_sf())
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--limit", type=int, default=None,
                   help="run only the first N stages")
    p.add_argument("--dry-run", action="store_true")
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("build-proposals", help="standalone builder (§3.2)")
    p.add_argument("--groups", default=None, help="comma-separated GroupIds")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--out", default=None, help="write outputs as parquet here")
    p.add_argument("--sf-dir", default=_default_sf())
    p.set_defaults(fn=cmd_build_proposals)

    p = sub.add_parser("calculate", help="8-stage commission calc (§3.3)")
    p.add_argument("--out", default=None)
    p.add_argument("--sf-dir", default=_default_sf())
    p.set_defaults(fn=cmd_calculate)

    p = sub.add_parser(
        "audit", help="FK orphan audit over staging (99-audit equivalent)"
    )
    p.add_argument("--sf-dir", default=_default_sf())
    p.set_defaults(fn=cmd_audit)

    p = sub.add_parser(
        "validate",
        help="stratified sampling validator (validate-with-sampling)",
    )
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--sf-dir", default=_default_sf())
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("query", help="run one registered query")
    p.add_argument("name")
    p.add_argument("--sf-dir", default=_default_sf())
    p.add_argument("--show", type=int, default=20)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser(
        "sql",
        help="ad-hoc SQL over base tables + reporting views",
        description="Run an ad-hoc SQL statement over the base tables "
        "and reporting views. View registration is token-based: any "
        "reporting-view name appearing ANYWHERE in the statement "
        "(including string literals or comments) triggers that view's "
        "registration, which may materialize its calc-stage inputs — "
        "avoid naming views you don't query.",
    )
    p.add_argument("statement")
    p.add_argument("--sf-dir", default=_default_sf())
    p.add_argument("--show", type=int, default=20)
    p.set_defaults(fn=cmd_sql)

    p = sub.add_parser("explain", help="print a query's physical plan")
    p.add_argument("name")
    p.add_argument("--sf-dir", default=_default_sf())
    p.add_argument(
        "--mode", default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("list", help="list registered queries")
    p.add_argument("prefix", nargs="?", default=None)
    p.set_defaults(fn=cmd_list)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
