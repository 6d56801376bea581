"""bench.py window self-defense (r10 verdict item 2): the detector
that flags a host-contention-polluted steady window.

Pure-function tests here; the end-to-end forced-contention validation
(busy-loop beside a live bench run at sf0.001) is a scripted check —
see REHEARSAL_r11.log — because a full bench invocation inside pytest
would add minutes to every suite run.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BENCH = _bench()


def test_contention_signature_fires():
    prev = {"agg_pricing_summary": 1.0, "calc_gl_entries": 0.8,
            "dim_policies": 1.7, "win_sessionize": 0.75}
    now = {"agg_pricing_summary": 11.0, "calc_gl_entries": 9.0,
           "dim_policies": 9.4, "win_sessionize": 0.7}
    hits = BENCH.suspect_queries(now, prev)
    assert hits == ["agg_pricing_summary", "calc_gl_entries",
                    "dim_policies"]


def test_local_regression_does_not_fire():
    # a single query regressing 10x is a REAL regression, not window
    # pollution — the artifact must record it, not retry it away
    prev = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    now = {"a": 10.0, "b": 1.1, "c": 0.9, "d": 1.0}
    assert BENCH.suspect_queries(now, prev) == []


def test_two_hits_below_threshold():
    prev = {"a": 1.0, "b": 1.0, "c": 1.0}
    now = {"a": 4.0, "b": 4.0, "c": 1.0}
    assert BENCH.suspect_queries(now, prev) == []


def test_micro_query_jitter_ignored():
    # sub-floor queries 3x-ing is scheduler jitter, not contention
    prev = {"a": 0.03, "b": 0.02, "c": 0.04, "d": 1.0}
    now = {"a": 0.1, "b": 0.07, "c": 0.13, "d": 1.1}
    assert BENCH.suspect_queries(now, prev) == []


def test_unknown_or_zero_baseline_ignored():
    prev = {"a": 0.0, "zzz": 1.0}
    now = {"a": 5.0, "b": 5.0, "c": 5.0}
    assert BENCH.suspect_queries(now, prev) == []


def test_prev_round_steady_prefers_parsed_queries(tmp_path):
    # driver-archived shape with the r11+ compact line (embedded
    # steady dict, full headline coverage) must win over legacy tail
    # fragments; unknown names are dropped from the result
    qdict = {n: 1.25 for n in BENCH.HEADLINE}
    qdict["not_a_query"] = 9.9
    doc = {
        "parsed": {
            "metric": "headline_queries_total",
            "queries": qdict,
        },
        "tail": '"cold_queries": {"agg_pricing_summary": 99.0}',
    }
    (tmp_path / "BENCH_r11.json").write_text(json.dumps(doc))
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert fname == "BENCH_r11.json"
    assert found == {n: 1.25 for n in BENCH.HEADLINE}


def test_prev_round_steady_skips_cold_only_tail(tmp_path):
    # the r10-style artifact: steady dict truncated out of the tail,
    # only cold fragments left — MUST NOT be used as a baseline
    doc = {
        "parsed": {"metric": "headline_queries_total", "value": 33.5},
        "tail": '"agg_pricing_summary": 1.21, "calc_gl_entries": 0.79}',
    }
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(doc))
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert found == {}


def test_prev_round_steady_local_fallback(tmp_path):
    # BENCH_LOCAL.json (bench stdout's own final line) is the
    # committed clean-window baseline when no r11+ artifact exists
    line = {
        "metric": "headline_queries_total",
        "queries": {"calc_gl_entries": 0.79},
    }
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(line))
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert fname == "BENCH_LOCAL.json"
    assert found == {"calc_gl_entries": 0.79}


def test_prev_round_steady_rejects_verbatim_r02_artifact(tmp_path):
    # The r11 live bug (VERDICT r11 item 1): BENCH_r02.json's parsed
    # line carries a 19-query dict from the r02-era headline set, so
    # tier 1 preferred it over BENCH_LOCAL.json and the committed
    # driver artifact recorded window_baseline=BENCH_r02.json — a
    # 9-round-stale baseline. Feed the VERBATIM committed artifacts:
    # the low-coverage round line must lose to BENCH_LOCAL.json.
    import shutil

    shutil.copy(os.path.join(REPO, "BENCH_r02.json"),
                tmp_path / "BENCH_r02.json")
    shutil.copy(os.path.join(REPO, "BENCH_LOCAL.json"),
                tmp_path / "BENCH_LOCAL.json")
    # sanity: the trap is still armed — r02's parsed line really does
    # carry a queries dict with some still-current headline names
    r02 = json.loads((tmp_path / "BENCH_r02.json").read_text())
    overlap = [n for n in r02["parsed"]["queries"] if n in BENCH.HEADLINE]
    assert overlap, "BENCH_r02.json no longer overlaps HEADLINE"
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.1)
    assert fname == "BENCH_LOCAL.json"
    assert len(found) >= 0.8 * len(BENCH.HEADLINE)


def test_prev_round_steady_low_coverage_round_skipped(tmp_path):
    # a round artifact with a queries dict covering <80% of HEADLINE
    # is stale-era; with no other file at all it yields NO baseline
    # (tail tier has nothing) rather than a poisoned one
    few = {n: 1.0 for n in BENCH.HEADLINE[:5]}
    doc = {"parsed": {"metric": "headline_queries_total",
                      "queries": few}, "tail": ""}
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(doc))
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert (fname, found) == (None, {})


def test_prev_round_steady_full_coverage_round_wins(tmp_path):
    # an r11+-style round artifact covering the full headline set
    # outranks BENCH_LOCAL.json (newest committed round is tier 1)
    full = {n: 1.0 for n in BENCH.HEADLINE}
    doc = {"parsed": {"metric": "headline_queries_total",
                      "queries": full}, "tail": ""}
    (tmp_path / "BENCH_r11.json").write_text(json.dumps(doc))
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"queries": {n: 2.0 for n in BENCH.HEADLINE}})
    )
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert fname == "BENCH_r11.json"
    assert found[BENCH.HEADLINE[0]] == 1.0


def test_lone_outlier_fires_on_single_5x_hit():
    # the r11 shape: ONE query 9x its baseline, window detector silent
    prev = {"builder_overlap_fix": 1.3, "calc_gl_entries": 0.8}
    now = {"builder_overlap_fix": 11.9, "calc_gl_entries": 0.79}
    assert BENCH.suspect_queries(now, prev) == []  # by design
    assert BENCH.lone_outliers(now, prev) == ["builder_overlap_fix"]


def test_lone_outlier_floor_and_ratio():
    # sub-floor queries and <5x regressions do not trigger re-measure
    prev = {"a": 0.05, "b": 1.0, "c": 1.0}
    now = {"a": 0.4, "b": 4.9, "c": 5.0}
    assert BENCH.lone_outliers(now, prev) == ["c"]


def test_lone_outlier_multiple_hits_all_listed():
    prev = {"a": 1.0, "b": 1.0, "c": 1.0}
    now = {"a": 6.0, "b": 7.0, "c": 1.0}
    assert BENCH.lone_outliers(now, prev) == ["a", "b"]


def test_prev_round_steady_skips_cross_sf_baseline(tmp_path):
    # a baseline recorded at a different scale factor must be skipped
    # (every query would look 3x+ off and poison the detector)
    line = {
        "metric": "headline_queries_total",
        "sf": 0.001,
        "queries": {"calc_gl_entries": 0.06},
    }
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(line))
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.1)
    assert found == {}
    # same SF: accepted
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.001)
    assert found == {"calc_gl_entries": 0.06}
    # no SF filter requested: accepted (legacy behavior)
    fname, found = BENCH.prev_round_steady(str(tmp_path))
    assert found == {"calc_gl_entries": 0.06}


def test_prev_round_steady_skips_variant_artifact_names(tmp_path):
    # the r13 live bug: the driver's 8-core scaling artifact
    # BENCH_r12_c8.json sorts BEFORE BENCH_r12.json in reverse-lex
    # order ('_' > '.') and was adopted as the 32-core baseline.
    # Variant names must never qualify; the canonical round artifact
    # must win.
    full = {n: 0.5 for n in BENCH.HEADLINE}
    c8 = {
        "parsed": {
            "metric": "headline_queries_total", "sf": 0.1,
            "queries": {n: 9.9 for n in BENCH.HEADLINE},
        }
    }
    main = {
        "parsed": {
            "metric": "headline_queries_total", "sf": 0.1,
            "queries": full,
        }
    }
    (tmp_path / "BENCH_r12_c8.json").write_text(json.dumps(c8))
    (tmp_path / "BENCH_r12.json").write_text(json.dumps(main))
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.1)
    assert fname == "BENCH_r12.json"
    assert found["calc_gl_entries"] == 0.5


def test_prev_round_steady_skips_cross_cpu_baseline(tmp_path):
    # an artifact that RECORDS a different core count is skipped even
    # under a canonical name; matching or absent cpus qualifies
    line = {
        "metric": "headline_queries_total",
        "sf": 0.1,
        "cpus": 8,
        "queries": {n: 0.5 for n in BENCH.HEADLINE},
    }
    (tmp_path / "BENCH_r12.json").write_text(json.dumps({"parsed": line}))
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.1, cpus=32)
    assert found == {}
    fname, found = BENCH.prev_round_steady(str(tmp_path), sf=0.1, cpus=8)
    assert fname == "BENCH_r12.json" and found
