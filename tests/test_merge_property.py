"""Property-based check of merge_upsert semantics against a dict-based
reference model: matched keys take source values for update columns,
unmatched source keys insert, unmatched target keys persist."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from apl_commissions_etl_spark.operators.export import merge_upsert

_key = st.integers(min_value=0, max_value=6)
_val = st.integers(min_value=0, max_value=99)
_side = st.lists(st.tuples(_key, _val, _val), max_size=8, unique_by=lambda t: t[0])


def _model(target, source):
    out = {k: (a, b) for k, a, b in target}
    for k, a, b in source:
        if k in out:
            out[k] = (a, out[k][1])  # only 'a' is an update column
        else:
            out[k] = (a, b)
    return sorted((k, a, b) for k, (a, b) in out.items())


@pytest.fixture(scope="module")
def _spark():
    from apl_commissions_etl_spark.session import get_spark

    return get_spark("merge-prop", shuffle_partitions=4)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=_side, source=_side)
def test_merge_upsert_matches_model(_spark, target, source):
    cols = "k long, a long, b long"
    t = _spark.createDataFrame(target or [(99, 0, 0)], cols)
    s = _spark.createDataFrame(source or [(98, 0, 0)], cols)
    if not target:
        t = t.filter("k < 0")
    if not source:
        s = s.filter("k < 0")
    got = sorted(
        (r.k, r.a, r.b)
        for r in merge_upsert(t, s, ["k"], update_cols=["a"]).collect()
    )
    assert got == _model(target, source)
