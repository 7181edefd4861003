"""Property-based tests (SURVEY.md §5.4) — hypothesis over small random
option batches, driving the Spark merge through arbitrary groupings.

Spark round-trips are slow, so examples are few but each covers many
rows; properties target the merge algebra where parallel execution could
silently diverge from the reference's sequential Map-merge.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tepsonic_database_sync_spark.operators.options import merge_options

OPTION_SCHEMA = (
    "product_id string, grade string, color string, variant string, "
    "stock long, price long, discount long, uids string"
)

option_row = st.tuples(
    st.sampled_from(["p1", "p2"]),
    st.sampled_from(["A", "B"]),
    st.sampled_from(["Red", "Blue"]),
    st.sampled_from(["128GB", "256GB"]),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=999),
    st.sampled_from(["u1", "u2", "u3"]),
)

batches = st.lists(option_row, min_size=0, max_size=8)


def _df(spark, rows):
    data = [(p, g, c, v, s, pr, pr, u) for (p, g, c, v, s, pr, u) in rows]
    return spark.createDataFrame(data, OPTION_SCHEMA)


def _canon(df) -> list[tuple]:
    pdf = df.toPandas().sort_values(
        by=["product_id", "grade", "color", "variant"]
    )
    pdf["uids"] = pdf["uids"].map(lambda s: "|".join(sorted(s.split("|"))))
    return list(map(tuple, pdf.itertuples(index=False)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=batches, b=batches, c=batches)
def test_merge_associative_and_commutative(spark, a, b, c):
    # merge(merge(a,b),c) == merge(a,merge(b,c)) == merge over any order
    A, B, C = _df(spark, a), _df(spark, b), _df(spark, c)
    left = merge_options(merge_options(A, B), C)
    right = merge_options(A, merge_options(B, C))
    flipped = merge_options(C, merge_options(B, A))
    assert _canon(left) == _canon(right) == _canon(flipped)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=batches, b=batches)
def test_merge_conserves_stock_and_uids(spark, a, b):
    A, B = _df(spark, a), _df(spark, b)
    merged = merge_options(A, B).toPandas()
    total_in = sum(r[4] for r in a) + sum(r[4] for r in b)
    assert merged["stock"].sum() == total_in
    n_uids = sum(len(u.split("|")) for u in merged["uids"]) if len(merged) else 0
    assert n_uids == len(a) + len(b)
