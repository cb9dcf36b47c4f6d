"""`newsflow.tables.local_df` — small literal frames must land in the
plan as JVM LocalRelations (guide §4: no Python stage for literals),
with rows/schema identical to the plain `createDataFrame` path."""

from __future__ import annotations

import pytest

from newsflow.tables import local_df

CASES = [
    ([(0,)], "batch_id long"),
    (
        [("bronze", 0.0, 50.0), ("gold", 120.0, 300.0)],
        "tier string, lo double, hi double",
    ),
    ([(1, [0.1, 0.2]), (2, [0.3, 0.4])], "cell int, centroid array<double>"),
    ([([[0.1, 0.2], [0.3, 0.4]],)], "cents array<array<double>>"),
    ([(1, "a", 2.5, 3)], "a long, b string, c double, d int"),
    ([], "source string, h string, rn int"),
]


def _kind(df) -> str:
    return (
        df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    )


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_matches_plain_path(spark, rows, schema):
    fast = local_df(spark, rows, schema)
    plain = spark.createDataFrame(rows, schema)
    assert fast.schema == plain.schema
    assert [r.asDict() for r in fast.collect()] == [
        r.asDict() for r in plain.collect()
    ]


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_is_jvm_resident(spark, rows, schema):
    # Non-empty literals: LocalRelation. Empty: Project over a zero-row
    # JVM Range. Either way no LogicalRDD (the Python-RDD scan whose
    # every action launches Python worker tasks — measured 4.1 s for a
    # 1-row marker write vs 0.16 s JVM-resident).
    kind = _kind(local_df(spark, rows, schema))
    assert kind != "LogicalRDD"
    assert kind in ("LocalRelation", "Project", "Range")


def test_local_df_falls_back_on_exotic_rows(spark):
    # Row objects with a Decimal keep working through the fallback path.
    from decimal import Decimal

    df = local_df(spark, [(Decimal("1.5"),)], "d decimal(10,2)")
    assert df.collect()[0][0] == Decimal("1.50")
