"""exact_stats_agg must be bit-identical to the dsum/davg decimal
formulation — that equivalence is what lets queries switch to the fast
hierarchical form without touching their DuckDB oracles."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow.functions.exactagg import Avg, Sum, exact_stats_agg
from newsflow.functions.scalars import davg, dsum
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_decimal_formulation_on_lineitem(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fast = exact_stats_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        measures={
            "qty": F.col("l_quantity"),
            "dp": disc_price,
            "disc": F.col("l_discount"),
        },
        stats=[
            Sum("sum_qty", "qty"),
            Sum("sum_disc_price", "dp"),
            Avg("avg_qty", "qty"),
            Avg("avg_disc", "disc", out=4),
        ],
        count_alias="n",
    )
    slow = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum(disc_price).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount", out=4).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )
    assert fast.columns == slow.columns
    assert _rows(fast) == _rows(slow)


def test_partitioning_invariance(spark):
    """The merged sum must not depend on how rows are partitioned."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    def run(df):
        return _rows(
            exact_stats_agg(
                df,
                keys=["l_returnflag"],
                measures={"p": F.col("l_extendedprice")},
                stats=[Sum("s", "p"), Avg("a", "p")],
            )
        )
    assert run(li) == run(li.repartition(37)) == run(li.coalesce(1))


def test_negative_values_and_single_row_groups(spark):
    df = spark.createDataFrame(
        [("a", -0.005), ("a", 2.675), ("b", -123456.789)],
        "k string, v double",
    )
    fast = exact_stats_agg(
        df,
        keys=["k"],
        measures={"v": F.col("v")},
        stats=[Sum("s", "v"), Avg("m", "v")],
        count_alias="n",
    )
    slow = df.groupBy("k").agg(
        dsum("v").alias("s"), davg("v").alias("m"), F.count(F.lit(1)).alias("n")
    )
    assert _rows(fast) == _rows(slow)


from hypothesis import given, settings, strategies as st

# Money-like values: ≤2 decimal digits, the exactness precondition both
# dsum and exact_stats_agg state (scale-4 integer scaling is lossless).
_money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda c: c / 100.0
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), _money),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_property_matches_decimal_formulation(spark, rows, n_parts):
    df = spark.createDataFrame(rows, "k string, v double").repartition(n_parts)
    fast = exact_stats_agg(
        df,
        keys=["k"],
        measures={"v": F.col("v")},
        stats=[Sum("s", "v"), Avg("m", "v")],
        count_alias="n",
    )
    slow = df.groupBy("k").agg(
        dsum("v").alias("s"), davg("v").alias("m"), F.count(F.lit(1)).alias("n")
    )
    assert _rows(fast) == _rows(slow)
