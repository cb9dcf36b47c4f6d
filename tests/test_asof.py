"""asof_join semantics on hand-built frames: boundary equality (ts ==
right ts matches), strictly-later right rows invisible, carry-forward
across gaps, unmatched-left nulls, key isolation."""

from __future__ import annotations

from newsflow.ops.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, 100),  # before any update → null
            (2, 1, 200),  # exactly at update ts 200 → matches v=20
            (3, 1, 250),  # between updates → still v=20
            (4, 1, 300),  # at second update → v=30
            (5, 2, 999),  # key 2 has no updates → null
        ],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(1, 200, 20.0), (1, 300, 30.0)],
        "k long, rt long, v double",
    )
    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            value_cols=["v"],
        ).collect()
    }
    assert out == {1: None, 2: 20.0, 3: 20.0, 4: 30.0, 5: None}
