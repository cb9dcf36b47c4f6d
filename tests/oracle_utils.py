"""Local rehearsal of the correctness driver's Spark-vs-DuckDB comparison.

Mirrors the driver semantics: sort columns by name, compare row count,
column names, and values order-insensitively. Comparison here is EXACT
(no float tolerance) — the driver hashes values, so any bit drift that
would fail the gate must fail these tests too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        # Unify integer dtypes (Spark int32 vs DuckDB int64 etc.).
        if pd.api.types.is_integer_dtype(pdf[c].dtype):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_parity(
    sdf: DataFrame, oracle: str, con: duckdb.DuckDBPyConnection, name: str = "?"
) -> None:
    spdf = normalize(sdf.toPandas())
    opdf = normalize(con.execute(oracle).df())

    assert list(spdf.columns) == list(opdf.columns), (
        f"[{name}] column mismatch: spark={list(spdf.columns)} "
        f"oracle={list(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), (
        f"[{name}] row count mismatch: spark={len(spdf)} oracle={len(opdf)}"
    )
    for c in spdf.columns:
        a, b = spdf[c].to_numpy(), opdf[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            # Also require bit-identical zero signs (hash-relevant).
            sign_ok = np.signbit(a) == np.signbit(b)
            bad = ~(same & sign_ok)
        else:
            bad = ~(pd.Series(a).eq(pd.Series(b)).to_numpy())
        if bad.any():
            i = int(np.argmax(bad))
            raise AssertionError(
                f"[{name}] value mismatch in column {c!r} at sorted row {i}: "
                f"spark={a[i]!r} oracle={b[i]!r} "
                f"({int(bad.sum())} mismatched rows)"
            )
