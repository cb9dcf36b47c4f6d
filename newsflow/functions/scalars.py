"""Deterministic aggregate / scalar expression helpers.

Why these exist: the correctness driver hash-compares Spark results against
DuckDB bit-for-bit. Two hazards make naive float aggregates flaky:

1. **Summation order.** ``sum(double)`` depends on partition order, which
   varies run-to-run under AQE. Fix: cast to an exact DECIMAL before
   summing — decimal addition is associative, so the sum is bit-identical
   regardless of plan. Source data here is ≤2-decimal money-like values,
   so a scale-4 decimal cast is lossless.

2. **Round-half ties.** Spark's ``round(double)`` rounds the *shortest
   decimal representation* (HALF_UP via ``BigDecimal.valueOf``), DuckDB
   rounds the *binary* value — e.g. 2.675 → 2.68 (Spark) vs 2.67 (DuckDB).
   Fix: nudge by +1e-9 before rounding on BOTH sides, pushing ties off the
   boundary in the same direction; legitimate value differences between
   engines are << 1e-9 because the inputs to the division are exact.

Each Spark helper has a ``sql_*`` twin that emits the equivalent DuckDB
expression, so a query builder and its oracle stay in lockstep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Epsilon used to align round-half behavior across engines (see module doc).
_EPS = 1e-9


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, out: int = 2, scale: int = 4) -> Column:
    """Order-independent exact sum, rounded to ``out`` decimals (double).

    ``+ 0.0`` normalizes IEEE -0.0 to +0.0 so hashes agree.
    """
    s = F.sum(_col(c).cast(f"decimal(25,{scale})"))
    return (F.round(s, out).cast("double") + F.lit(0.0))


def sql_dsum(expr: str, out: int = 2, scale: int = 4) -> str:
    return (
        f"(cast(round(sum(cast(({expr}) as decimal(25,{scale}))), {out}) "
        f"as double) + 0.0)"
    )


def davg(c: Column | str, out: int = 2, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum ÷ count, epsilon-rounded.

    Assumes the measure column is non-null (true for all testdata tables);
    use an explicit filter otherwise.
    """
    s = F.sum(_col(c).cast(f"decimal(25,{scale})")).cast("double")
    return F.round(s / F.count(F.lit(1)) + F.lit(_EPS), out) + F.lit(0.0)


def sql_davg(expr: str, out: int = 2, scale: int = 4) -> str:
    return (
        f"(round(cast(sum(cast(({expr}) as decimal(25,{scale}))) as double)"
        f"/count(*) + {_EPS}, {out}) + 0.0)"
    )


def davg_nullable(c: Column | str, out: int = 2, scale: int = 4) -> Column:
    """Deterministic mean over a NULLABLE measure: decimal-exact sum ÷
    non-null count (both engines' avg ignores nulls; count(col) matches)."""
    col = _col(c)
    s = F.sum(col.cast(f"decimal(25,{scale})")).cast("double")
    return F.round(s / F.count(col) + F.lit(_EPS), out) + F.lit(0.0)


def sql_davg_nullable(expr: str, out: int = 2, scale: int = 4) -> str:
    return (
        f"(round(cast(sum(cast(({expr}) as decimal(25,{scale}))) as double)"
        f"/count({expr}) + {_EPS}, {out}) + 0.0)"
    )


def dratio(num: Column, den: Column, out: int = 4) -> Column:
    """Deterministic ratio of two exact (integer/decimal-derived) doubles."""
    return F.round(num / den + F.lit(_EPS), out) + F.lit(0.0)


def dround(c: Column, out: int = 4) -> Column:
    """Epsilon-stabilized rounding for float-valued scalar expressions."""
    return F.round(c + F.lit(_EPS), out) + F.lit(0.0)


def sql_dround(expr: str, out: int = 4) -> str:
    return f"(round(({expr}) + {_EPS}, {out}) + 0.0)"


# ---------------------------------------------------------------------------
# Scalar expression library re-expressing the reference's pandas lambdas as
# native Spark columns (SURVEY.md §2.8 F1–F10). Each cites the behavior it
# reproduces.
# ---------------------------------------------------------------------------


def parse_compact_ts(c: Column | str) -> Column:
    """F1 — `yyyyMMddHHmmss` string → timestamp.

    Reference: gdelt/processing/build_datasets.py:9-11 (pandas
    ``pd.to_datetime(format="%Y%m%d%H%M%S")``); native Spark parse yields µs
    timestamps, eliminating the reference's nanosecond-parquet crash
    (transform_pandas_friendly_to_spark_friendly.py:17-21).
    """
    return F.to_timestamp(_col(c), "yyyyMMddHHmmss")


def split_semicolon(c: Column | str) -> Column:
    """F4 — null-safe `;`-split → trimmed non-empty array.

    Reference: build_datasets.py:19-22 (``[p.strip() for p in s.split(';')
    if p.strip()]``, None/"" → []).

    NOTE the one-arg lambda below is load-bearing: passing ``F.trim``
    directly would let ``transform`` call it with (element, index), and
    trim's two-arg form treats the second argument as the set of
    characters to strip — silently mangling digit-only elements. Found
    by tests/test_properties.py.
    """
    arr = F.split(F.coalesce(_col(c), F.lit("")), ";")
    return F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != "")


def parse_v2tone(c: Column | str, n: int = 7) -> list[Column]:
    """F5 — comma-separated floats → ``n`` doubles, pad/truncate, safe cast.

    Reference: build_datasets.py:24-37 (pad to 7 with None, unparseable →
    None). Under ANSI mode (Spark 4 default) plain cast/getItem throw, so
    this uses the null-safe ``F.get`` and ``try_cast`` — unparseable → null
    and short arrays pad with null, exactly the reference contract.
    """
    arr = F.split(F.coalesce(_col(c), F.lit("")), ",")
    return [
        F.trim(F.get(arr, i)).try_cast("double").alias(f"v2tone_{i + 1}")
        for i in range(n)
    ]


def url_tokens(c: Column | str) -> Column:
    """F6 — lowercase alnum tokens from a URL/text, drop empties and pure
    digits. Reference: build_datasets.py:47-51."""
    toks = F.split(F.lower(_col(c)), "[^a-z0-9]+")
    return F.filter(toks, lambda t: (t != "") & ~t.rlike("^[0-9]+$"))


def tokenize(c: Column | str) -> Column:
    """Generic lowercase alnum tokenization (empty tokens dropped)."""
    toks = F.split(F.lower(_col(c)), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


SQL_TOKENIZE = (
    "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), t -> t <> '')"
)


def keyword_flag_substring(c: Column | str, keywords: list[str]) -> Column:
    """F7 — substring-membership 0/1 flag, preserving the reference's quirk.

    Reference: build_datasets.py:53-55 — ``any(k in joined_tokens for k in
    keywords)`` matches *substrings* (keyword "io" hits any token containing
    "io"). Kept bit-for-bit for golden parity; see
    :func:`keyword_flag_token` for the corrected variant.
    """
    target = _col(c)
    conds = None
    for k in keywords:
        cond = target.contains(k)
        conds = cond if conds is None else (conds | cond)
    return F.when(conds, F.lit(1)).otherwise(F.lit(0)).cast("long")


def keyword_flag_token(tokens: Column, keywords: list[str]) -> Column:
    """Strict variant of F7: exact token equality, no substring bleed."""
    kw = F.array(*[F.lit(k) for k in keywords])
    return (
        F.when(F.arrays_overlap(tokens, kw), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
