"""Property tests (hypothesis) for the fragile scalar parsers — the
SURVEY §5 strategy item 3. Each Spark expression is compared elementwise
against a straight-Python transcription of the reference semantics
(build_datasets.py) over generated inputs. One DataFrame per example
(each example is a BATCH of strings) keeps Spark job count low.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from newsflow.functions.scalars import (
    keyword_flag_substring,
    parse_v2tone,
    split_semicolon,
    url_tokens,
)

SETTINGS = settings(max_examples=12, deadline=None)

# Building blocks: decimal-literal tokens (engine-dialect-neutral),
# garbage tokens, empties, whitespace.
_num = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda f: f"{f:.4f}")
_garbage = st.sampled_from(["abc", "12.5.3", "--", "1a", "", "  "])
_tone_token = st.one_of(_num, _garbage)
_tone_string = st.one_of(
    st.none(),
    st.lists(_tone_token, min_size=0, max_size=10).map(",".join),
)

_word = st.text(
    alphabet="abcdefghijklmnop QRS0123", min_size=0, max_size=8
)
_semi_string = st.one_of(
    st.none(),
    st.lists(_word, min_size=0, max_size=8).map(";".join),
)

_urlish = st.text(
    alphabet="abcXYZ0123:/.-_?&=%", min_size=0, max_size=40
)


# --- Python transcriptions of the reference semantics ----------------------


def _ref_v2tone(s: str | None, n: int = 7) -> list[float | None]:
    parts = [p.strip() for p in (s or "").split(",")]
    out: list[float | None] = []
    for i in range(n):
        try:
            out.append(float(parts[i]))
        except (IndexError, ValueError):
            out.append(None)
    return out


def _ref_split_semicolon(s: str | None) -> list[str]:
    return [p.strip() for p in (s or "").split(";") if p.strip()]


def _ref_url_tokens(s: str) -> list[str]:
    toks = re.split(r"[^a-z0-9]+", s.lower())
    return [t for t in toks if t and not re.fullmatch(r"[0-9]+", t)]


def _ref_flag(joined: str, keywords: list[str]) -> int:
    return int(any(k in joined for k in keywords))


# --- properties -------------------------------------------------------------


@SETTINGS
@given(st.lists(_tone_string, min_size=1, max_size=25))
def test_parse_v2tone_matches_reference(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    got = df.select(*parse_v2tone("s")).collect()
    for s, row in zip(batch, got):
        want = _ref_v2tone(s)
        have = [row[i] for i in range(7)]
        assert have == want, (s, have, want)


@SETTINGS
@given(st.lists(_semi_string, min_size=1, max_size=25))
def test_split_semicolon_matches_reference(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    got = df.select(split_semicolon("s").alias("a")).collect()
    for s, row in zip(batch, got):
        assert row["a"] == _ref_split_semicolon(s), s


@SETTINGS
@given(st.lists(_urlish, min_size=1, max_size=25))
def test_url_tokens_matches_reference(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    got = df.select(url_tokens("s").alias("a")).collect()
    for s, row in zip(batch, got):
        assert row["a"] == _ref_url_tokens(s), s


@SETTINGS
@given(
    st.lists(_urlish, min_size=1, max_size=20),
    st.lists(
        st.text(alphabet="abcx0", min_size=1, max_size=4),
        min_size=1,
        max_size=4,
    ),
)
def test_keyword_flag_substring_matches_reference(spark, batch, keywords):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    joined_expr = F.array_join(url_tokens("s"), " ")
    got = df.select(
        keyword_flag_substring(joined_expr, keywords).alias("k")
    ).collect()
    for s, row in zip(batch, got):
        joined = " ".join(_ref_url_tokens(s))
        assert row["k"] == _ref_flag(joined, keywords), (s, keywords)


# --- F3: PSL when-chain vs the pure-Python twin of the same algorithm ------

from newsflow.etl.gdelt import registrable_domain  # noqa: E402
from newsflow.etl.psl import (  # noqa: E402
    icann_rules,
    private_rules,
    registrable_domain_py,
)

# Sample suffixes from every rule SHAPE: normal 1/2/3-label, wildcard
# families (any label under *.ck / *.kawasaki.jp), exception hosts, and
# private-domain suffixes (exercised with include_private on AND off).
# ASCII-only: hypothesis hosts go through parse_url, which is exercised
# on the (ascii) URL grammar; unicode rules are covered by the snapshot
# loader test.
_plain_suffixes = tuple(
    r
    for r in icann_rules() + private_rules()
    if not r.startswith(("*.", "!")) and r.isascii()
)
_wild_parents = tuple(
    r[2:] for r in icann_rules() if r.startswith("*.") and r.isascii()
)
_label = st.sampled_from(["news", "blog9", "x", "sub", "city", "www"])
_suffix = st.one_of(
    st.sampled_from(_plain_suffixes),
    st.builds(lambda lbl, p: f"{lbl}.{p}", _label,
              st.sampled_from(_wild_parents)),
    st.just("unknowntld"),
)
_host = st.builds(
    lambda labels, suffix: ".".join(labels + [suffix]),
    st.lists(_label, min_size=0, max_size=3),
    _suffix,
)


@SETTINGS
@given(st.lists(_host, min_size=1, max_size=25), st.booleans())
def test_registrable_domain_matches_psl_twin(spark, batch, private):
    df = spark.createDataFrame(
        [(f"https://{h}/a/b?q=1",) for h in batch], "url string"
    )
    # Name-based fast path: the Column path would recompile ~9.5k rule
    # literals per hypothesis example (~4 s each); the SQL-text compile
    # is cached across examples. Path equivalence is pinned separately
    # in tests/test_psl.py::test_sql_fast_path_equals_column_path.
    got = df.select(
        registrable_domain("url", include_private=private).alias("d")
    ).collect()
    for h, row in zip(batch, got):
        assert row["d"] == registrable_domain_py(h, include_private=private), (
            h,
            private,
        )
