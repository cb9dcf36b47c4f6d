"""Public-Suffix-List registrable-domain (eTLD+1) engine — F3 at full
fidelity.

The reference calls ``tldextract.extract`` (gdelt/processing/
build_datasets.py:13-17), which implements the publicsuffix.org
algorithm over the PSL rule file: normal rules, wildcard rules
(``*.ck``), exception rules (``!www.ck``), longest match wins,
exceptions beat everything, unknown TLD → no suffix (domain = last
label). tldextract's *default* extractor excludes the PSL "private
domains" section (``github.io``, ``blogspot.com``, …) — so
``foo.github.io`` → ``github.io`` by default and ``foo.github.io`` only
with ``include_psl_private_domains=True``. Both modes are supported
here via ``include_private``.

Rule data: the FULL publicsuffix.org snapshot (MPL-2.0 data; never
fetched at runtime) vendored at ``newsflow/etl/data/
public_suffix_list.dat`` — ~7.4k ICANN + ~2.1k private rules, parsed
once per process. Round 2 shipped a curated subset; round 3 vendors
the whole file (the compiler was rule-driven from the start, so this
was a data-only change).

Host-equals-suffix semantics (reference parity, ADVICE r2): for a host
that IS a public suffix (``co.uk``, ``foo.ck`` under ``*.ck``),
tldextract yields domain='' and the reference's ``get_domain`` returns
``f"{ext.domain}.{ext.suffix}"`` → a leading-dot ``.{suffix}``. This
engine reproduces exactly that (``.co.uk``), rather than the host
itself as round 2 did.

Execution model (100 TB note): the rule set compiles ONCE (driver-side)
into a single ``when``-chain — one branch per (rule kind × suffix label
count), ~12 branches total — over ``isin`` literal sets. Catalyst turns
a large ``isin`` into an ``InSet`` hash probe (a set object referenced
from generated code, not inlined literals), so per-row cost is O(rule
shapes), fully JVM-side, zero shuffle, codegen-friendly even at the
full ~9.5k rules — strictly cheaper than the explode + broadcast-join
alternative, which would add a 4× row blowup and a join per batch.
Measured at the full snapshot (local[8], 4M synthetic hosts): SQL-text
compile ~10 ms, first run incl. parse+analyze+codegen 4.1 s, warm
throughput 1.5M rows/s (~190k rows/s/core) with whole-stage codegen
intact — tests/test_psl.py pins both the compile-time and codegen
properties.
"""

from __future__ import annotations

from collections import defaultdict
from functools import lru_cache
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Column

_PSL_DATA = Path(__file__).parent / "data" / "public_suffix_list.dat"


@lru_cache(maxsize=1)
def _load_snapshot() -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(icann_rules, private_rules) from the vendored PSL file.

    Rule syntax as in the file: plain rule, ``*.`` wildcard, ``!``
    exception; ``//`` comments and blank lines skipped; the two
    ``===BEGIN/END <SECTION> DOMAINS===`` sentinels split ICANN from
    private rules.
    """
    icann: list[str] = []
    private: list[str] = []
    section: list[str] | None = None
    for raw in _PSL_DATA.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if "===BEGIN ICANN DOMAINS===" in line:
            section = icann
            continue
        if "===BEGIN PRIVATE DOMAINS===" in line:
            section = private
            continue
        if "===END" in line:
            section = None
            continue
        if not line or line.startswith("//") or section is None:
            continue
        section.append(line.lower())
    if not icann:
        raise RuntimeError(f"no ICANN rules parsed from {_PSL_DATA}")
    return tuple(icann), tuple(private)


def icann_rules() -> tuple[str, ...]:
    return _load_snapshot()[0]


def private_rules() -> tuple[str, ...]:
    return _load_snapshot()[1]


def _parse(rules: tuple[str, ...]) -> tuple[dict, dict, dict]:
    """Split rules into (exceptions, wildcards, normals) keyed by the
    label count of the *matched suffix*."""
    exc: dict[int, set[str]] = defaultdict(set)
    wild: dict[int, set[str]] = defaultdict(set)  # key: suffix len m; value: parents (m-1 labels)
    norm: dict[int, set[str]] = defaultdict(set)
    for rule in rules:
        if rule.startswith("!"):
            body = rule[1:]
            exc[body.count(".") + 1].add(body)
        elif rule.startswith("*."):
            parent = rule[2:]
            wild[parent.count(".") + 2].add(parent)
        else:
            norm[rule.count(".") + 1].add(rule)
    return dict(exc), dict(wild), dict(norm)


@lru_cache(maxsize=2)
def _rule_tables(include_private: bool) -> tuple[dict, dict, dict]:
    icann, private = _load_snapshot()
    rules = icann + (private if include_private else ())
    return _parse(rules)


def _sql_quote(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


@lru_cache(maxsize=8)
def _chain_sql(host_sql: str, include_private: bool) -> str:
    """The full PSL when-chain as ONE Spark-SQL expression string.

    Why SQL text instead of Column-API construction: ``Column.isin``
    converts each of the ~9.5k rule literals through an individual py4j
    call (~4 s of driver time PER compiled chain, measured), while the
    SQL parser swallows the same IN-lists in ~10 ms — and both produce
    the identical InSet plan. The labels array is bound once via a
    single-element ``transform`` lambda so ``split`` runs once per row.
    """
    exc, wild, norm = _rule_tables(include_private)

    def tail(k: int) -> str:
        gets = ", ".join(
            f"get(l, size(l) - {i})" for i in range(k, 0, -1)
        )
        return f"concat_ws('.', {gets})"

    def in_list(values: set[str]) -> str:
        return "(" + ", ".join(_sql_quote(v) for v in sorted(values)) + ")"

    def domain_plus_suffix(m: int) -> str:
        return (
            f"IF(size(l) > {m}, {tail(m + 1)}, concat('.', {tail(m)}))"
        )

    branches: list[str] = []
    for m in sorted(exc, reverse=True):
        branches.append(
            f"WHEN size(l) >= {m} AND {tail(m)} IN {in_list(exc[m])} "
            f"THEN {tail(m)}"
        )
    for m in sorted(set(wild) | set(norm), reverse=True):
        if m in wild:
            branches.append(
                f"WHEN size(l) >= {m} AND {tail(m - 1)} IN "
                f"{in_list(wild[m])} THEN {domain_plus_suffix(m)}"
            )
        if m in norm:
            branches.append(
                f"WHEN size(l) >= {m} AND {tail(m)} IN "
                f"{in_list(norm[m])} THEN {domain_plus_suffix(m)}"
            )
    case = (
        "CASE " + " ".join(branches) + " ELSE get(l, size(l) - 1) END"
    )
    return (
        f"get(transform(array(split({host_sql}, '\\\\.')), l -> {case}), 0)"
    )


def registrable_domain_psl(
    host: Column | str, include_private: bool = False
) -> Column:
    """Registered domain (eTLD+1) of a lowercase hostname column by the
    full PSL algorithm, compiled to one when-chain over InSet probes.

    ``host`` as a string (column name or SQL expression) takes the fast
    SQL-text compile path (~10 ms, cached); a ``Column`` falls back to
    Column-API construction, which is semantically identical but pays
    ~4 s of py4j literal conversion per call — prefer the name form in
    anything called per-query (tests/test_psl.py pins both paths equal).

    ``include_private=False`` matches the reference's default-config
    ``tldextract`` exactly (build_datasets.py:13-17). Unknown TLD →
    last label (tldextract's empty-suffix fallback); a host that IS a
    public suffix → ``.{suffix}`` (the reference get_domain's
    empty-domain output).
    """
    if isinstance(host, str):
        return F.expr(_chain_sql(host, include_private))
    exc, wild, norm = _rule_tables(include_private)
    labels = F.split(host, "\\.")
    n = F.size(labels)

    def last_k(k: int) -> Column:
        # concat_ws skips the nulls produced by negative indexes, so a
        # host shorter than k degrades to the whole host.
        return F.concat_ws(
            ".", *[F.get(labels, n - F.lit(i)) for i in range(k, 0, -1)]
        )

    def domain_plus_suffix(m: int) -> Column:
        # Matched suffix = last m labels. One label to its left → eTLD+1;
        # none → ".{suffix}" (reference get_domain on empty domain).
        return F.when(n > m, last_k(m + 1)).otherwise(
            F.concat(F.lit("."), last_k(m))
        )

    chain = None

    def add(cond: Column, value: Column):
        nonlocal chain
        chain = F.when(cond, value) if chain is None else chain.when(cond, value)

    # 1. Exception rules beat everything (PSL spec): matched rule minus
    #    its leftmost label is the suffix → domain = the matched labels.
    for m in sorted(exc, reverse=True):
        add((n >= m) & last_k(m).isin(*sorted(exc[m])), last_k(m))
    # 2. Longest match among wildcard + normal rules, interleaved by
    #    suffix label count. A wildcard of suffix-length m outranks a
    #    normal rule of length < m and loses to any rule of length > m.
    for m in sorted(set(wild) | set(norm), reverse=True):
        if m in wild:  # "*.parent": parent has m-1 labels, so m >= 2
            add(
                (n >= m) & last_k(m - 1).isin(*sorted(wild[m])),
                domain_plus_suffix(m),
            )
        if m in norm:
            add((n >= m) & last_k(m).isin(*sorted(norm[m])), domain_plus_suffix(m))
    # 3. No rule matched: tldextract returns suffix="" and domain = the
    #    last label.
    return chain.otherwise(F.get(labels, n - 1))


# --------------------------------------------------------------------------
# Pure-Python twin of the same algorithm over the same snapshot — the
# property-test oracle (tests/test_psl.py) mirroring tldextract semantics.
# --------------------------------------------------------------------------


def registrable_domain_py(host: str, include_private: bool = False) -> str:
    exc, wild, norm = _rule_tables(include_private)
    labels = host.lower().split(".")
    nn = len(labels)

    def tail(k: int) -> str:
        return ".".join(labels[-k:])

    def domain_plus_suffix(m: int) -> str:
        return tail(m + 1) if nn > m else "." + tail(m)

    for m in sorted(exc, reverse=True):
        if nn >= m and tail(m) in exc[m]:
            return tail(m)
    for m in sorted(set(wild) | set(norm), reverse=True):
        if m in wild and nn >= m and tail(m - 1) in wild[m]:
            return domain_plus_suffix(m)
        if m in norm and nn >= m and tail(m) in norm[m]:
            return domain_plus_suffix(m)
    return labels[-1]
