"""Registered scalar-function queries (SURVEY.md §2.8 F1–F16) exercised
over the driver testdata, each with a DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from newsflow.functions.scalars import (
    davg,
    parse_compact_ts,
    parse_v2tone,
    split_semicolon,
    sql_davg,
)
from newsflow.registry import register
from newsflow.tables import load_table


@register(
    "timestamp_roundtrip",
    oracle="""
    SELECT event_id,
           strftime(strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S'),
                    '%Y-%m-%d %H:%M:%S') AS ts_str,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str
    FROM events
    WHERE event_id < 2000
    """,
    tags=("scalar", "datetime"),
)
def timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — compact `yyyyMMddHHmmss` timestamp parse + date truncation
    (build_datasets.py:9-11,75-76), round-tripped through formatting."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    compact = F.date_format("ts", "yyyyMMddHHmmss")
    return ev.select(
        "event_id",
        F.date_format(parse_compact_ts(compact), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_str"
        ),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day_str"),
    )


@register(
    "semicolon_split_stats",
    oracle="""
    SELECT doc_id,
           len(list_filter(list_transform(
                 string_split(replace(text, ' ', ';'), ';'), x -> trim(x)),
               x -> x <> '')) AS n_parts
    FROM documents
    """,
    tags=("scalar", "array"),
)
def semicolon_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F9 — null-safe semicolon split → trimmed array → size
    (build_datasets.py:19-22 themes/orgs parsing)."""
    docs = load_table(spark, sf_dir, "documents")
    semi = F.replace(F.col("text"), F.lit(" "), F.lit(";"))
    return docs.select(
        "doc_id", F.size(split_semicolon(semi)).alias("n_parts")
    )


@register(
    "csv_tone_parse",
    oracle="""
    SELECT event_id,
           (CAST(trim(parts[1]) AS DOUBLE) + 0.0) AS v2tone_1,
           (CAST(trim(parts[2]) AS DOUBLE) + 0.0) AS v2tone_2,
           (CAST(trim(parts[3]) AS DOUBLE) + 0.0) AS v2tone_3,
           CAST(trim(parts[4]) AS DOUBLE) AS v2tone_4
    FROM (
      SELECT event_id,
             string_split(concat(value, ',', user_id, ',', event_id), ',')
               AS parts
      FROM events WHERE event_id < 2000
    )
    """,
    tags=("scalar",),
)
def csv_tone_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — CSV-number parse with pad-to-N and safe cast
    (build_datasets.py:24-37 V2Tone parsing): slot 4 exercises the
    null-padding path."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    csv = F.concat_ws(",", "value", "user_id", "event_id")
    tones = parse_v2tone(csv, n=4)
    # Slots 1-3 are non-null here; +0.0 normalizes zero signs for hashing.
    return ev.select(
        "event_id",
        (tones[0] + F.lit(0.0)).alias("v2tone_1"),
        (tones[1] + F.lit(0.0)).alias("v2tone_2"),
        (tones[2] + F.lit(0.0)).alias("v2tone_3"),
        tones[3].alias("v2tone_4"),
    )


@register(
    "part_name_battery",
    oracle="""
    SELECT p_partkey,
           length(p_name) AS name_len,
           len(string_split(p_name, ' ')) AS n_name_words,
           string_split(p_name, ' ')[1] AS first_word,
           lower(p_type) AS type_lower,
           CASE WHEN contains(p_name, 'ro') THEN 1 ELSE 0 END AS k_ro
    FROM part
    WHERE p_partkey < 500
    """,
    tags=("scalar", "string"),
)
def part_name_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8/F9/F10 — string length, word split/count, first element,
    lowercase, substring-membership flag (the reference's keyword-flag
    quirk semantics, build_datasets.py:53-55)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.size(words).alias("n_name_words"),
        F.get(words, 0).alias("first_word"),
        F.lower("p_type").alias("type_lower"),
        F.when(F.col("p_name").contains("ro"), 1).otherwise(0).alias("k_ro"),
    )


@register(
    "regex_clean_battery",
    oracle="""
    SELECT doc_id,
           length(regexp_replace(regexp_replace(text, '[0-9]+', '', 'g'),
                                 ' +', ' ', 'g')) AS cleaned_len,
           len(list_filter(string_split(text, ' '), w -> length(w) > 4))
             AS n_long_words
    FROM documents
    """,
    tags=("scalar", "regex"),
)
def regex_clean_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/X3 — regexp_replace cleaning chain + array filter by element
    length (nlp_analysis.py:48-62 HTML cleaning, :142-144 short-token
    filter) as native expressions."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[0-9]+", ""), " +", " "
    )
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.length(cleaned).alias("cleaned_len"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias(
            "n_long_words"
        ),
    )


@register(
    "props_json_buckets",
    oracle=f"""
    SELECT (CAST(props->>'$.k' AS INT) // 10) AS k_bucket,
           count(*) AS n_events,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY 1
    """,
    tags=("scalar", "json", "agg"),
)
def props_json_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column functions: typed from_json extraction of the events
    props payload, bucketed aggregation. The schema'd parse stays
    JVM-side (JsonToStructs is codegen-friendly); prefer it over
    get_json_object when the shape is known — one parse, typed output."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return ev.groupBy(
        F.floor(k / 10).cast("long").alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        davg("value").alias("avg_value"),
    )


@register(
    "sql_entry_source_stats",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           {sql_davg('n_chars')} AS avg_chars
    FROM documents
    WHERE lang IN ('en', 'de', 'es')
    GROUP BY source
    HAVING count(*) >= 5
    ORDER BY avg_chars DESC, source
    """,
    tags=("sql-path", "agg", "having"),
)
def sql_entry_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-STRING entry path (SURVEY §3.2): register_views +
    spark.sql with WHERE/GROUP BY/HAVING/ORDER BY — parser → analyzer →
    same Catalyst plan as the DataFrame chain. The decimal-exact avg is
    inlined in SQL to stay hash-stable."""
    from newsflow.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT source,
               count(*) AS n_docs,
               (round(cast(sum(cast(n_chars as decimal(25,4))) as double)
                      / count(*) + 1e-9, 2) + 0.0) AS avg_chars
        FROM documents
        WHERE lang IN ('en', 'de', 'es')
        GROUP BY source
        HAVING count(*) >= 5
        ORDER BY avg_chars DESC, source
    """)
