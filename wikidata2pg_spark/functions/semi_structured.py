"""Semi-structured scalar packs (§2.8 F6-F9): arrays + higher-order
functions, maps, JSON (path + typed + Variant), hashes.

These are the building blocks the Wikidata surface (§2.11) reuses: the
entity dump is open-schema JSON, so array/map/json kernels must be exact.
All higher-order work stays in Catalyst expressions (transform/aggregate/
zip_with/filter are codegen'd JVM lambdas, not Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_fn_array",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_toks,
       list_contains(t, 'the') AS has_the,
       coalesce(array_to_string(t[1:3], ','), '') AS first3,
       coalesce(array_to_string(list_sort(list_distinct(t[1:5])), ','), '') AS head_vocab,
       CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
       coalesce(array_to_string(list_filter(t[1:10], x -> x LIKE 'a%'), ','), '') AS head_a_words,
       coalesce(array_to_string(list_transform(t[1:4], x -> CAST(2 * length(x) AS BIGINT)), ','), '') AS doubled_lens
FROM toks
""",
)
def q_fn_array(spark, sf_dir):
    # Array results are projected to joined STRINGs: the driver's comparator
    # cannot canonicalize array cells (r1 A12 lesson — no array/map/struct
    # columns in any hash-checked output). The array kernels under test are
    # unchanged; only the final projection flattens. DuckDB's
    # array_to_string([]) is NULL where Spark's array_join is '' → coalesce.
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_toks"),
        F.array_contains(t, "the").alias("has_the"),
        F.array_join(F.slice(t, 1, 3), ",").alias("first3"),
        F.array_join(F.array_sort(F.array_distinct(F.slice(t, 1, 5))), ",").alias("head_vocab"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(F.filter(F.slice(t, 1, 10), lambda x: x.like("a%")), ",").alias(
            "head_a_words"
        ),
        F.array_join(
            F.zip_with(
                F.slice(t, 1, 4),
                F.slice(t, 1, 4),
                lambda x, y: (F.length(x) + F.length(y)).cast("long").cast("string"),
            ),
            ",",
        ).alias("doubled_lens"),
    )


@query(
    "q_fn_explode",
    oracle="""
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS tok
FROM (SELECT doc_id, string_split(text, ' ')[1:5] AS t FROM documents), range(1, 6) r(i)
WHERE i <= len(t)
""",
)
def q_fn_explode(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.slice(F.split(F.col("text"), " "), 1, 5)
    return d.select("doc_id", F.posexplode(t).alias("pos", "tok")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "tok"
    )


@query(
    "q_fn_map",
    oracle="""
SELECT doc_id,
       'lang,src' AS keys_sorted,
       lang AS v_lang,
       CAST(2 AS BIGINT) AS n_entries,
       array_to_string(list_sort([lang, source]), ',') AS vals_sorted,
       source AS v_src_from_entries
FROM documents
""",
)
def q_fn_map(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source"))
    m2 = F.map_from_entries(
        F.array(
            F.struct(F.lit("lang").alias("k"), F.col("lang").alias("v")),
            F.struct(F.lit("src").alias("k"), F.col("source").alias("v")),
        )
    )
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "lang").alias("v_lang"),
        F.size(m).cast("long").alias("n_entries"),
        F.array_join(F.array_sort(F.map_values(m)), ",").alias("vals_sorted"),
        F.element_at(m2, "src").alias("v_src_from_entries"),
    )


@query(
    "q_fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       json_extract(props, '$.k')::BIGINT AS k_typed,
       json(props)::VARCHAR AS compact,
       json_extract(props, '$.k')::BIGINT AS k_variant
FROM events
""",
)
def q_fn_json(spark, sf_dir):
    # Four access paths over the same JSON column: string path extraction,
    # typed from_json, to_json round-trip, and the Variant kernel
    # (parse_json/variant_get) — the schema-flexible path the wikidata raw
    # layer uses when a field isn't in the fixed schema.
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), StructType([StructField("k", IntegerType())]))
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed.getField("k").cast("long").alias("k_typed"),
        F.to_json(parsed).alias("compact"),
        F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long").alias("k_variant"),
    )


@query(
    "q_fn_hash",
    oracle="""
SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
FROM part
""",
)
def q_fn_hash(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name")).alias("h_md5"),
        F.sha2(F.col("p_name"), 256).alias("h_sha256"),
    )


@query("q_fn_hash_spark_native", oracle=None)  # crc32/xxhash64 have no DuckDB twin
def q_fn_hash_spark_native(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.crc32(F.col("p_name")).alias("h_crc32"),
        F.xxhash64(F.col("p_name")).alias("h_xxhash64"),
        F.hash(F.col("p_name")).alias("h_murmur3"),
    )


@query(
    "q_fn_array_setops",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')[1:8]) AS a,
         list_distinct(string_split(text, ' ')[5:12]) AS b
  FROM documents
)
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(a || b)), ','), '') AS u,
       coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS i,
       coalesce(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '') AS d
FROM t
""",
)
def q_fn_array_setops(spark, sf_dir):
    """Array set operations (union/intersect/except) over token windows —
    flattened to sorted joined strings for the comparator (r1 A12 rule)."""
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    a = F.array_distinct(F.slice(t, 1, 8))
    b = F.array_distinct(F.slice(t, 5, 8))
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("u"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("i"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("d"),
    )


@query(
    "q_fn_struct",
    oracle="""
SELECT o_orderkey,
       ({'pri': o_orderpriority,
         'cents': CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)}).pri
         AS pri_out,
       ({'pri': o_orderpriority,
         'cents': CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)}).cents
         AS cents_out,
       CASE WHEN {'a': o_custkey, 'b': o_orderkey}
                 < {'a': o_custkey, 'b': o_orderkey + 1}
            THEN 1 ELSE 0 END AS lt_flag
FROM orders
WHERE o_orderkey < 3000
""",
)
def q_fn_struct(spark, sf_dir):
    """Struct scalar pack: construction (named_struct), field access,
    and lexicographic struct comparison — the nested-type surface the
    array/map/json packs (F6-F8) did not yet cover. The struct itself
    is not emitted (Row-vs-dict canonicalization differs across
    engines); both FIELDS are read back out through the constructed
    struct, which pins construction + access end-to-end. Struct ordering is
    field-by-field left-to-right in both engines (SQL row-value
    semantics), exercised here with a constructed pair that differs
    only in the second field. All integer/string — nothing to round.
    Map-only projection, no shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    info = F.struct(
        F.col("o_orderpriority").alias("pri"), cents.alias("cents")
    )
    a = F.struct(
        F.col("o_custkey").alias("a"), F.col("o_orderkey").alias("b")
    )
    b = F.struct(
        F.col("o_custkey").alias("a"), (F.col("o_orderkey") + 1).alias("b")
    )
    return o.select(
        "o_orderkey",
        info.getField("pri").alias("pri_out"),
        info.getField("cents").alias("cents_out"),
        F.when(a < b, 1).otherwise(0).alias("lt_flag"),
    )
