"""Golden assertions on the Wikidata micro-fixture (SURVEY §5.3.4):
the flatteners' semantics, independent of the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata2pg_spark.wikidata import flatten
from wikidata2pg_spark.wikidata.fixture import DUMP_LINES


def _latest(spark):
    raw = spark.createDataFrame([(l,) for l in DUMP_LINES], "line string")
    return flatten.latest_revisions(flatten.parse_entities(flatten.clean_dump_lines(raw)))


def test_dump_cleaning_drops_brackets_and_commas(spark):
    raw = spark.createDataFrame([(l,) for l in DUMP_LINES], "line string")
    cleaned = flatten.clean_dump_lines(raw)
    assert cleaned.count() == len(DUMP_LINES) - 2
    assert cleaned.filter(F.col("line").endswith(",")).count() == 0


def test_latest_revision_wins(spark):
    p = _latest(spark)
    q42 = p.filter(F.col("e.id") == "Q42").select("e.lastrevid", "e.labels").collect()
    assert len(q42) == 1
    assert q42[0]["lastrevid"] == 100  # rev 99 dropped


def test_truthy_prefers_preferred_and_drops_deprecated(spark):
    t = flatten.truthy_statements(_latest(spark))
    p800 = t.filter((F.col("id") == "Q42") & (F.col("property") == "P800")).collect()
    assert [r["rank"] for r in p800] == ["preferred"]  # normal sibling suppressed
    p569 = t.filter((F.col("id") == "Q1136") & (F.col("property") == "P569")).collect()
    assert [r["rank"] for r in p569] == ["normal"]  # deprecated excluded


def test_snaktype_nulls(spark):
    st = flatten.statements(_latest(spark))
    novalue = st.filter(F.col("snaktype") == "novalue").collect()
    assert {r["property"] for r in novalue} == {"P40"}
    assert all(r["dv"] is None for r in novalue)


def test_label_fallback_chain(spark):
    p = _latest(spark)
    lbl = F.col("e.labels")
    best = p.select(
        F.col("e.id").alias("id"),
        F.coalesce(lbl["en"]["value"], lbl["de"]["value"], lbl["es"]["value"], lbl["fr"]["value"]).alias("b"),
    ).collect()
    m = {r["id"]: r["b"] for r in best}
    assert m["Q1136"] == "ejemplo"  # no en -> es wins
    assert m["Q42"] == "Douglas Adams"


def test_qualifiers_flatten(spark):
    q = flatten.qualifiers_table(_latest(spark))
    rows = q.filter(F.col("subject") == "Q42").collect()
    assert {r["qual_property"] for r in rows} == {"P580", "P582"}
    assert all(r["qual_value"].startswith("+19") for r in rows)


def test_item_edges(spark):
    e = flatten.item_edges(_latest(spark))
    assert e.filter((F.col("src") == "Q1136") & (F.col("dst") == "Q42")).count() == 1
    # preferred AND normal both appear as edges (truthiness is a separate op)
    assert e.filter(F.col("property") == "P800").count() == 2


def test_datavalue_union_dispatch(spark):
    tr = flatten.claims_triples(_latest(spark))
    by_type = {
        r["value_type"]: r["value"]
        for r in tr.filter(F.col("value_type").isNotNull()).collect()
    }
    assert by_type["globecoordinate"] == "52.52,13.405"
    assert by_type["quantity"] == "+3644826"
    assert by_type["monolingualtext"] == "Ejemplo"
    assert by_type["string"] == "Ejemplo Commons"


def test_gz_dump_file_parse_equals_inline(spark, tmp_path):
    """End-to-end file-based ingestion: DUMP_LINES written as a real
    .json.gz dump file, read back through spark.read.text (gzip codec is
    inferred from the extension, exactly as for latest-all.json.gz), then
    run through the same clean -> parse -> latest pipeline. The result must
    be row-identical to the inline-literal parse that the t2 oracles use
    (VERDICT r1 "What's missing" #4)."""
    import gzip

    gz = tmp_path / "latest-all.json.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(DUMP_LINES) + "\n")

    raw = spark.read.text(str(gz)).withColumnRenamed("value", "line")
    from_file = flatten.latest_revisions(
        flatten.parse_entities(flatten.clean_dump_lines(raw))
    )
    inline = _latest(spark)

    a = sorted(
        from_file.select(
            F.col("e.id").alias("id"), F.col("e.type").alias("type"), F.col("e.lastrevid").alias("lastrevid")
        ).collect()
    )
    b = sorted(
        inline.select(
            F.col("e.id").alias("id"), F.col("e.type").alias("type"), F.col("e.lastrevid").alias("lastrevid")
        ).collect()
    )
    assert a == b and len(a) > 0
    # and the full flattened claim set matches too
    fa = sorted(map(tuple, flatten.claims_triples(from_file).collect()))
    fb = sorted(map(tuple, flatten.claims_triples(inline).collect()))
    assert fa == fb
