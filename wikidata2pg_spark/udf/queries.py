"""UDF / UDAF / UDTF surface (§2.10 D1-D4).

UDFs are the slow path (SURVEY §4): D1 exists to prove the row-UDF surface,
but D2/D3 are Arrow-batched pandas UDFs — the only Python execution shape
acceptable in a hot path — and D4 is the table-function surface. Every
query here has a pure-SQL oracle so the Python results are value-checked
against a JVM-free reference.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_udf_python",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal IS NULL THEN NULL
            WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'ok'
            ELSE 'rich' END AS bal_class
FROM customer
""",
)
def q_udf_python(spark, sf_dir):
    c = load(spark, sf_dir, "customer")

    @udf("string")
    def bal_class(b: float) -> str:
        # NULL balance classifies as NULL on both sides (r7 NULL-measure
        # sweep: `None < 0` raised a TypeError in the worker, while the
        # oracle's CASE would have silently fallen through to 'rich')
        if b is None:
            return None
        if b < 0:
            return "debt"
        if b < 5000:
            return "ok"
        return "rich"

    return c.select("c_custkey", bal_class("c_acctbal").alias("bal_class"))


@query(
    "q_udf_arrow_python",
    oracle="""
SELECT p_partkey,
       upper(substring(p_name, 1, 3)) || '-' || CAST(p_size AS VARCHAR) AS sku
FROM part
""",
)
def q_udf_arrow_python(spark, sf_dir):
    """Arrow-optimized Python UDF (r2 extra): ``udf(..., useArrow=True)`` —
    row-function ergonomics with Arrow-batched transfer (the Spark 4
    middle ground between the pickled row UDF D1 and the pandas UDF D2;
    same per-row Python cost, ~10x cheaper serialization)."""
    p = load(spark, sf_dir, "part")

    @udf("string", useArrow=True)
    def sku(name: str, size: int) -> str:
        return f"{name[:3].upper()}-{size}"

    return p.select("p_partkey", sku("p_name", "p_size").alias("sku"))


@query(
    "q_udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
FROM lineitem
WHERE l_orderkey < 4000
""",
)
def q_udf_pandas_scalar(spark, sf_dir):
    # Arrow-vectorized: one pandas batch per Arrow batch, ~100x a row UDF.
    # round at 6: the product of 2dp*2dp*2dp values has <=6 exact decimals,
    # so 6dp rounding is the identity on the decimal — no true .5 ties for
    # the engines to break differently (4dp DID tie: 73 flips at sf0.01).
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)

    @pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charged("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


@query(
    "q_udaf_pandas_agg",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udaf_pandas_agg(spark, sf_dir):
    """Custom UDAF (quantity-weighted mean price) as a grouped-agg pandas UDF."""
    li = load(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price")
    )


@query(
    "q_udtf_python",
    oracle="""
SELECT r_regionkey, CAST(i - 1 AS BIGINT) AS pos, t[i] AS word
FROM (SELECT r_regionkey, string_split(r_name, ' ') AS t FROM region), range(1, 3) r(i)
WHERE i <= len(t)
""",
)
def q_udtf_python(spark, sf_dir):
    """Python UDTF: one region row in → one row per name word out (lateral)."""

    @udtf(returnType="pos BIGINT, word STRING")
    class SplitWords:
        def eval(self, name: str):
            for i, w in enumerate(name.split(" ")):
                yield i, w

    r = load(spark, sf_dir, "region")
    return r.lateralJoin(SplitWords(F.col("r_name").outer())).select("r_regionkey", "pos", "word")


@query(
    "q_udf_grouped_map",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber,
       round(l_extendedprice - avg(l_extendedprice) OVER (PARTITION BY l_returnflag), 2)
           AS price_centered
FROM lineitem
WHERE l_orderkey < 8000
""",
)
def q_udf_grouped_map(spark, sf_dir):
    """Grouped-map ``applyInPandas``: per-group mean-centering, the shape
    custom per-group Python transforms take (one pandas frame per group in,
    one out — Arrow both ways). This completes the Python-execution family
    next to scalar (D2), grouped-agg (D3), table function (D4), and the
    cogrouped kernel (cosine). The oracle states the same centering with a
    window aggregate — proving the Python path computes exactly what the
    declarative form would. At scale each group must fit one executor's
    memory: fine for bounded group counts/sizes like the 3-flag split here;
    unbounded groups belong in window/agg form instead (documented
    tradeoff)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 8000)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_returnflag", "l_orderkey", "l_linenumber"]].copy()
        centered = pdf["l_extendedprice"] - pdf["l_extendedprice"].mean()
        out["price_centered"] = centered.round(2)
        return out

    return li.groupBy("l_returnflag").applyInPandas(
        center,
        "l_returnflag string, l_orderkey long, l_linenumber long, price_centered double",
    )


@query(
    "q_udf_map_in_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net
FROM lineitem
WHERE l_orderkey < 4000
""",
)
def q_udf_map_in_arrow(spark, sf_dir):
    """mapInArrow — the zero-copy floor of the Python UDF surface: batches
    arrive as pyarrow RecordBatches and results return as RecordBatches,
    with no pandas materialization in between (pandas UDFs pay a
    Arrow→pandas→Arrow conversion per batch; for pure-numeric kernels
    pyarrow.compute on the batch is the cheapest possible Python hop).
    The kernel computes net price with arrow compute ops only. Per-batch
    work is bounded by spark.sql.execution.arrow.maxRecordsPerBatch —
    at 100 TB this is the knob that caps Python-side memory."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 4000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )

    def net_price(batches):
        for batch in batches:
            gross = pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            )
            net = pc.divide(
                pc.floor(pc.add(pc.multiply(gross, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.scalar(100.0),
            )
            # l_linenumber scans as int32 — cast to the declared BIGINT
            # (mapInArrow does NO coercion: the arrow type must match the
            # declared schema exactly or the JVM reader throws)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    pc.cast(batch.column("l_linenumber"), pa.int64()),
                    net,
                ],
                names=["l_orderkey", "l_linenumber", "net"],
            )

    return li.mapInArrow(net_price, "l_orderkey BIGINT, l_linenumber BIGINT, net DOUBLE")
