"""Query registry — the single source of truth wired into __spark_entry__.py.

Each operator from SURVEY.md §2 registers itself with::

    @query("q_agg_basic", oracle="SELECT ... FROM lineitem ...")
    def q_agg_basic(spark, sf_dir): ...

``oracle=None`` means the driver records a rows-only check (approx ops,
streaming semantics, JDBC sinks — per __spark_entry__.py contract).

Oracle-stability rules (FIXTURES.md) apply to every pair:
  * every floating aggregate rounded to 2 decimals on BOTH sides;
  * every ORDER BY feeding row_number/LIMIT ends with a unique tiebreaker;
  * UTC session timezone; events ts normalized to µs;
  * approx_* declared without oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


def _load_modules() -> None:
    """Import every module that registers queries (idempotent).

    Registration order IS the driver's t2 execution order: the families
    that had no CORRECTNESS_r01 rows (wikidata, llm, streaming, udf,
    sources — the r1 run timed out before reaching them) register FIRST so
    a truncated run proves the unproven keys before re-proving the ones
    that already passed."""
    import wikidata2pg_spark.wikidata.queries  # noqa: F401
    import wikidata2pg_spark.llm.dedup  # noqa: F401
    import wikidata2pg_spark.llm.similarity  # noqa: F401
    import wikidata2pg_spark.llm.text  # noqa: F401
    import wikidata2pg_spark.llm.multimodal  # noqa: F401
    import wikidata2pg_spark.llm.sampling  # noqa: F401
    import wikidata2pg_spark.streaming.queries  # noqa: F401
    import wikidata2pg_spark.udf.queries  # noqa: F401
    import wikidata2pg_spark.sources.scans  # noqa: F401
    import wikidata2pg_spark.functions.scalar  # noqa: F401
    import wikidata2pg_spark.functions.semi_structured  # noqa: F401
    import wikidata2pg_spark.operators.relational  # noqa: F401
    import wikidata2pg_spark.operators.joins  # noqa: F401
    import wikidata2pg_spark.operators.windows  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return dict(_ORACLES)
