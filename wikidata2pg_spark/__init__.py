"""wikidata2pg_spark — a PySpark-native analytics engine with the capability
surface of ``Xevib/wikidata2pg`` (Wikidata JSON dump → normalized relational
tables → Postgres), generalized into a full operator suite per SURVEY.md §2.

Not a port: execution is pure DataFrame/Catalyst/Structured Streaming.
The reference checkout was empty at survey time (SURVEY.md §0); capability
claims derive from the driver contract (BASELINE.json) and the published
Wikibase JSON spec.
"""

from wikidata2pg_spark.registry import all_queries, all_oracles  # noqa: F401
from wikidata2pg_spark.session import configure_session, get_session  # noqa: F401
