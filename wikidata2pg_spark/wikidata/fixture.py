"""Inline Wikidata entity micro-fixture (FIXTURES.md "Wikidata entity
micro-fixture"): the shape of `latest-all.json` dump lines per the published
Wikibase JSON spec. No driver-generated table exists for this domain, so the
queries build a DataFrame from these literals and the DuckDB oracles read
the SAME literals through a generated VALUES clause — one source of truth.

Coverage demanded by SURVEY §2.11: multiple languages, a no-`en` entity
(label fallback), somevalue/novalue snaks, a deprecated rank, preferred-vs-
normal (truthy), qualifiers, a property entity, coordinates, quantities,
monolingualtext, item→item edges, and a stale revision of an id (K11).
"""

from __future__ import annotations

import json

_E = [
    # Q42 rev 100 — multi-lang labels, aliases, preferred+normal ranks (truthy),
    # time value, qualifier on P69.
    {
        "id": "Q42",
        "type": "item",
        "lastrevid": 100,
        "labels": {
            "en": {"language": "en", "value": "Douglas Adams"},
            "fr": {"language": "fr", "value": "Douglas Adams"},
            "de": {"language": "de", "value": "Douglas Adams"},
        },
        "descriptions": {"en": {"language": "en", "value": "English writer"}},
        "aliases": {
            "en": [
                {"language": "en", "value": "Douglas Noel Adams"},
                {"language": "en", "value": "DNA"},
            ]
        },
        "claims": {
            "P31": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P31",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q5"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                    # provenance layer: stated-in (P248) + retrieved (P813)
                    "references": [
                        {
                            "hash": "ref42a",
                            "snaks": {
                                "P248": [
                                    {
                                        "snaktype": "value",
                                        "property": "P248",
                                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q36578"}},
                                    }
                                ],
                                "P813": [
                                    {
                                        "snaktype": "value",
                                        "property": "P813",
                                        "datavalue": {"type": "time", "value": {"time": "+2020-01-01T00:00:00Z", "precision": 11}},
                                    }
                                ],
                            },
                        }
                    ],
                }
            ],
            "P800": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P800",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q25169"}},
                    },
                    "type": "statement",
                    "rank": "preferred",
                },
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P800",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q7758404"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                },
            ],
            "P569": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P569",
                        "datavalue": {"type": "time", "value": {"time": "+1952-03-11T00:00:00Z", "precision": 11}},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P69": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P69",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q691283"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                    "qualifiers": {
                        "P580": [
                            {
                                "snaktype": "value",
                                "property": "P580",
                                "datavalue": {"type": "time", "value": {"time": "+1971-00-00T00:00:00Z", "precision": 9}},
                            }
                        ],
                        "P582": [
                            {
                                "snaktype": "value",
                                "property": "P582",
                                "datavalue": {"type": "time", "value": {"time": "+1974-00-00T00:00:00Z", "precision": 9}},
                            }
                        ],
                    },
                }
            ],
        },
        "sitelinks": {
            "enwiki": {"site": "enwiki", "title": "Douglas Adams", "badges": []},
            "frwiki": {"site": "frwiki", "title": "Douglas Adams", "badges": ["Q17437798"]},
        },
    },
    # Q42 rev 99 — STALE revision of the same id (K11 keeps rev 100).
    {
        "id": "Q42",
        "type": "item",
        "lastrevid": 99,
        "labels": {"en": {"language": "en", "value": "Douglas Adams (old)"}},
        "claims": {
            "P31": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P31",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q5"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ]
        },
    },
    # Q64 rev 200 — coordinates (K9) and quantity datavalues.
    {
        "id": "Q64",
        "type": "item",
        "lastrevid": 200,
        "labels": {
            "en": {"language": "en", "value": "Berlin"},
            "de": {"language": "de", "value": "Berlin"},
        },
        "claims": {
            "P31": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P31",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q515"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P625": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P625",
                        "datavalue": {
                            "type": "globecoordinate",
                            "value": {
                                "latitude": 52.52,
                                "longitude": 13.405,
                                "precision": 0.001,
                                "globe": "http://www.wikidata.org/entity/Q2",
                            },
                        },
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P1082": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P1082",
                        "datavalue": {"type": "quantity", "value": {"amount": "+3644826", "unit": "1"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                    "references": [
                        {
                            "hash": "ref64a",
                            "snaks": {
                                "P854": [
                                    {
                                        "snaktype": "value",
                                        "property": "P854",
                                        "datavalue": {"type": "string", "value": "https://example.org/berlin"},
                                    }
                                ]
                            },
                        },
                        {
                            "hash": "ref64b",
                            "snaks": {
                                "P143": [
                                    {
                                        "snaktype": "value",
                                        "property": "P143",
                                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q328"}},
                                    }
                                ]
                            },
                        },
                    ],
                }
            ],
        },
        "sitelinks": {"dewiki": {"site": "dewiki", "title": "Berlin", "badges": []}},
    },
    # P31 rev 10 — a property entity.
    {
        "id": "P31",
        "type": "property",
        "lastrevid": 10,
        "labels": {"en": {"language": "en", "value": "instance of"}},
    },
    # Q5 rev 50 — labels only (null claims/sitelinks maps downstream).
    {
        "id": "Q5",
        "type": "item",
        "lastrevid": 50,
        "labels": {"en": {"language": "en", "value": "human"}},
    },
    # Q1136 rev 300 — NO en label (fallback), novalue/somevalue snaks,
    # deprecated rank, monolingualtext, string datavalue, item→item edge.
    {
        "id": "Q1136",
        "type": "item",
        "lastrevid": 300,
        "labels": {
            "es": {"language": "es", "value": "ejemplo"},
            "fr": {"language": "fr", "value": "exemple"},
        },
        "claims": {
            "P40": [
                {
                    "mainsnak": {"snaktype": "novalue", "property": "P40"},
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P1477": [
                {
                    "mainsnak": {"snaktype": "somevalue", "property": "P1477"},
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P569": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P569",
                        "datavalue": {"type": "time", "value": {"time": "+1900-01-01T00:00:00Z", "precision": 11}},
                    },
                    "type": "statement",
                    "rank": "deprecated",
                },
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P569",
                        "datavalue": {"type": "time", "value": {"time": "+1901-01-01T00:00:00Z", "precision": 11}},
                    },
                    "type": "statement",
                    "rank": "normal",
                },
            ],
            "P1476": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P1476",
                        "datavalue": {"type": "monolingualtext", "value": {"text": "Ejemplo", "language": "es"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P373": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P373",
                        "datavalue": {"type": "string", "value": "Ejemplo Commons"},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
            "P26": [
                {
                    "mainsnak": {
                        "snaktype": "value",
                        "property": "P26",
                        "datavalue": {"type": "wikibase-entityid", "value": {"id": "Q42"}},
                    },
                    "type": "statement",
                    "rank": "normal",
                }
            ],
        },
    },
]

# Entity JSON, one compact line each (ensure_ascii keeps literals SQL-safe).
ENTITY_LINES: list[str] = [json.dumps(e, separators=(",", ":"), ensure_ascii=True) for e in _E]

# The raw dump shape: a giant JSON array — '[' , '{entity},' … '{entity}' , ']'.
DUMP_LINES: list[str] = (
    ["["] + [line + "," for line in ENTITY_LINES[:-1]] + [ENTITY_LINES[-1]] + ["]"]
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def raw_values_cte(name: str = "raw") -> str:
    """DuckDB CTE serving the raw dump lines: ``WITH <name>(line) AS (VALUES …)``
    body (caller embeds in WITH)."""
    vals = ",\n    ".join(f"({_sql_quote(l)})" for l in DUMP_LINES)
    return f"{name}(line) AS (VALUES\n    {vals})"


# Cleaned-entity CTE: strips array brackets and trailing commas — the same
# normalization the Spark parser applies.
def entities_cte() -> str:
    return (
        raw_values_cte("raw")
        # same cleaning order as flatten.clean_dump_lines: whitespace-trim
        # FIRST, then strip ONE trailing comma (rtrim(line, ',') stripped
        # ALL commas and no whitespace — the two cleaners only agreed on
        # perfectly-formed lines)
        + ",\n  ent(line) AS (SELECT regexp_replace(rtrim(line), ',$', '')"
        " FROM raw WHERE line NOT IN ('[', ']'))"
    )
