"""Server-side DataTables scan (SURVEY.md §2.1 S4).

The reference drives two DataTables-protocol sources:

* ``state_legislation/distrito_federal.py:214-287`` — POSTs a
  duplicate-key form payload (``argumento`` appears twice: the year
  argument then the situation argument, appended AFTER the rest of the
  params, :238-243) to a ``.ashx`` endpoint and receives JSON
  ``{"aaData": [{"_source": {...}}, ...]}``; per item it synthesizes
  ``title = f"{nm_tipo_norma} {nr_norma} de {dt_assinatura}"`` and
  ``html_link = f"{base}/Norma/{ch_norma}/"
  f"{transform(nm_tipo_norma)}_{nr_norma}_{dt}.html"`` where
  ``transform`` maps every non-alphanumeric char to ``_`` (:252-261)
  and the date swaps ``/`` for ``_`` (:276).
* Pagination: a count probe returns ``{"counts": [{"count": N}]}``
  (:376) → ``pages = ceil(N / iDisplayLength)`` with
  ``iDisplayLength=100`` and ``iDisplayStart=(page-1)*100``
  (:231-232, :381-383).

Spark-first rebuild — the protocol decomposes into three pure-JVM
pieces (zero Python in the hot path):

* the POST body is a deterministic string column
  (:func:`form_body`) — the fetch layer treats ``url + "?" + body``
  as the lookup key, exactly like the VIEWSTATE postback key
  (operators/viewstate.py); duplicate keys are order-preserved by
  construction because the body is literal text, not a dict;
* the JSON response parses with ``from_json`` against a typed schema
  (:data:`DT_SCHEMA` / :data:`COUNT_SCHEMA`) and explodes —
  whole-stage-codegen end to end, no UDF;
* title/link synthesis is ``concat``/``regexp_replace`` column algebra
  (:func:`doc_records`).  ``transform_norm_type`` uses Python
  ``str.isalnum`` which is UNICODE-aware ("Instrução" keeps its ç/ã),
  so the column twin replaces ``[^\\p{L}\\p{N}]`` — not
  ``[^a-zA-Z0-9]`` — with ``_``.

At 100 TB this is the cheapest scan family in the engine: the page
fan-out is a count-probe aggregate plus ``explode(sequence(...))``
(no shuffle beyond the count), and parsing is codegen'd JSON — the
classic reason to keep API-JSON sources OUT of Python entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: distrito_federal.py:83-84 — the protocol's fixed page size.
DISPLAY_LENGTH = 100

#: Response schema of the search endpoint (aaData rows wrap the payload
#: in an ES-style ``_source`` envelope, distrito_federal.py:266-267).
DT_SCHEMA = StructType(
    [
        StructField(
            "aaData",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "_source",
                            StructType(
                                [
                                    StructField("nm_tipo_norma", StringType()),
                                    StructField("nr_norma", StringType()),
                                    StructField("ch_norma", StringType()),
                                    StructField("dt_assinatura", StringType()),
                                    StructField("ds_ementa", StringType()),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
        StructField("iTotalRecords", LongType()),
    ]
)

#: Response schema of the count probe (distrito_federal.py:376).
COUNT_SCHEMA = StructType(
    [
        StructField(
            "counts",
            ArrayType(StructType([StructField("count", LongType())])),
        )
    ]
)


def form_body(pairs: list[tuple[str, Column]]) -> Column:
    """Serialize an ORDERED, duplicate-key-capable form payload.

    The reference sends ``payload`` as a list of tuples precisely so
    ``argumento`` can appear twice (distrito_federal.py:238-243 —
    requests encodes tuple lists in order).  The column twin builds the
    same ``k=v&k=v`` text, so ordering and duplicates survive by
    construction.  Values are assumed pre-encoded (the reference never
    escapes either).
    """
    parts = []
    for key, val in pairs:
        parts.append(F.concat(F.lit(key + "="), val.cast("string")))
    return F.concat_ws("&", *parts)


def search_body(
    year: Column,
    situation_id: Column,
    situation: Column,
    norm_type_id: Column,
    page: Column,
) -> Column:
    """The search POST body for one (year, situation, type, page) —
    distrito_federal.py:222-243 field-for-field, duplicate ``argumento``
    keys last and in reference order."""
    arg_year = F.concat(
        F.lit("number#ano_assinatura#Ano de Assinatura#igual#igual a#"),
        year.cast("string"),
        F.lit("#"),
        year.cast("string"),
        F.lit("#E"),
    )
    arg_sit = F.concat(
        F.lit("autocomplete#ch_situacao#Situação#igual#igual a#"),
        situation_id.cast("string"),
        F.lit("#"),
        situation.cast("string"),
        F.lit("#E"),
    )
    start = (page - 1) * DISPLAY_LENGTH
    return form_body(
        [
            ("ch_tipo_norma", norm_type_id),
            ("iDisplayLength", F.lit(DISPLAY_LENGTH)),
            ("iDisplayStart", start),
            ("argumento", arg_year),
            ("argumento", arg_sit),
        ]
    )


def transform_norm_type(col: Column) -> Column:
    """Column twin of the reference's ``transform_norm_type``
    (distrito_federal.py:252-261): every char failing ``str.isalnum``
    becomes ``_``.  ``isalnum`` is Unicode-aware, hence the
    ``\\p{L}\\p{N}`` class (ASCII-only ``[^a-zA-Z0-9]`` would mangle
    "Instrução Normativa" differently from the reference)."""
    return F.regexp_replace(col, r"[^\p{L}\p{N}]", "_")


def parse_search(body: Column) -> Column:
    """``from_json`` the search response (NULL-safe: unparseable bodies
    yield a NULL struct, the protocol's equivalent of the reference's
    ``response is None → []`` guard at :249-250)."""
    return F.from_json(body, DT_SCHEMA)


def doc_records(body: Column, base_url: Column) -> Column:
    """aaData → array<struct<title, summary, date, html_link>> —
    the loop at distrito_federal.py:266-287 as one ``transform``."""
    items = parse_search(body)["aaData"]

    def build(item: Column) -> Column:
        s = item["_source"]
        # F.concat (NULL-propagating), not concat_ws: a missing field
        # must null the title like the oracle's || chain, not be
        # silently skipped
        title = F.concat(
            s["nm_tipo_norma"], F.lit(" "), s["nr_norma"], F.lit(" de "),
            s["dt_assinatura"],
        )
        link = F.concat(
            base_url,
            F.lit("/Norma/"),
            s["ch_norma"],
            F.lit("/"),
            transform_norm_type(s["nm_tipo_norma"]),
            F.lit("_"),
            s["nr_norma"],
            F.lit("_"),
            F.regexp_replace(s["dt_assinatura"], "/", "_"),
            F.lit(".html"),
        )
        return F.struct(
            title.alias("title"),
            s["ds_ementa"].alias("summary"),
            s["dt_assinatura"].alias("date"),
            link.alias("html_link"),
        )

    return F.transform(items, build)


def probe_count(body: Column) -> Column:
    """Count-probe response → total records (``counts[0].count``,
    distrito_federal.py:376)."""
    return F.from_json(body, COUNT_SCHEMA)["counts"][0]["count"]


def page_starts(total: Column) -> Column:
    """Total records → array of ``iDisplayStart`` offsets
    (distrito_federal.py:381-383; zero totals → empty array, matching
    the ``continue`` at :378-379)."""
    n_pages = F.ceil(total / F.lit(DISPLAY_LENGTH)).cast("int")
    return F.when(
        total > 0,
        F.transform(
            F.sequence(F.lit(1), n_pages),
            lambda p: (p - 1) * DISPLAY_LENGTH,
        ),
    ).otherwise(F.array().cast("array<int>"))
