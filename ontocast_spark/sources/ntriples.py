"""N-Triples sink/source — the wire format for bulk-loading external
triple stores (Fuseki `tdbloader`, Neo4j n10s import), replacing the
reference's per-document HTTP PUT / bolt writes
(/root/reference/ontocast/tool/triple_manager/fuseki.py:303-334,
neo4j.py:389-412) with a fully distributed file export: formatting is
pure column algebra (whole-stage codegen) and the write is a plain
``df.write.text`` — no driver bottleneck, one file per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(col: Column) -> Column:
    # N-Triples literal escaping: backslash, quote, newline, CR, tab
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj, obj_is_literal, obj_datatype) -> one-column
    DataFrame of N-Triples lines."""
    obj_term = F.when(
        ~F.col("obj_is_literal"), F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    ).otherwise(
        F.concat(
            F.lit('"'),
            _escape_literal(F.col("obj")),
            F.lit('"'),
            F.when(
                F.col("obj_datatype").isNotNull(),
                F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
            ).otherwise(F.lit("")),
        )
    )
    return triples.select(
        F.concat(
            F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"), F.lit("> "),
            obj_term, F.lit(" ."),
        ).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed N-Triples export (one part file per task)."""
    to_ntriples_lines(triples).write.mode(mode).text(path)


def read_ntriples(spark, path: str) -> DataFrame:
    """Parse N-Triples lines back to the triple schema (regexp-based,
    JVM-side)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    iri_obj = F.regexp_extract("value", r"^<[^>]*> <[^>]*> <([^>]*)> \.$", 1)
    lit_obj = F.regexp_extract(
        "value", r'^<[^>]*> <[^>]*> "((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)? \.$', 1
    )
    lit_dt = F.regexp_extract(
        "value", r'^<[^>]*> <[^>]*> "(?:[^"\\]|\\.)*"\^\^<([^>]*)> \.$', 1
    )
    is_lit = iri_obj == ""
    # single-pass-safe unescape: park escaped backslashes in a sentinel
    # first (sequential replacement otherwise corrupts "\\" + "t" etc.)
    sentinel = "\x01"  # cannot appear in spec-conforming NT literal text
    unescape = F.replace(lit_obj, F.lit("\\\\"), F.lit(sentinel))
    for esc, raw in (("\\t", "\t"), ("\\r", "\r"), ("\\n", "\n"), ('\\"', '"')):
        unescape = F.replace(unescape, F.lit(esc), F.lit(raw))
    unescape = F.replace(unescape, F.lit(sentinel), F.lit("\\"))
    return lines.select(
        F.regexp_extract("value", r"^<([^>]*)>", 1).alias("subj"),
        F.regexp_extract("value", r"^<[^>]*> <([^>]*)>", 1).alias("pred"),
        F.when(is_lit, unescape).otherwise(iri_obj).alias("obj"),
        is_lit.alias("obj_is_literal"),
        F.when(is_lit & (lit_dt != ""), lit_dt).alias("obj_datatype"),
    )
