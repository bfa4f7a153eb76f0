"""Sublimation: split chunk graphs into facts vs ontology addendum.

The reference's one real SPARQL filter
(/root/reference/ontocast/agent/sublimate_ontology.py:31-72)::

    FILTER ( STRSTARTS(STR(?s), cd:) || STRSTARTS(STR(?p), cd:)
             || (isIRI(?o) && STRSTARTS(STR(?o), cd:)) )

maps to two complementary Catalyst predicates over the triples
DataFrame — pure column algebra, whole-stage-codegen'd, filter pushed to
the scan. ``chunk_ns`` is ``chunk_iri || '/'`` (column-to-column
``startswith``), so one pass serves every chunk at once — the per-chunk
loop of the reference disappears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _in_chunk_ns(chunk_ns: Column) -> Column:
    return (
        F.col("subj").startswith(chunk_ns)
        | F.col("pred").startswith(chunk_ns)
        | (~F.col("obj_is_literal") & F.col("obj").startswith(chunk_ns))
    )


def split_facts_ontology(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """raw triples -> (facts_df, ontology_addendum_df)."""
    chunk_ns = F.concat(F.col("chunk_iri"), F.lit("/"))
    pred = _in_chunk_ns(chunk_ns)
    return triples.filter(pred), triples.filter(~pred)
