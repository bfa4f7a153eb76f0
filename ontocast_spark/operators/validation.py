"""Connectivity validation + hub auto-connect (grouped pandas UDF).

Standalone form of the fused step in ``extraction.py``: groups the facts
triples by chunk and applies the pure connectivity kernel
(/root/reference/ontocast/tool/validate.py:94-155, 283-379 re-expressed
in :mod:`ontocast_spark.kernels.graphs`). Chunk graphs are tiny (at most
a few hundred triples), so one group = one cheap in-memory BFS; the
corpus-level parallelism comes from the grouping itself.

Prefer the fused path in production — this operator costs a shuffle on
(conv_id, chunk_hid) that the fused extractor avoids.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.graphs import connect_via_hub, connected_components
from ..schemas import TRIPLES


def connect_chunks(facts: DataFrame) -> DataFrame:
    """facts triples -> hub-connected facts triples (same schema)."""

    def connect_group(pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id = pdf["conv_id"].iloc[0]
        doc_iri = pdf["doc_iri"].iloc[0]
        chunk_hid = pdf["chunk_hid"].iloc[0]
        chunk_iri = pdf["chunk_iri"].iloc[0]
        triples = {
            (s, p, o, bool(lit), None if dt is None or pd.isna(dt) else dt)
            for s, p, o, lit, dt in zip(
                pdf["subj"], pdf["pred"], pdf["obj"],
                pdf["obj_is_literal"], pdf["obj_datatype"],
            )
        }
        connected = sorted(connect_via_hub(triples, chunk_iri))
        return pd.DataFrame(
            {
                "conv_id": conv_id,
                "doc_iri": doc_iri,
                "chunk_hid": chunk_hid,
                "chunk_iri": chunk_iri,
                "subj": [t[0] for t in connected],
                "pred": [t[1] for t in connected],
                "obj": [t[2] for t in connected],
                "obj_is_literal": [t[3] for t in connected],
                "obj_datatype": [t[4] for t in connected],
            }
        )

    return (
        facts.select(
            "conv_id", "doc_iri", "chunk_hid", "chunk_iri",
            "subj", "pred", "obj", "obj_is_literal", "obj_datatype",
        )
        .groupBy("conv_id", "chunk_hid")
        .applyInPandas(connect_group, schema=TRIPLES)
    )


def connectivity_report(facts: DataFrame) -> DataFrame:
    """Per-chunk connectivity metrics (diagnostics), cf.
    validate_connectivity (/root/reference/ontocast/tool/validate.py:250-281)."""

    def report_group(pdf: pd.DataFrame) -> pd.DataFrame:
        triples = {
            (s, p, o, bool(lit), dt)
            for s, p, o, lit, dt in zip(
                pdf["subj"], pdf["pred"], pdf["obj"],
                pdf["obj_is_literal"], pdf["obj_datatype"],
            )
        }
        comps = connected_components(triples)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "chunk_hid": [pdf["chunk_hid"].iloc[0]],
                "num_components": [len(comps)],
                "total_entities": [sum(len(c) for c in comps)],
                "largest_component_size": [max((len(c) for c in comps), default=0)],
                "is_fully_connected": [len(comps) <= 1],
            }
        )

    return facts.groupBy("conv_id", "chunk_hid").applyInPandas(
        report_group,
        schema=(
            "conv_id string, chunk_hid string, num_components long, "
            "total_entities long, largest_component_size long, "
            "is_fully_connected boolean"
        ),
    )
