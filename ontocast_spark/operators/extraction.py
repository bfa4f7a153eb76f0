"""Triple extraction operator: chunks -> triples via ``mapInPandas``.

Wraps the frozen deterministic extractor kernel
(:mod:`ontocast_spark.kernels.extract`) over Arrow batches. Per chunk it

1. selects the ontology by entity-link scoring of the first 1000 chars
   against the broadcast term index (the reference's LLM selection,
   /root/reference/ontocast/agent/select_ontology.py:26-82, replaced by
   a deterministic scorer — same I/O contract incl. the null fallback),
2. extracts ontology-constrained triples in the chunk namespace
   (replacing /root/reference/ontocast/agent/render_facts.py:25-98),
3. optionally applies the sublimation split + facts-side hub
   auto-connect *inline* (``fuse=True``): the chunk's full graph is
   already in hand inside the UDF, so splitting and connecting here
   saves the (conv_id, chunk_hid) shuffle that a separate grouped
   validation stage would cost. The standalone operators in
   ``sublimate.py`` / ``validation.py`` exist for parity and tests; the
   pipeline default is the fused path.

The ontology index is broadcast once per job (``sparkContext.broadcast``)
— it is the only shared state and is a few KB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..kernels.extract import extract_chunk_triples
from ..kernels.graphs import connect_via_hub
from ..kernels.rdfterms import iri2namespace
from ..ontology import OntologyIndex
from ..schemas import TRIPLES

# chunk_idx rides along so the canonicalize groupBy can replay chunks
# in DOCUMENT order (the reference aggregator's and the fused path's
# order — greedy disambiguation is chunk-order-sensitive)
TRIPLES_WITH_PART = StructType(
    list(TRIPLES.fields)
    + [
        StructField("chunk_idx", IntegerType(), False),
        StructField("part", StringType(), False),
    ]
)


def extract_triples(
    spark: SparkSession,
    chunks: DataFrame,
    index: OntologyIndex,
    fuse: bool = True,
) -> DataFrame:
    """chunks -> triples. With ``fuse=True`` the output carries a
    ``part`` column ('facts' | 'ontology') and facts graphs are already
    hub-connected; with ``fuse=False`` raw extraction rows are returned
    (part='raw') for the standalone sublimate/validate operators."""
    bc_index = spark.sparkContext.broadcast(index)

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx: OntologyIndex = bc_index.value
        cols = ("conv_id", "doc_iri", "chunk_hid", "chunk_iri", "subj",
                "pred", "obj", "obj_is_literal", "obj_datatype",
                "chunk_idx", "part")
        for pdf in batches:
            out = {k: [] for k in cols}

            def emit(conv_id, doc_iri, hid, chunk_iri, cidx, triples, part):
                for s, p, o, lit, dt in triples:
                    out["conv_id"].append(conv_id)
                    out["doc_iri"].append(doc_iri)
                    out["chunk_hid"].append(hid)
                    out["chunk_iri"].append(chunk_iri)
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["obj_is_literal"].append(lit)
                    out["obj_datatype"].append(dt)
                    out["chunk_idx"].append(cidx)
                    out["part"].append(part)

            for conv_id, doc_iri, hid, chunk_iri, cidx, text in zip(
                pdf["conv_id"], pdf["doc_iri"], pdf["chunk_hid"],
                pdf["chunk_iri"], pdf["chunk_idx"], pdf["text"],
            ):
                chunk_ns = iri2namespace(chunk_iri)
                ontology_id = idx.select_ontology(text or "")
                triples = extract_chunk_triples(
                    text or "", chunk_ns, idx, ontology_id
                )
                if not fuse:
                    emit(conv_id, doc_iri, hid, chunk_iri, cidx, triples, "raw")
                    continue
                # sublimation split (the SPARQL STRSTARTS predicate,
                # /root/reference/ontocast/agent/sublimate_ontology.py:31-72)
                facts, onto = [], []
                for t in triples:
                    s, p, o, lit, dt = t
                    in_cd = (
                        s.startswith(chunk_ns)
                        or p.startswith(chunk_ns)
                        or ((not lit) and o.startswith(chunk_ns))
                    )
                    (facts if in_cd else onto).append(t)
                facts = sorted(connect_via_hub(facts, chunk_iri))
                emit(conv_id, doc_iri, hid, chunk_iri, cidx, facts, "facts")
                emit(conv_id, doc_iri, hid, chunk_iri, cidx, onto, "ontology")
            yield pd.DataFrame(out, columns=list(cols))

    return chunks.select(
        "conv_id", "doc_iri", "chunk_hid", "chunk_iri", "chunk_idx", "text"
    ).mapInPandas(extract_batches, schema=TRIPLES_WITH_PART)
