"""JVM-side IRI column functions (no Python in the hot path).

``local_name_expr`` replicates the reference's ``derive_ontology_id``
(/root/reference/ontocast/onto.py:26-53) with built-in expressions:
strip trailing ``/#``, drop the URL fragment, take the last path
segment (or the first host label when there is no path), strip
known file extensions / TLD suffixes, keep ``[a-zA-Z0-9_-]``,
lowercase — with the conventional-prefix shortcut for namespace-root
IRIs applied via a broadcast literal map.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.rdfterms import CONVENTIONAL_MAPPINGS, ONTOLOGY_NULL_ID

_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/.*)$"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/.:]*)"


def _conventional_map() -> Column:
    pairs = list(
        chain.from_iterable(
            (F.lit(ns.rstrip("/#")), F.lit(prefix))
            for ns, prefix in CONVENTIONAL_MAPPINGS.items()
        )
    )
    return F.create_map(*pairs)


def local_name_expr(iri: Column) -> Column:
    normalized = F.regexp_replace(F.trim(iri), r"[/#]+$", "")
    no_frag = F.regexp_replace(normalized, r"#.*$", "")
    path = F.regexp_extract(no_frag, _URL_PATH_RE, 1)
    host_first = F.regexp_extract(no_frag, _HOST_RE, 1)
    candidate = (
        F.when(path != "", F.regexp_extract(path, r"([^/]*)$", 1))
        .when(host_first != "", host_first)
        .otherwise(normalized)
    )
    cleaned = F.regexp_replace(candidate, r"(?i)\.(owl|ttl|rdf|xml)$", "")
    cleaned = F.regexp_replace(
        cleaned, r"(?i)^(.*?)\.(org|com|net|io|edu|gov|int|mil)$", "$1"
    )
    cleaned = F.lower(F.regexp_replace(cleaned, r"[^a-zA-Z0-9_\-]", ""))
    derived = F.when(cleaned == "", F.lit(ONTOLOGY_NULL_ID)).otherwise(cleaned)
    return F.coalesce(
        F.element_at(_conventional_map(), normalized), derived
    )


def clean_local_name_expr(local: Column) -> Column:
    """Column form of aggregate.py:635-646 ``_clean_local_name``."""
    cleaned = F.regexp_replace(local, r"[^\w\-.]", "_")
    cleaned = F.regexp_replace(cleaned, r"_+", "_")
    cleaned = F.regexp_replace(cleaned, r"^_+|_+$", "")
    return F.when(cleaned == "", F.lit("entity")).otherwise(cleaned)
