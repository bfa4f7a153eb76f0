"""ontocast_spark — PySpark-native knowledge-graph construction over
transcript tables. See README.md and COVERAGE.md."""

from .ontology import OntologyIndex, OntologyTerm, builtin_ontology_index
from .pipeline import PipelineConfig, run_pipeline
from .session import build_spark

__all__ = [
    "OntologyIndex",
    "OntologyTerm",
    "PipelineConfig",
    "build_spark",
    "builtin_ontology_index",
    "run_pipeline",
]
