"""Operator library — the engine's verbs, grouped by family.

KG construction (the reference's pipeline, set-oriented):
  assemble    window-ordered document assembly (two-level hierarchical concat)
  chunking    semantic chunker over mapInPandas
  extraction  ontology-constrained triple extraction (Arrow-batched)
  sublimate   facts/ontology STRSTARTS split
  fused       the whole per-document pipeline as ONE mapInPandas pass
  canonicalize  per-document exact replay of the reference aggregator
                + owl:sameAs alias collapse
  crossdoc    corpus-scale entity resolution (blocking -> fuzzy -> CC ->
              collision-free minting -> rewrite; batch + incremental) and
              pair-level ER metrics
  cc          distributed connected components (min-label + pointer jumping)
  validation  predicate diagnostics + RDFS inference (rdfs2/3/7/9)
  critique    deterministic critique scorers + bounded retry
  pagerank    entity-importance PageRank (join+aggregate rounds)

Training-data pipeline:
  dedup       exact / MinHash-LSH / SimHash / embedding near-dup,
              end-to-end clustering, cross-split leakage scan
  similarity  brute-force + IVF ANN, distributed k-means training
  text_analysis  language ID, quality features, repetition signals,
              PII redaction, decontamination, fingerprints, packing
  dataset     deterministic splits, partition-invariant + mixture sampling
  corpus      the composed corpus build (dedup -> decontaminate ->
              gates -> split -> sharded packing, auditable drops)
  sketch      KMV distinct-count sketch (mergeable, cross-engine exact)
  asof        as-of join (union + running-last window, no non-equi join)
  multimodal  binary media plumbing with optional-dependency codecs

Every operator has a unit/property test; most also carry a driver query
with a DuckDB oracle (COVERAGE.md appendix is the full matrix).
"""
