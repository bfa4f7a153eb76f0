"""SPARQL basic-graph-pattern (BGP) SELECT over a triples DataFrame.

The reference's query surface is SPARQL against its triple store
(Fuseki SELECT/CONSTRUCT, /root/reference/ontocast/tool/triple_manager/
fuseki.py:188-270; the sublimation STRSTARTS filter at tool/
sublimate_ontology.py:31-72 is operator Q1). This module compiles the
core of that surface — a conjunctive basic graph pattern — into the
exact relational algebra Spark executes natively:

- a triple pattern with constants is a **filtered scan** (the constant
  predicates push down to the parquet/Iceberg scan);
- a shared variable between two patterns is an **equi-join key** (hash
  join; Catalyst/AQE picks broadcast vs shuffle per side size);
- a repeated variable inside one pattern is a **self-equality filter**;
- SELECT DISTINCT is a ``dropDuplicates`` on the projected variables.

This is the textbook BGP-to-SQL mapping (SPARQL entailment-free
semantics = conjunctive queries over the triple relation); OPTIONAL /
UNION / FILTER regex would map to left joins / unionByName / Catalyst
predicates the same way and are out of scope here.

Scale: each pattern scans the triples table once with its constants
pushed down; a pattern with a constant predicate over a
``partitionBy(pred)``-bucketed table is partition pruning. Join order
follows pattern order — list the most selective pattern first (Spark's
CBO/AQE re-orders within a star join, but explicit ordering is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLOTS = ("subj", "pred", "obj")


def bgp_select(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    distinct: bool = True,
) -> DataFrame:
    """patterns: (s, p, o) terms; strings starting with ``?`` are
    variables, everything else is a constant filter. Returns one column
    per variable (without the ``?``), rows = pattern matches joined on
    shared variables."""
    if not patterns:
        raise ValueError("empty basic graph pattern")
    result: DataFrame | None = None
    for s, p, o in patterns:
        t = triples
        seen: dict[str, str] = {}  # var -> first slot bound
        cols = []
        for slot, term in zip(_SLOTS, (s, p, o)):
            if isinstance(term, str) and term.startswith("?"):
                var = term[1:]
                if var in seen:  # repeated var in one pattern
                    t = t.filter(F.col(slot) == F.col(seen[var]))
                else:
                    seen[var] = slot
                    cols.append(F.col(slot).alias(var))
            else:
                t = t.filter(F.col(slot) == F.lit(term))
        # all-constant pattern = existence check (ASK semantics): one
        # zero-column row if any match, empty otherwise — limit(1)
        # prevents row multiplication through the cross join
        t = t.select(*cols) if cols else t.select().limit(1)
        if result is None:
            result = t
        else:
            shared = sorted(set(result.columns) & set(t.columns))
            result = (
                result.join(t, on=shared) if shared else result.crossJoin(t)
            )
    return result.dropDuplicates() if distinct else result


def bgp_optional(
    result: DataFrame, triples: DataFrame, patterns: list[tuple[str, str, str]]
) -> DataFrame:
    """SPARQL OPTIONAL: left-join the solutions of ``patterns`` onto an
    existing solution set — unmatched rows keep NULLs in the optional
    variables (left outer join on the shared variables)."""
    opt = bgp_select(triples, patterns, distinct=True)
    shared = sorted(set(result.columns) & set(opt.columns))
    if not shared:
        raise ValueError("OPTIONAL group shares no variable with the base")
    return result.join(opt, on=shared, how="left")


def bgp_union(
    triples: DataFrame, groups: list[list[tuple[str, str, str]]]
) -> DataFrame:
    """SPARQL UNION over pattern groups: solutions of each group,
    unioned by variable name (missing variables become NULL columns,
    per SPARQL's unbound semantics)."""
    if not groups:
        raise ValueError("empty UNION")
    sols = [bgp_select(triples, g, distinct=True) for g in groups]
    all_vars = sorted({c for s in sols for c in s.columns})
    aligned = [
        s.select(
            *[
                (F.col(v) if v in s.columns else F.lit(None).cast("string")).alias(v)
                for v in all_vars
            ]
        )
        for s in sols
    ]
    out = aligned[0]
    for s in aligned[1:]:
        out = out.unionByName(s)
    return out.dropDuplicates()


def bgp_filter(result: DataFrame, condition) -> DataFrame:
    """SPARQL FILTER: a Catalyst predicate over the solution variables
    (``F.col("price") > 100``, ``F.col("name").startswith(...)``, any
    Column expression or SQL string) — pushes down like any filter."""
    return result.filter(condition)


def bgp_construct(
    solutions: DataFrame,
    template: list[tuple[str, str, str]],
) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate a triple template per solution row
    (the reference fetches graphs with CONSTRUCT, fuseki.py:243-270).
    Template terms starting with ``?`` substitute solution variables;
    constants pass through. Output is a deduplicated
    (subj, pred, obj) triple set — one ``explode`` of the per-row
    template instantiations, no shuffle beyond the final distinct."""
    if not template:
        raise ValueError("empty CONSTRUCT template")

    def term(t: str):
        if isinstance(t, str) and t.startswith("?"):
            var = t[1:]
            if var not in solutions.columns:
                raise ValueError(f"unbound template variable ?{var}")
            return F.col(var)
        return F.lit(t)

    rows = F.array(
        *[
            F.struct(
                term(s).alias("subj"), term(p).alias("pred"), term(o).alias("obj")
            )
            for s, p, o in template
        ]
    )
    return (
        solutions.select(F.explode(rows).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
        .filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )  # SPARQL: template instantiations with unbound vars are skipped
        .dropDuplicates()
    )
