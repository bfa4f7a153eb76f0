"""Round-5 SPARQL expression and solution-modifier surface
(plans/sparql.py): ``(expr AS ?v)`` projections, GROUP BY (incl.
expression keys), HAVING / ORDER BY (incl. bare hoisted aggregates),
OFFSET, IN / NOT IN, arithmetic with ANSI-safe numeric coercion, the
full builtin library (string / numeric / digest / dateTime /
isNumeric / ENCODE_FOR_URI), blank nodes, negated property sets,
dataset clauses, GRAPH-scoped paths, COUNT(DISTINCT *), and OPTIONAL
filters as LeftJoin conditions. Reference surface: the SPARQL 1.1
grammar the reference delegates to Fuseki (fuseki.py:188-270)."""

import pytest

from ontocast_spark.plans.sparql import SparqlSyntaxError, sparql


def _triples(spark, rows, meta=False):
    if meta:
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "obj_lang string, obj_datatype string",
        )
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


# ------------------------------------------------- (expr AS ?v)


def test_expression_projection_arith(spark):
    tri = _triples(spark, [("a", "size", "3"), ("b", "size", "10")])
    out = sparql(tri, """
        SELECT ?x (?s * 2 + 1 AS ?odd) WHERE { ?x <size> ?s }
    """)
    assert set(out.columns) == {"x", "odd"}
    got = {(r["x"], float(r["odd"])) for r in out.collect()}
    assert got == {("a", 7.0), ("b", 21.0)}


def test_expression_projection_string(spark):
    tri = _triples(spark, [("a", "name", "Ada"), ("b", "name", "Bob")])
    got = {
        (r["x"], r["tag"], r["n"])
        for r in sparql(tri, """
            SELECT ?x (CONCAT(UCASE(?nm), "!") AS ?tag)
                   (STRLEN(?nm) AS ?n)
            WHERE { ?x <name> ?nm }
        """).collect()
    }
    assert got == {("a", "ADA!", 3), ("b", "BOB!", 3)}


def test_expression_projection_guards(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql(tri, "SELECT (STRLEN(?nope) AS ?n) WHERE { ?s <p> ?o }")
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        sparql(tri, "SELECT (STR(?o) AS ?o) WHERE { ?s <p> ?o }")


# ------------------------------------------------- HAVING / OFFSET


def test_having_filters_groups(spark):
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"),
        ("b", "score", "5"), ("c", "score", "7"), ("c", "score", "9"),
    ])
    got = {
        (r["x"], r["n"], float(r["total"]))
        for r in sparql(tri, """
            SELECT ?x (COUNT(?s) AS ?n) (SUM(?s) AS ?total)
            WHERE { ?x <score> ?s } GROUP BY ?x
            HAVING (?n >= 2) HAVING (?total > 3)
        """).collect()
    }
    assert got == {("c", 2, 16.0)}


def test_having_guards(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="HAVING needs aggregates"):
        sparql(tri, "SELECT ?s WHERE { ?s <p> ?o } HAVING (?o > 1)")
    with pytest.raises(SparqlSyntaxError, match="GROUP BY key or aggregate"):
        sparql(tri, """
            SELECT (COUNT(?s) AS ?n) WHERE { ?s <p> ?o }
            HAVING (?o > 1)
        """)


def test_offset_slices_after_order(spark):
    tri = _triples(spark, [(f"e{i}", "v", str(i)) for i in range(6)])
    text = "SELECT ?x WHERE { ?x <v> ?n } ORDER BY ?n OFFSET 2 LIMIT 3"
    assert [r["x"] for r in sparql(tri, text).collect()] == \
        ["e2", "e3", "e4"]
    # OFFSET past the end is empty, OFFSET without LIMIT drops a prefix
    assert sparql(
        tri, "SELECT ?x WHERE { ?x <v> ?n } ORDER BY ?n OFFSET 10"
    ).count() == 0
    assert sparql(
        tri, "SELECT ?x WHERE { ?x <v> ?n } OFFSET 4"
    ).count() == 2


# ------------------------------------------------- IN / arithmetic


def test_in_and_not_in(spark):
    tri = _triples(spark, [
        ("a", "t", "x"), ("b", "t", "y"), ("c", "t", "z"),
    ])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <t> ?v . FILTER(?v IN ("x", "z")) }
    """).collect()}
    assert got == {"a", "c"}
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <t> ?v . FILTER(?v NOT IN ("x", "z")) }
    """).collect()}
    assert got == {"b"}


def test_arithmetic_precedence_and_coercion(spark):
    tri = _triples(spark, [("a", "p", "5"), ("b", "p", "2")])
    # * binds tighter than +; lexical "5" coerces to a number
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v . FILTER(?v + 2 * 3 = 11) }
    """).collect()}
    assert got == {"a"}
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v . FILTER(?v / 2 > 2) }
    """).collect()}
    assert got == {"a"}


# ------------------------------------------------- builtins


def test_coalesce_with_optional(spark):
    tri = _triples(spark, [
        ("a", "name", "Ada"), ("a", "nick", "ada42"), ("b", "name", "Bob"),
    ])
    got = {(r["s"], r["label"]) for r in sparql(tri, """
        SELECT ?s (COALESCE(?k, ?nm) AS ?label) WHERE {
            ?s <name> ?nm OPTIONAL { ?s <nick> ?k }
        }
    """).collect()}
    assert got == {("a", "ada42"), ("b", "Bob")}


def test_if_builtin(spark):
    tri = _triples(spark, [("a", "p", "150"), ("b", "p", "50")])
    got = {(r["s"], r["bucket"]) for r in sparql(tri, """
        SELECT ?s (IF(?v > 100, "high", "low") AS ?bucket)
        WHERE { ?s <p> ?v }
    """).collect()}
    assert got == {("a", "high"), ("b", "low")}


def test_strbefore_strafter(spark):
    tri = _triples(spark, [("a", "p", "key=value")])
    row = sparql(tri, """
        SELECT (STRBEFORE(?v, "=") AS ?k) (STRAFTER(?v, "=") AS ?w)
               (STRBEFORE(?v, "#") AS ?miss) (STRAFTER(?v, "") AS ?all)
        WHERE { ?s <p> ?v }
    """).collect()[0]
    # no-occurrence -> "" and STRAFTER(x, "") -> x, per spec
    assert (row["k"], row["w"], row["miss"], row["all"]) == \
        ("key", "value", "", "key=value")


def test_substr_replace(spark):
    tri = _triples(spark, [("a", "p", "Hello World")])
    row = sparql(tri, """
        SELECT (SUBSTR(?v, 7) AS ?tail) (SUBSTR(?v, 1, 5) AS ?head)
               (REPLACE(?v, "world", "there", "i") AS ?r)
        WHERE { ?s <p> ?v }
    """).collect()[0]
    assert (row["tail"], row["head"], row["r"]) == \
        ("World", "Hello", "Hello there")
    with pytest.raises(SparqlSyntaxError, match="flags"):
        sparql(tri, """
            SELECT ?s WHERE {
                ?s <p> ?v . FILTER(REPLACE(?v, "a", "b", "g") = "x")
            }
        """)


def test_numeric_builtins(spark):
    tri = _triples(spark, [("a", "p", "-2.5")])
    row = sparql(tri, """
        SELECT (ABS(?v) AS ?a) (CEIL(?v) AS ?c) (FLOOR(?v) AS ?f)
               (ROUND(?v) AS ?r)
        WHERE { ?s <p> ?v }
    """).collect()[0]
    assert (float(row["a"]), float(row["c"]), float(row["f"])) == \
        (2.5, -2.0, -3.0)
    assert float(row["r"]) == -2.0  # fn:round ties toward +inf


def test_langmatches(spark):
    tri = _triples(spark, [
        ("a", "label", "colour", True, "en-GB", None),
        ("b", "label", "color", True, "en", None),
        ("c", "label", "couleur", True, "fr", None),
        ("d", "label", "plain", True, "", None),
    ], meta=True)
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE {
            ?s <label> ?v . FILTER(LANGMATCHES(LANG(?v), "en"))
        }
    """).collect()}
    assert got == {"a", "b"}
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE {
            ?s <label> ?v . FILTER(LANGMATCHES(LANG(?v), "*"))
        }
    """).collect()}
    assert got == {"a", "b", "c"}


# ------------------------------------------------- DISTINCT aggregates


def test_distinct_aggregates(spark):
    tri = _triples(spark, [
        ("a", "score", "2"), ("a", "score", "2"), ("a", "score", "4"),
        ("b", "score", "3"), ("b", "score", "3"),
    ])
    got = {
        (r["x"], r["n"], float(r["total"]), float(r["mean"]), r["all"])
        for r in sparql(tri, """
            SELECT ?x (COUNT(DISTINCT ?s) AS ?n)
                   (SUM(DISTINCT ?s) AS ?total)
                   (AVG(DISTINCT ?s) AS ?mean)
                   (GROUP_CONCAT(DISTINCT ?s) AS ?all)
            WHERE { ?x <score> ?s } GROUP BY ?x
        """).collect()
    }
    assert got == {
        ("a", 2, 6.0, 3.0, "2 4"),
        ("b", 1, 3.0, 3.0, "3"),
    }


def test_count_distinct_star(spark):
    """COUNT(DISTINCT *) counts distinct SOLUTIONS per group — a
    struct-based countDistinct so rows with unbound variables still
    count (a bare multi-column count_distinct would drop them)."""
    tri = _triples(spark, [
        ("a", "p", "1"), ("a", "p", "2"), ("a", "q", "1"),
        ("b", "p", "3"),
    ])
    # per-subject distinct (?p, ?o) solutions
    got = {(r["s"], r["n"]) for r in sparql(tri, """
        SELECT ?s (COUNT(DISTINCT *) AS ?n) WHERE { ?s ?p ?o }
        GROUP BY ?s
    """).collect()}
    assert got == {("a", 3), ("b", 1)}
    # with an OPTIONAL leaving ?x unbound on some solutions
    got = [r["n"] for r in sparql(tri, """
        SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
            ?s <p> ?o OPTIONAL { ?s <q> ?x }
        }
    """).collect()]
    assert got == [3]
    # non-COUNT DISTINCT * stays rejected
    with pytest.raises(SparqlSyntaxError, match="DISTINCT"):
        sparql(tri, "SELECT (SUM(DISTINCT *) AS ?n) WHERE { ?s <p> ?o }")


# ------------------------------------------------- post-agg Extend


def test_expression_over_aggregate_alias(spark):
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"), ("b", "score", "5"),
    ])
    got = {
        (r["x"], r["n"], float(r["per"]))
        for r in sparql(tri, """
            SELECT ?x (COUNT(?s) AS ?n) (?n * 10 AS ?per)
            WHERE { ?x <score> ?s } GROUP BY ?x
            ORDER BY DESC(?per)
        """).collect()
    }
    assert got == {("a", 2, 20.0), ("b", 1, 10.0)}


def test_post_agg_expression_guards(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="GROUP BY key or aggregate"):
        sparql(tri, """
            SELECT (COUNT(?s) AS ?n) (STRLEN(?o) AS ?m)
            WHERE { ?s <p> ?o }
        """)


# ------------------------------------------------- expression aggregates


def test_aggregate_over_expression(spark):
    tri = _triples(spark, [
        ("a", "price", "3"), ("a", "qty", "4"),
        ("b", "price", "5"), ("b", "qty", "2"),
    ])
    got = {
        (r["s"], float(r["rev"]))
        for r in sparql(tri, """
            SELECT ?s (SUM(?p * ?q) AS ?rev)
            WHERE { ?s <price> ?p . ?s <qty> ?q } GROUP BY ?s
        """).collect()
    }
    assert got == {("a", 12.0), ("b", 10.0)}
    row = sparql(tri, """
        SELECT (MAX(STRLEN(?p)) AS ?m) (COUNT(?p * 2) AS ?n)
        WHERE { ?s <price> ?p }
    """).collect()[0]
    assert (row["m"], row["n"]) == (1, 2)


def test_aggregate_expression_unbound_guard(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql(tri, "SELECT (SUM(?zz * 2) AS ?x) WHERE { ?s <p> ?o }")


# ------------------------------------------------- ORDER BY expressions


def test_order_by_expression(spark):
    tri = _triples(spark, [
        ("a", "name", "al"), ("b", "name", "bee"), ("c", "name", "candle"),
    ])
    got = [r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <name> ?n } ORDER BY DESC(STRLEN(?n))
    """).collect()]
    assert got == ["c", "b", "a"]
    # expression over an aggregate alias in the agg branch
    tri2 = _triples(spark, [
        ("a", "v", "1"), ("a", "v", "2"), ("b", "v", "9"),
    ])
    got = [r["x"] for r in sparql(tri2, """
        SELECT ?x (COUNT(?o) AS ?n) WHERE { ?x <v> ?o } GROUP BY ?x
        ORDER BY ASC(?n * -1)
    """).collect()]
    assert got == ["a", "b"]
    with pytest.raises(SparqlSyntaxError, match="not bound"):
        sparql(tri, """
            SELECT ?s WHERE { ?s <name> ?n } ORDER BY DESC(STRLEN(?zz))
        """)


# ------------------------------------------------- type-error semantics


def test_numeric_type_errors_are_unbound_not_exceptions(spark):
    """SPARQL semantics under Spark's ANSI mode: a non-numeric term in
    a numeric comparison / arithmetic / SUM is a SPARQL type error —
    the solution drops (filter) or the value is unbound (NULL), it
    must NOT raise CAST_INVALID_INPUT and kill the job."""
    tri = _triples(spark, [
        ("a", "p", "10"), ("b", "p", "oops"), ("c", "p", "3"),
    ])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v . FILTER(?v > 5) }
    """).collect()}
    assert got == {"a"}
    # arithmetic over a non-number is unbound, COALESCE recovers
    # (STR() stringifies the numeric — Spark's static typing would
    # otherwise coerce the string fallback to double)
    got = {(r["s"], r["d"]) for r in sparql(tri, """
        SELECT ?s (COALESCE(STR(?v * 2), "n/a") AS ?d) WHERE { ?s <p> ?v }
    """).collect()}
    assert got == {("a", "20.0"), ("b", "n/a"), ("c", "6.0")}
    # SUM skips the type-error term instead of raising
    row = sparql(tri, """
        SELECT (SUM(?v) AS ?t) (COUNT(?v) AS ?n) WHERE { ?s <p> ?v }
    """).collect()[0]
    assert (float(row["t"]), row["n"]) == (13.0, 3)


def test_division_by_zero_is_unbound(spark):
    tri = _triples(spark, [("a", "p", "0"), ("b", "p", "4")])
    got = {(r["s"], r["d"]) for r in sparql(tri, """
        SELECT ?s (COALESCE(STR(8 / ?v), "err") AS ?d) WHERE { ?s <p> ?v }
    """).collect()}
    assert got == {("a", "err"), ("b", "2.0")}
    # ... and in FILTER position the solution just drops
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v . FILTER(8 / ?v = 2) }
    """).collect()}
    assert got == {"b"}


# ------------------------------------------------- union dtype fix


def test_union_bind_numeric_var_keeps_dtype(spark):
    """sol_union NULL-fills a variable missing from an arm with the
    dtype the binding arm gives it — a BIND-computed numeric column
    must not be silently cast to string."""
    tri = _triples(spark, [("a", "name", "Ada"), ("b", "alias", "B")])
    out = sparql(tri, """
        SELECT ?s ?n WHERE {
            { ?s <name> ?v BIND(STRLEN(?v) AS ?n) }
            UNION { ?s <alias> ?w }
        }
    """)
    assert dict(out.dtypes)["n"] == "int"
    got = {(r["s"], r["n"]) for r in out.collect()}
    assert got == {("a", 3), ("b", None)}


# ------------------------------------------------- digests / dateTime


def test_hash_builtins(spark):
    """SPARQL 1.1 §17.4.4.11-15: MD5/SHA* of the UTF-8 lexical form,
    lowercase hex — compiled to the JVM digest builtins."""
    import hashlib

    tri = _triples(spark, [("a", "name", "Ada"), ("b", "name", "Bob")])
    out = sparql(tri, """
        SELECT ?x (MD5(?n) AS ?h5) (SHA1(?n) AS ?h1)
               (SHA256(?n) AS ?h256) (SHA512(?n) AS ?h512)
        WHERE { ?x <name> ?n }
    """)
    rows = {r["x"]: r for r in out.collect()}
    for x, text in (("a", "Ada"), ("b", "Bob")):
        b = text.encode()
        assert rows[x]["h5"] == hashlib.md5(b).hexdigest()
        assert rows[x]["h1"] == hashlib.sha1(b).hexdigest()
        assert rows[x]["h256"] == hashlib.sha256(b).hexdigest()
        assert rows[x]["h512"] == hashlib.sha512(b).hexdigest()


def test_hash_builtin_in_filter(spark):
    import hashlib

    tri = _triples(spark, [("a", "name", "Ada"), ("b", "name", "Bob")])
    want = hashlib.sha256(b"Bob").hexdigest()
    got = {r["x"] for r in sparql(
        tri, f'SELECT ?x WHERE {{ ?x <name> ?n FILTER(SHA256(?n) = "{want}") }}'
    ).collect()}
    assert got == {"b"}


def test_datetime_accessors(spark):
    """YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS over xsd:dateTime lexical
    forms; a non-dateTime term is a type error -> unbound (NULL)."""
    tri = _triples(spark, [
        ("e1", "at", "2024-03-05T12:34:56"),
        ("e2", "at", "not-a-date"),
    ])
    out = sparql(tri, """
        SELECT ?s (YEAR(?t) AS ?y) (MONTH(?t) AS ?mo) (DAY(?t) AS ?d)
               (HOURS(?t) AS ?h) (MINUTES(?t) AS ?mi) (SECONDS(?t) AS ?sec)
        WHERE { ?s <at> ?t }
    """)
    rows = {r["s"]: r for r in out.collect()}
    assert (rows["e1"]["y"], rows["e1"]["mo"], rows["e1"]["d"]) == (2024, 3, 5)
    assert (rows["e1"]["h"], rows["e1"]["mi"], rows["e1"]["sec"]) == (12, 34, 56)
    assert all(rows["e2"][c] is None for c in ("y", "mo", "d", "h", "mi", "sec"))


def test_datetime_accessor_numeric_context(spark):
    """Accessors are numeric nodes: comparisons and arithmetic work
    without explicit casts (and filter out the unbound row)."""
    tri = _triples(spark, [
        ("e1", "at", "2023-12-31T23:59:59"),
        ("e2", "at", "2024-01-01T00:00:00"),
        ("e3", "at", "junk"),
    ])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <at> ?t FILTER(YEAR(?t) >= 2024) }
    """).collect()}
    assert got == {"e2"}


# --------------------------------------------- GROUP_CONCAT SEPARATOR


def test_group_concat_separator(spark):
    """GROUP_CONCAT(?x; SEPARATOR="...") (§18.5.1.7); members sort for
    determinism at any parallelism, default separator stays a space."""
    tri = _triples(spark, [
        ("a", "tag", "x"), ("a", "tag", "y"), ("b", "tag", "z"),
        ("a", "mark", "m1"), ("a", "mark", "m2"),
    ])
    got = {(r["s"], r["tags"]) for r in sparql(tri, """
        SELECT ?s (GROUP_CONCAT(DISTINCT ?t; SEPARATOR=", ") AS ?tags)
        WHERE { ?s <tag> ?t } GROUP BY ?s
    """).collect()}
    assert got == {("a", "x, y"), ("b", "z")}
    # multiset multiplicity (via the two ?m join partners) without
    # DISTINCT; RDF graphs are triple sets, so duplicates must come
    # from solutions, not repeated input rows
    got = {(r["s"], r["tags"]) for r in sparql(tri, """
        SELECT ?s (GROUP_CONCAT(?t) AS ?tags)
        WHERE { ?s <tag> ?t . ?s <mark> ?m } GROUP BY ?s
    """).collect()}
    assert got == {("a", "x x y y")}


def test_separator_guards(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="only applies"):
        sparql(tri, """
            SELECT (COUNT(?o; SEPARATOR=",") AS ?n) WHERE { ?s <p> ?o }
        """)


# ------------------------------------------- negated property sets


def test_negated_property_set_text_surface(spark):
    """`!` in the predicate slot: !iri, !(iri|iri), inverse members,
    postfix modifiers — spec §18.2.2.3 split into forward/inverse
    not-in edge scans."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("a", "likes", "c"), ("b", "hates", "c"),
    ])
    got = {(r["s"], r["o"]) for r in sparql(tri, """
        SELECT ?s ?o WHERE { ?s !<knows> ?o }
    """).collect()}
    assert got == {("a", "c"), ("b", "c")}
    got = {(r["s"], r["o"]) for r in sparql(tri, """
        SELECT ?s ?o WHERE { ?s !(<knows>|<likes>) ?o }
    """).collect()}
    assert got == {("b", "c")}
    # inverse member: edges arriving at ?s by any predicate but likes
    got = {(r["s"], r["o"]) for r in sparql(tri, """
        SELECT ?s ?o WHERE { ?s !(^<likes>) ?o }
    """).collect()}
    assert got == {("b", "a"), ("c", "b")}
    # composes with sequencing and a plain pattern join
    got = {(r["s"], r["o"]) for r in sparql(tri, """
        SELECT ?s ?o WHERE { ?s !<likes>/<hates> ?o }
    """).collect()}
    assert got == {("a", "c")}


# ---------------------------------------------------- blank nodes


def test_blank_node_syntax(spark):
    """[] anonymous nodes, [ pred obj ; ... ] property lists, and
    _:label blank nodes compile to internal !-prefixed variables:
    they join like variables, never project (spec §19.6), and cannot
    collide with user ?vars (! is outside the VAR token grammar)."""
    tri = _triples(spark, [
        ("a", "knows", "b"), ("b", "name", "Bob"), ("b", "age", "30"),
        ("c", "name", "Cai"),
    ])
    # [] = fresh anonymous variable
    got = {r["s"] for r in sparql(
        tri, "SELECT ?s WHERE { ?s <knows> [] }"
    ).collect()}
    assert got == {"a"}
    # object-position property list
    got = {r["n"] for r in sparql(tri, """
        SELECT ?n WHERE { ?s <knows> [ <name> ?n ] }
    """).collect()}
    assert got == {"Bob"}
    # subject-position property list as the whole statement, with ;
    got = {r["n"] for r in sparql(tri, """
        SELECT ?n WHERE { [ <name> ?n ; <age> "30" ] . }
    """).collect()}
    assert got == {"Bob"}
    # nested property lists
    got = {r["n"] for r in sparql(tri, """
        SELECT ?n WHERE { [ <knows> [ <name> ?n ] ] . }
    """).collect()}
    assert got == {"Bob"}
    # _:label is stable across patterns (a real join variable)
    got = {(r["a"], r["n"]) for r in sparql(tri, """
        SELECT ?a ?n WHERE { ?a <knows> _:x . _:x <name> ?n }
    """).collect()}
    assert got == {("a", "Bob")}


def test_blank_nodes_never_project(spark):
    tri = _triples(spark, [("a", "knows", "b"), ("b", "name", "Bob")])
    out = sparql(tri, "SELECT * WHERE { ?s <knows> [ <name> ?n ] }")
    assert set(out.columns) == {"s", "n"}
    assert {(r["s"], r["n"]) for r in out.collect()} == {("a", "Bob")}


def test_blank_node_guards(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="blank node"):
        sparql(tri, """
            CONSTRUCT { ?s <p2> [] } WHERE { ?s <p> ?o }
        """)
    with pytest.raises(SparqlSyntaxError, match="ground triples"):
        sparql(tri, 'INSERT DATA { [] <p> "x" }')
    with pytest.raises(SparqlSyntaxError):
        sparql(tri, 'SELECT ?s WHERE { ?s <p> ?o VALUES ?o { [] } }')


def test_isnumeric_and_encode_for_uri(spark):
    tri = _triples(spark, [
        ("a", "p", "42.5"), ("b", "p", "nope"), ("c", "p", "Los Angeles"),
    ])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(isNumeric(?v)) }
    """).collect()}
    assert got == {"a"}
    got = {(r["s"], r["e"]) for r in sparql(tri, """
        SELECT ?s (ENCODE_FOR_URI(?v) AS ?e)
        WHERE { ?s <p> ?v FILTER(?s = "c") }
    """).collect()}
    assert got == {("c", "Los%20Angeles")}  # spec §17.4.2.8 example
    # RFC 3986 unreserved set: ~ stays, * escapes, others %XX uppercase
    tri2 = _triples(spark, [("x", "p", "a~b*c/d e")])
    got = [r["e"] for r in sparql(tri2, """
        SELECT (ENCODE_FOR_URI(?v) AS ?e) WHERE { ?s <p> ?v }
    """).collect()]
    assert got == ["a~b%2Ac%2Fd%20e"]


def test_property_path_in_graph_block(spark):
    """Paths inside a constant-IRI GRAPH block evaluate over that
    graph's edges only; default-graph path patterns on a quad table
    never see named-graph rows; variable-graph paths stay rejected."""
    quads = spark.createDataFrame(
        [
            ("a", "sub", "b", None), ("b", "sub", "c", None),
            ("a", "sub", "z", "g1"), ("z", "sub", "w", "g1"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    got = {(r["x"], r["y"]) for r in sparql(quads, """
        SELECT ?x ?y WHERE { GRAPH <g1> { ?x <sub>+ ?y } }
    """).collect()}
    assert got == {("a", "z"), ("z", "w"), ("a", "w")}
    # default graph: the closure must not leak g1 edges
    got = {(r["x"], r["y"]) for r in sparql(quads, """
        SELECT ?x ?y WHERE { ?x <sub>+ ?y }
    """).collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}
    with pytest.raises(ValueError, match="constant GRAPH IRI"):
        sparql(quads, """
            SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <sub>+ ?y } }
        """).collect()


def test_from_and_from_named(spark):
    """FROM / FROM NAMED dataset clauses (spec §13.2): FROM graphs
    merge into the query's default graph; FROM NAMED restricts what
    GRAPH can address; any clause present defines the FULL dataset."""
    quads = spark.createDataFrame(
        [
            ("d", "p", "0", None),
            ("a", "p", "1", "g1"), ("b", "p", "2", "g2"),
            ("c", "p", "3", "g3"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    # FROM <g1> <g2>: default graph = g1+g2 merge; store default drops
    got = {r["s"] for r in sparql(quads, """
        SELECT ?s FROM <g1> FROM <g2> WHERE { ?s <p> ?o }
    """).collect()}
    assert got == {"a", "b"}
    # with FROM only, the named set is EMPTY: GRAPH matches nothing
    got = sparql(quads, """
        SELECT ?s FROM <g1> WHERE { GRAPH ?g { ?s <p> ?o } }
    """).count()
    assert got == 0
    # FROM NAMED only: default graph empty, GRAPH sees just g2
    got = {(r["g"], r["s"]) for r in sparql(quads, """
        SELECT ?g ?s FROM NAMED <g2> WHERE { GRAPH ?g { ?s <p> ?o } }
    """).collect()}
    assert got == {("g2", "b")}
    assert sparql(
        quads, "SELECT ?s FROM NAMED <g2> WHERE { ?s <p> ?o }"
    ).count() == 0
    # both sides together
    got = {(r["s"], r["t"]) for r in sparql(quads, """
        SELECT ?s ?t FROM <g1> FROM NAMED <g3> WHERE {
            ?s <p> ?o . GRAPH <g3> { ?t <p> ?o3 }
        }
    """).collect()}
    assert got == {("a", "c")}
    # ASK takes dataset clauses too
    assert sparql(quads, "ASK FROM <g3> { ?s <p> ?o }") is True
    # a plain triple table cannot answer dataset clauses
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="graph"):
        sparql(tri, "SELECT ?s FROM <g1> WHERE { ?s <p> ?o }")


def test_exponent_numeric_literals(spark):
    tri = _triples(spark, [("a", "p", "2000"), ("b", "p", "100")])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(?v > 1.5e3) }
    """).collect()}
    assert got == {"a"}
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(?v = 1E2) }
    """).collect()}
    assert got == {"b"}


# --------------------------------------- review-pass hardening (r5)


def test_in_list_numeric_coercion_ansi_safe(spark):
    """?x IN (1, 2) over a store containing non-numeric terms must
    treat the type error as unbound (row drops), not die on ANSI
    CAST_INVALID_INPUT."""
    tri = _triples(spark, [("a", "p", "1"), ("b", "p", "abc"),
                           ("c", "p", "2.0")])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(?v IN (1, 2)) }
    """).collect()}
    assert got == {"a", "c"}
    # NOT IN over a type error: "abc" != 1 errors (§17.4.1.10), the
    # && chain errors, the filter drops the row — so only rows whose
    # comparisons all succeed AND mismatch survive
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(?v NOT IN (1, 3)) }
    """).collect()}
    assert got == {"c"}  # 2.0 is numeric and matches neither
    # string items keep string comparison:
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(?v IN ("abc", "1")) }
    """).collect()}
    assert got == {"a", "b"}


def test_group_by_without_aggregates(spark):
    tri = _triples(spark, [
        ("a", "t", "x"), ("a", "t", "y"), ("b", "t", "x"),
    ])
    out = sparql(tri, "SELECT ?s WHERE { ?s <t> ?v } GROUP BY ?s")
    assert set(out.columns) == {"s"}
    assert sorted(r["s"] for r in out.collect()) == ["a", "b"]
    # HAVING over the group key
    got = sorted(r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <t> ?v } GROUP BY ?s HAVING (?s != "a")
    """).collect())
    assert got == ["b"]
    with pytest.raises(SparqlSyntaxError, match="not bound"):
        sparql(tri, "SELECT ?s WHERE { ?s <t> ?v } GROUP BY ?zz")


def test_aggregate_projection_applies(spark):
    """The SELECT list controls aggregate output columns: unprojected
    GROUP BY keys must not leak, and declared order holds."""
    tri = _triples(spark, [("a", "p", "1"), ("a", "p", "2"),
                           ("b", "p", "5")])
    out = sparql(tri, """
        SELECT (SUM(?v) AS ?total) WHERE { ?s <p> ?v } GROUP BY ?s
    """)
    assert out.columns == ["total"]
    assert sorted(float(r["total"]) for r in out.collect()) == [3.0, 5.0]
    out = sparql(tri, """
        SELECT (COUNT(?v) AS ?n) ?s WHERE { ?s <p> ?v } GROUP BY ?s
    """)
    assert out.columns == ["n", "s"]
    with pytest.raises(SparqlSyntaxError, match="GROUP BY key"):
        sparql(tri, """
            SELECT ?v (COUNT(?v) AS ?n) WHERE { ?s <p> ?v } GROUP BY ?s
        """)


def test_lang_on_table_without_obj_lang(spark):
    """A table carrying obj_is_literal/obj_datatype but no obj_lang
    (the serve-store shape) answers LANG() with unbound instead of an
    unresolved-column crash."""
    tri = spark.createDataFrame(
        [("a", "label", "hi", True, None)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_datatype string",
    )
    assert sparql(tri, """
        SELECT ?s WHERE { ?s <label> ?v FILTER(LANG(?v) = "en") }
    """).count() == 0
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <label> ?v FILTER(isLiteral(?v)) }
    """).collect()}
    assert got == {"a"}


def test_union_bag_semantics(spark):
    tri = _triples(spark, [("a", "p", "x")])
    q = """
        SELECT ?s WHERE { { ?s <p> "x" } UNION { ?s <p> "x" } }
    """
    assert [r["s"] for r in sparql(tri, q).collect()] == ["a", "a"]
    qd = """
        SELECT DISTINCT ?s WHERE { { ?s <p> "x" } UNION { ?s <p> "x" } }
    """
    assert [r["s"] for r in sparql(tri, qd).collect()] == ["a"]


def test_if_numeric_comparison_ansi_safe(spark):
    tri = _triples(spark, [("a", "p", "1"), ("b", "p", "zzz")])
    got = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <p> ?v FILTER(IF(BOUND(?v), 1, 2) = ?v) }
    """).collect()}
    assert got == {"a"}


def test_round_ties_toward_positive_infinity(spark):
    tri = _triples(spark, [("a", "p", "-2.5"), ("b", "p", "2.5")])
    got = {(r["s"], float(r["r"])) for r in sparql(tri, """
        SELECT ?s (ROUND(?v) AS ?r) WHERE { ?s <p> ?v }
    """).collect()}
    assert got == {("a", -2.0), ("b", 3.0)}  # fn:round, not HALF_UP


def test_bind_unbound_reference_is_syntax_error(spark):
    tri = _triples(spark, [("a", "p", "1")])
    with pytest.raises(SparqlSyntaxError, match="BIND references"):
        sparql(tri, """
            SELECT ?z WHERE { ?s <p> ?o BIND(?missing + 1 AS ?z) }
        """)


def test_bare_aggregates_in_having_and_order_by(spark):
    """HAVING (COUNT(?x) > n) and ORDER BY DESC(SUM(?x)) without a
    SELECT alias — hoisted into hidden aggregate columns that never
    reach the output."""
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"),
        ("b", "score", "9"), ("c", "score", "3"), ("c", "score", "4"),
    ])
    out = sparql(tri, """
        SELECT ?s WHERE { ?s <score> ?v } GROUP BY ?s
        HAVING (COUNT(?v) >= 2)
        ORDER BY DESC(SUM(?v))
    """)
    assert out.columns == ["s"]
    assert [r["s"] for r in out.collect()] == ["c", "a"]
    # combined with a projected aggregate, and COUNT(*) form
    out = sparql(tri, """
        SELECT ?s (MIN(?v) AS ?lo) WHERE { ?s <score> ?v } GROUP BY ?s
        HAVING (COUNT(*) = 1) ORDER BY ?s
    """)
    assert out.columns == ["s", "lo"]
    assert [(r["s"], r["lo"]) for r in out.collect()] == [("b", "9")]
    # implicit whole-solution group: HAVING over COUNT with no GROUP BY
    n = sparql(tri, """
        SELECT (COUNT(?v) AS ?n) WHERE { ?s <score> ?v }
        HAVING (COUNT(?v) > 100)
    """).count()
    assert n == 0
    # aggregates stay illegal in FILTER position
    with pytest.raises(SparqlSyntaxError, match="unsupported FILTER"):
        sparql(tri, """
            SELECT ?s WHERE { ?s <score> ?v FILTER(COUNT(?v) > 1) }
        """)


def test_hoisting_review_fixes(spark):
    """Second review pass on the hoisting machinery: dedup parity
    between aliased and bare aggregates, GROUP_CONCAT SEPARATOR in
    HAVING, nested-aggregate rejection, no ?_hagg shadowing, and
    identical aggregates computed once (same alias reused)."""
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"), ("b", "score", "9"),
    ])
    # GROUP_CONCAT with SEPARATOR works in HAVING via the shared parser
    got = [r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <score> ?v } GROUP BY ?s
        HAVING (GROUP_CONCAT(?v; SEPARATOR=",") = "1,2")
    """).collect()]
    assert got == ["a"]
    # nested aggregates are a parse-time error
    with pytest.raises(SparqlSyntaxError, match="unsupported FILTER"):
        sparql(tri, """
            SELECT ?s WHERE { ?s <score> ?v } GROUP BY ?s
            HAVING (SUM(COUNT(?v)) > 1)
        """)
    # a user variable literally named ?_hagg_0 cannot be shadowed
    tri2 = _triples(spark, [("a", "p", "x"), ("a", "p", "y")])
    got = {(r["s"], r["_hagg_0"]) for r in sparql(tri2, """
        SELECT ?s ?_hagg_0 WHERE { ?s <p> ?_hagg_0 }
        GROUP BY ?s ?_hagg_0 HAVING (COUNT(?s) >= 1)
    """).collect()}
    assert got == {("a", "x"), ("a", "y")}


def test_ask_construct_with_modifiers(spark):
    """Solution modifiers are legal on every query form: ASK respects
    HAVING/LIMIT, CONSTRUCT slices its solution sequence before
    templating."""
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "2"), ("b", "score", "9"),
    ])
    assert sparql(tri, """
        ASK WHERE { ?s <score> ?v } HAVING (COUNT(?v) > 100)
    """) is False
    assert sparql(tri, """
        ASK WHERE { ?s <score> ?v } HAVING (COUNT(?v) >= 3)
    """) is True
    assert sparql(tri, "ASK { ?s <score> ?v } LIMIT 0") is False
    out = sparql(tri, """
        CONSTRUCT { ?s <seen> ?v } WHERE { ?s <score> ?v }
        ORDER BY DESC(?v) LIMIT 1
    """)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {("b", "seen", "9")}


def test_describe_var_with_limit(spark):
    tri = _triples(spark, [
        ("a", "knows", "b"), ("a", "knows", "c"), ("b", "name", "Bob"),
        ("c", "name", "Cai"),
    ])
    out = sparql(tri, """
        DESCRIBE ?x WHERE { <a> <knows> ?x } ORDER BY ?x LIMIT 1
    """)
    got = {(r["subj"], r["obj"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "Bob")}  # only ?x = b described


def test_projecting_never_bound_variable(spark):
    """SELECT ?s ?nope over a WHERE that never binds ?nope: legal, the
    column is unbound (§18.2.1), not an AnalysisException."""
    tri = _triples(spark, [("a", "p", "1")])
    out = sparql(tri, "SELECT ?s ?nope WHERE { ?s <p> ?o }")
    assert out.columns == ["s", "nope"]
    assert [(r["s"], r["nope"]) for r in out.collect()] == [("a", None)]


def test_bare_agg_dedup_parity_with_duplicate_rows(spark):
    """A physically duplicated triple row must be counted identically
    by HAVING (COUNT(?v) >= 2) and the aliased SELECT form (both
    dedup at the BGP: the graph is a triple SET)."""
    tri = _triples(spark, [
        ("a", "score", "1"), ("a", "score", "1"),  # duplicate row
        ("b", "score", "2"), ("b", "score", "3"),
    ])
    bare = {r["s"] for r in sparql(tri, """
        SELECT ?s WHERE { ?s <score> ?v } GROUP BY ?s
        HAVING (COUNT(?v) >= 2)
    """).collect()}
    aliased = {r["s"] for r in sparql(tri, """
        SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s <score> ?v } GROUP BY ?s
        HAVING (?n >= 2)
    """).collect()}
    assert bare == aliased == {"b"}


def test_group_by_expression_keys(spark):
    """GROUP BY (expr AS ?v) binds a visible key variable; an
    anonymous (expr) groups on a hidden column that never reaches the
    output (§18.2.4 GroupCondition)."""
    tri = _triples(spark, [
        ("a", "name", "apple"), ("b", "name", "avocado"),
        ("c", "name", "banana"),
    ])
    got = {(r["initial"], r["n"]) for r in sparql(tri, """
        SELECT ?initial (COUNT(?v) AS ?n) WHERE { ?s <name> ?v }
        GROUP BY (SUBSTR(?v, 1, 1) AS ?initial)
    """).collect()}
    assert got == {("a", 2), ("b", 1)}
    # anonymous expression key: grouped correctly, column hidden
    out = sparql(tri, """
        SELECT (COUNT(?v) AS ?n) WHERE { ?s <name> ?v }
        GROUP BY (SUBSTR(?v, 1, 1))
    """)
    assert out.columns == ["n"]
    assert sorted(r["n"] for r in out.collect()) == [1, 2]
    # mixed var + aliased expression keys, HAVING over the alias
    got = {(r["s"], r["k"]) for r in sparql(tri, """
        SELECT ?s ?k WHERE { ?s <name> ?v }
        GROUP BY ?s (STRLEN(?v) AS ?k) HAVING (?k > 5)
    """).collect()}
    assert got == {("b", 7), ("c", 6)}
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql(tri, """
            SELECT (COUNT(?v) AS ?n) WHERE { ?s <name> ?v }
            GROUP BY (STRLEN(?zz))
        """)


def test_group_key_review_fixes(spark):
    """Third review pass: aggregate args may reference group-key
    aliases, GROUP BY (?x) is the plain variable (projectable), alias
    collisions with aggregate aliases are parse-level errors, and
    COUNT(DISTINCT *) ignores internal blank-node columns."""
    tri = _triples(spark, [("a", "p", "xy"), ("b", "p", "z")])
    got = {(r["k"], float(r["t"])) for r in sparql(tri, """
        SELECT ?k (SUM(?k + 1) AS ?t) WHERE { ?s <p> ?o }
        GROUP BY (STRLEN(?o) AS ?k)
    """).collect()}
    assert got == {(2, 3.0), (1, 2.0)}
    got = {r["o"] for r in sparql(tri, """
        SELECT ?o WHERE { ?s <p> ?o } GROUP BY (?o)
    """).collect()}
    assert got == {"xy", "z"}
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        sparql(tri, """
            SELECT (COUNT(?o) AS ?n) WHERE { ?s <p> ?o }
            GROUP BY (STRLEN(?o) AS ?n)
        """)
    tri2 = _triples(spark, [("a", "p", "1"), ("a", "p", "2")])
    got = [r["n"] for r in sparql(tri2, """
        SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?s <p> [] }
    """).collect()]
    assert got == [1]  # blank-node bindings are not solution identity


def test_optional_filter_over_base_variables(spark):
    """OPTIONAL { P FILTER(F) } where F references BASE variables —
    the spec's LeftJoin(A, P, F) condition, evaluated as
    Filter(F, Join) ∪ Diff(A, P, F): a failing condition leaves the
    base row with the optional side unbound, never drops it."""
    tri = _triples(spark, [
        ("a", "lim", "5"), ("b", "lim", "1"), ("c", "lim", "3"),
        ("a", "val", "3"), ("b", "val", "4"), ("b", "val", "0"),
    ])
    got = {(r["s"], r["v"]) for r in sparql(tri, """
        SELECT ?s ?v WHERE {
            ?s <lim> ?m
            OPTIONAL { ?s <val> ?v FILTER(?v < ?m) }
        }
    """).collect()}
    # a: 3 < 5 keeps; b: only 0 < 1 survives; c: no val at all
    assert got == {("a", "3"), ("b", "0"), ("c", None)}
    # condition failing for EVERY partner -> unbound, row retained
    got = {(r["s"], r["v"]) for r in sparql(tri, """
        SELECT ?s ?v WHERE {
            ?s <lim> ?m
            OPTIONAL { ?s <val> ?v FILTER(?v > ?m) }
        }
    """).collect()}
    assert got == {("a", None), ("b", "4"), ("c", None)}
    # an erroring condition (numeric coercion of a non-number) counts
    # as not-true: unbound, row retained
    tri2 = _triples(spark, [
        ("x", "lim", "zz"), ("x", "val", "1"),
    ])
    got = {(r["s"], r["v"]) for r in sparql(tri2, """
        SELECT ?s ?v WHERE {
            ?s <lim> ?m OPTIONAL { ?s <val> ?v FILTER(?v < ?m + 0) }
        }
    """).collect()}
    assert got == {("x", None)}
    # genuinely unbound filter vars still error cleanly
    with pytest.raises(SparqlSyntaxError, match="not bound"):
        sparql(tri, """
            SELECT ?s WHERE {
                ?s <lim> ?m OPTIONAL { ?s <val> ?v FILTER(?v < ?zz) }
            }
        """)


def test_optional_filter_condition_with_nullable_shared_var(spark):
    """Review fix: Diff(A, P, F) uses ROW identity. A base row whose
    shared variable is NULL (from an earlier OPTIONAL) coalesces to
    the body's value in the join — by value identity it would both
    join AND reappear null-padded; by row identity it appears exactly
    once."""
    tri = _triples(spark, [
        ("s1", "p", "9"), ("s2", "p", "9"),
        ("s2", "q", "n1"), ("n1", "r", "3"),
    ])
    got = sorted(
        (r["s"], r["o"], r["x"], r["v"])
        for r in sparql(tri, """
            SELECT ?s ?o ?x ?v WHERE {
                ?s <p> ?o
                OPTIONAL { ?s <q> ?x }
                OPTIONAL { ?x <r> ?v FILTER(?v < ?o) }
            }
        """).collect()
    )
    # s1's x is unbound: it joins n1's r-edge compatibly (NULL
    # compatible with anything) and the filter passes -> ONE row;
    # a spec-illegal extra (s1, 9, None, None) must not appear
    assert got == [
        ("s1", "9", "n1", "3"),
        ("s2", "9", "n1", "3"),
    ]
    # meta builtins over base variables in the deferred filter reject
    # cleanly instead of dying on an unresolved column
    meta = _triples(spark, [
        ("a", "p", "hi", True, "en", None), ("a", "q", "x", False,
         None, None),
    ], meta=True)
    with pytest.raises(SparqlSyntaxError, match="base variables"):
        sparql(meta, """
            SELECT ?s WHERE {
                ?s <p> ?b OPTIONAL { ?s <q> ?v FILTER(LANG(?b) = "en") }
            }
        """)
