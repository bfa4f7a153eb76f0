"""Property tests: the SPARQL text front-end vs a spec-faithful
brute-force evaluator (VERDICT r4 next-step #8).

Random tiny graphs x random queries combining a base BGP with MINUS,
FILTER [NOT] EXISTS, VALUES (incl. UNDEF wildcard rows), and BIND —
the layer where the spec corners live (unbound compatibility, MINUS's
domain-overlap rule, EXISTS substitution semantics, VALUES multiset
join) and where a regression would be silent. The brute evaluator
implements SPARQL 1.1 §8 directly over Python dicts, mirroring the
engine's documented fixed clause order (base -> VALUES -> BIND ->
MINUS -> EXISTS); results compare as multisets.
"""

import random
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NODES = [f"n{i}" for i in range(5)]
PREDS = ["p0", "p1", "p2"]
BASE_VARS = ["x", "y", "z"]


# ---------------------------------------------------------------- brute
def _eval_bgp(triples, patterns):
    """Plain-BGP solutions as a SET of mappings (the triple table has
    set semantics and the projection keeps every pattern variable, so
    no duplicates can survive)."""
    sols = [dict()]
    for s, p, o in patterns:
        nxt = []
        for b0 in sols:
            for ts, tp, to in triples:
                b = dict(b0)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if term.startswith("?"):
                        v = term[1:]
                        if b.get(v, val) != val:
                            ok = False
                            break
                        b[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b)
        sols = nxt
    return [dict(fs) for fs in {frozenset(b.items()) for b in sols}]


def _apply_values(sols, vars_, rows):
    """Multiset compatibility join with the inline table; UNDEF (None)
    slots bind nothing."""
    out = []
    for mu in sols:
        for row in rows:
            merged = dict(mu)
            ok = True
            for v, val in zip(vars_, row):
                if val is None:
                    merged.setdefault(v, None)  # UNDEF binds nothing
                    continue
                cur = merged.get(v)
                if cur is not None and cur != val:
                    ok = False
                    break
                merged[v] = val
            if ok:
                out.append(merged)
    return out


def _apply_minus(sols, probe):
    """§8.3.3: drop mu iff some probe solution is compatible AND
    shares >=1 variable bound on BOTH sides (None = unbound: compatible
    with anything, no domain overlap)."""
    out = []
    for mu in sols:
        removed = False
        for nu in probe:
            overlap = False
            compatible = True
            for v, nv in nu.items():
                mv = mu.get(v)
                if mv is None:
                    continue
                if mv != nv:
                    compatible = False
                    break
                overlap = True
            if compatible and overlap:
                removed = True
                break
        if not removed:
            out.append(mu)
    return out


def _apply_exists(sols, probe, negate):
    """§8.1.1 substitution: only BOUND values constrain the pattern;
    a solution with every shared variable unbound reduces to a plain
    non-emptiness probe."""
    out = []
    for mu in sols:
        hit = any(
            all(mu.get(v) is None or mu[v] == nv for v, nv in nu.items())
            for nu in probe
        )
        if hit != negate:
            out.append(mu)
    return out


# ----------------------------------------------------------- generation
def _term(rng, var_pool, const_pool, p_var=0.6):
    if rng.random() < p_var:
        return "?" + rng.choice(var_pool)
    return rng.choice(const_pool)


def _pattern(rng, var_pool):
    return (
        _term(rng, var_pool, NODES),
        _term(rng, ["p"], PREDS, p_var=0.15),
        _term(rng, var_pool, NODES),
    )


def _fmt(term):
    if term == "?__bn":
        return "[]"  # the engine compiles [] to an internal join var
    return term if term.startswith("?") else f"<{term}>"


def _gen_case(rng):
    triples = sorted({
        (rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES))
        for _ in range(rng.randrange(8, 22))
    })
    n_base = rng.randrange(1, 3)
    base = [_pattern(rng, BASE_VARS) for _ in range(n_base)]
    # guarantee at least one variable overall
    if not any(t.startswith("?") for pat in base for t in pat):
        base[0] = ("?x", base[0][1], base[0][2])
    base_vars = sorted({t[1:] for pat in base for t in pat
                        if t.startswith("?")})
    if rng.random() < 0.4:
        # swap one base slot for a [] blank node: brute models it as
        # the variable ?__bn, the engine as an internal !-var; both
        # drop out of SELECT * and the comparison sees the multiset
        # the projection leaves behind
        i = rng.randrange(len(base))
        s, p, o = base[i]
        cand = ("?__bn", p, o) if rng.random() < 0.5 else (s, p, "?__bn")
        nb = base[:i] + [cand] + base[i + 1:]
        nvars = sorted(
            {t[1:] for pat in nb for t in pat if t.startswith("?")}
            - {"__bn"}
        )
        if nvars:  # keep at least one visible variable
            base, base_vars = nb, nvars
    lines = [
        f"  {_fmt(s)} {_fmt(p)} {_fmt(o)} ." for s, p, o in base
    ]
    clauses = []  # (kind, payload) in engine application order

    if rng.random() < 0.6:  # VALUES (maybe with UNDEF / a fresh var)
        vpool = base_vars + ["w"]
        k = rng.randrange(1, min(3, len(vpool)) + 1)
        vars_ = sorted(rng.sample(vpool, k))
        rows = []
        for _ in range(rng.randrange(1, 4)):
            rows.append(tuple(
                None if rng.random() < 0.3 else rng.choice(NODES)
                for _ in vars_
            ))
        cells = " ".join(
            "(" + " ".join("UNDEF" if v is None else f"<{v}>" for v in row)
            + ")" for row in rows
        )
        lines.append(
            "  VALUES (" + " ".join("?" + v for v in vars_) + ") "
            f"{{ {cells} }}"
        )
        clauses.append(("values", (vars_, rows)))

    if rng.random() < 0.5:  # BIND over a base variable
        src = rng.choice(base_vars)
        lines.append(f'  BIND (CONCAT(?{src}, "_k") AS ?b)')
        clauses.append(("bind", src))

    probe_vars = BASE_VARS + ["q", "b"]
    if rng.random() < 0.6:  # MINUS
        pat = _pattern(rng, probe_vars)
        lines.append(
            f"  MINUS {{ {_fmt(pat[0])} {_fmt(pat[1])} {_fmt(pat[2])} }}"
        )
        clauses.append(("minus", [pat]))

    if rng.random() < 0.6:  # FILTER [NOT] EXISTS
        pat = _pattern(rng, probe_vars)
        neg = rng.random() < 0.5
        kw = "NOT EXISTS" if neg else "EXISTS"
        lines.append(
            f"  FILTER {kw} {{ {_fmt(pat[0])} {_fmt(pat[1])} {_fmt(pat[2])} }}"
        )
        clauses.append(("exists", (neg, [pat])))

    text = "SELECT * WHERE {\n" + "\n".join(lines) + "\n}"
    return triples, base, clauses, text


def _brute(triples, base, clauses):
    sols = _eval_bgp(triples, base)
    for kind, payload in sorted(
        clauses, key=lambda c: ["values", "bind", "minus", "exists"].index(c[0])
    ):
        if kind == "values":
            sols = _apply_values(sols, *payload)
        elif kind == "bind":
            sols = [dict(mu, b=(mu[payload] + "_k")) for mu in sols]
        elif kind == "minus":
            sols = _apply_minus(sols, _eval_bgp(triples, payload))
        else:
            neg, pats = payload
            sols = _apply_exists(sols, _eval_bgp(triples, pats), neg)
    return sols


# ---------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def _tdf_cache():
    return {}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(seed=st.integers(0, 2**30))
def test_sparql_text_matches_bruteforce(spark, _tdf_cache, seed):
    from ontocast_spark.plans.sparql import sparql

    rng = random.Random(seed)
    triples, base, clauses, text = _gen_case(rng)
    key = tuple(triples)
    tdf = _tdf_cache.get(key)
    if tdf is None:
        tdf = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        ).cache()
        _tdf_cache[key] = tdf

    got_df = sparql(tdf, text)
    cols = sorted(got_df.columns)
    got = Counter(
        tuple(r[c] for c in cols) for r in got_df.collect()
    )
    want = Counter(
        tuple(mu.get(c) for c in cols) for mu in _brute(triples, base, clauses)
    )
    assert got == want, (seed, text)


def test_minus_spec_corners(spark):
    """Pinned §8.3.3 corners the random sweep may not always draw:
    disjoint-domain MINUS removes nothing; an UNDEF-valued shared var
    is compatible but contributes no domain overlap."""
    from ontocast_spark.plans.sparql import sparql

    tdf = spark.createDataFrame(
        [("a", "p0", "b"), ("c", "p0", "d"), ("a", "p1", "x")],
        "subj string, pred string, obj string",
    )
    # probe shares no variable -> nothing removed
    got = sorted(r["s"] for r in sparql(
        tdf, "SELECT ?s WHERE { ?s <p0> ?o MINUS { ?u <p1> ?v } }"
    ).collect())
    assert got == ["a", "c"]
    # UNDEF leaves ?s unbound in one VALUES row: that row survives the
    # MINUS (no overlap on ?s), the bound row <a> is removed
    got2 = [r["s"] for r in sparql(tdf, """
        SELECT ?s WHERE {
          VALUES ?s { <a> UNDEF }
          ?x <p0> ?y .
          MINUS { ?s <p1> ?z }
        }
    """).collect()]
    # base (2 sols) x rows: <a> rows overlap+match the probe -> removed;
    # the UNDEF rows have no domain overlap on ?s -> both survive
    assert got2 == [None, None]


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**30))
def test_parser_total_on_token_soup(seed):
    """Robustness: any whitespace-joined soup of valid SPARQL tokens
    either parses or raises SparqlSyntaxError — never IndexError /
    AttributeError / an unbounded loop. (The tokenizer rejects
    non-token input with SparqlSyntaxError already.)"""
    from ontocast_spark.plans.sparql import SparqlSyntaxError, parse_sparql

    rng = random.Random(seed)
    toks = [
        "SELECT", "?x", "?y", "WHERE", "{", "}", "(", ")", "FILTER",
        "OPTIONAL", "UNION", "<a>", '"s"', "42", ".", ";", ",", "*",
        "a", "[", "]", "!", "^", "|", "/", "MINUS", "VALUES", "BIND",
        "AS", "UNDEF", "SERVICE", "GROUP", "BY", "ORDER", "LIMIT",
        "_:b", "PREFIX", "ex:", "p:q", "ASK", "CONSTRUCT", "DELETE",
        "INSERT", "DATA", "COUNT", "DISTINCT", "=", "&&", "||",
    ]
    text = " ".join(
        rng.choice(toks) for _ in range(rng.randrange(1, 14))
    )
    try:
        parse_sparql(text)
    except SparqlSyntaxError:
        pass


def test_aggregate_queries_match_bruteforce(spark):
    """Seeded random GROUP BY + COUNT/SUM/MIN/MAX queries vs a plain
    Python evaluator over the same tiny graphs — covers grouping,
    bare HAVING aggregates, and the hoisting machinery end-to-end
    without DuckDB."""
    from collections import defaultdict

    from ontocast_spark.plans.sparql import sparql

    rng = random.Random(77)
    for _ in range(6):
        triples = sorted({
            (rng.choice(NODES), "p0", str(rng.randrange(1, 9)))
            for _ in range(rng.randrange(6, 16))
        })
        tdf = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        )
        fn = rng.choice(["COUNT", "SUM", "MIN", "MAX"])
        thresh = rng.randrange(1, 3)
        text = f"""
            SELECT ?s ({fn}(?v) AS ?agg) WHERE {{ ?s <p0> ?v }}
            GROUP BY ?s HAVING (COUNT(?v) >= {thresh})
        """
        got = {
            (r["s"], float(r["agg"]) if fn != "COUNT" else int(r["agg"]))
            for r in sparql(tdf, text).collect()
        }
        groups = defaultdict(list)
        for s, _, v in triples:
            groups[s].append(v)
        want = set()
        for s, vals in groups.items():
            if len(vals) < thresh:
                continue
            if fn == "COUNT":
                want.add((s, len(vals)))
            elif fn == "SUM":
                want.add((s, float(sum(float(v) for v in vals))))
            elif fn == "MIN":
                want.add((s, float(min(vals))))  # lexical min
            else:
                want.add((s, float(max(vals))))
        assert got == want, (fn, thresh, triples)


def test_optional_filter_condition_matches_bruteforce(spark):
    """Seeded random LeftJoin(A, P, F) cases with F over BOTH sides —
    engine vs a direct implementation of the spec's LeftJoin
    definition (Filter(F, Join) ∪ Diff(A, P, F))."""
    from ontocast_spark.plans.sparql import sparql

    rng = random.Random(123)
    for _ in range(6):
        triples = sorted({
            (rng.choice(NODES), rng.choice(["base", "opt"]),
             str(rng.randrange(1, 6)))
            for _ in range(rng.randrange(6, 16))
        })
        tdf = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        )
        op = rng.choice(["<", ">", "=", "!="])
        text = f"""
            SELECT ?s ?b ?v WHERE {{
                ?s <base> ?b
                OPTIONAL {{ ?s <opt> ?v FILTER(?v {op} ?b) }}
            }}
        """
        got = Counter(
            (r["s"], r["b"], r["v"]) for r in sparql(tdf, text).collect()
        )
        # brute: for each base row, partners satisfying F, else NULL
        import operator
        ops = {"<": operator.lt, ">": operator.gt,
               "=": operator.eq, "!=": operator.ne}
        want: Counter = Counter()
        for s, p, b in triples:
            if p != "base":
                continue
            partners = [
                v for s2, p2, v in triples
                if s2 == s and p2 == "opt" and ops[op](v, b)
            ]
            if partners:
                for v in partners:
                    want[(s, b, v)] += 1
            else:
                want[(s, b, None)] += 1
        assert got == want, (op, triples)
