"""Property tests: the round-5 fully-recursive group compiler vs a
spec-faithful brute-force evaluator.

Random tiny graphs x random NESTED queries — OPTIONAL bodies holding
their own OPTIONAL / MINUS / FILTER EXISTS / FILTER, UNION arms with
uneven variable sets, filters, and MINUS inside, nested braced groups,
VALUES (incl. UNDEF) and BIND interleaved in document order. This is
the layer the round-5 ``_compile_group`` rewrite added (spec
§18.2.2.6 in-order translation with static maybe-unbound tracking for
the ``sol_join`` split-path plans) and where a regression would be
silent: unbound-compatibility joins, left-join-then-filter scoping,
MINUS domain overlap under NULLs.

The brute evaluator implements SPARQL 1.1 §8 directly over Python
dicts in the same document order. One documented engine deviation is
mirrored: UNION deduplicates its aligned arm solutions (set
semantics, `sol_union`); everything else is multiset. Results compare
as multisets of aligned tuples.
"""

import random
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NODES = [f"n{i}" for i in range(5)]
PREDS = ["p0", "p1", "p2"]


# ---------------------------------------------------------------- brute
def _eval_bgp(triples, patterns):
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
    # set semantics: the triple table is a set and every pattern
    # variable is kept, so distinct frozensets ARE the solutions
    return [dict(fs) for fs in {frozenset(b.items()) for b in sols}]


def _compat_merge(mu, nu):
    """Merge nu into mu under SPARQL compatibility; None = unbound.
    Returns the merged dict or None if incompatible."""
    merged = dict(nu)
    for k, v in mu.items():
        if v is None:
            merged.setdefault(k, None)
            continue
        nv = merged.get(k)
        if nv is not None and nv != v:
            return None
        merged[k] = v
    return merged


def _merge_sols(lv, ls, rv, rs, how):
    """Multiset compatibility join of solution lists; ``how`` is
    'inner' or 'left' (left keeps unmatched mu verbatim — the missing
    right vars read as unbound via .get)."""
    if ls is None:
        return set(lv) | set(rv), list(rs)
    out = []
    for mu in ls:
        hits = [m for nu in rs if (m := _compat_merge(mu, nu)) is not None]
        if hits:
            out.extend(hits)
        elif how == "left":
            out.append(dict(mu))
    return set(lv) | set(rv), out


def _apply_values(sols, vars_, rows):
    out = []
    for mu in sols:
        for row in rows:
            merged = dict(mu)
            ok = True
            for v, val in zip(vars_, row):
                if val is None:
                    merged.setdefault(v, None)
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
    out = []
    for mu in sols:
        removed = False
        for nu in probe:
            overlap, compatible = False, True
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
    out = []
    for mu in sols:
        hit = any(
            all(mu.get(v) is None or mu[v] == nv for v, nv in nu.items())
            for nu in probe
        )
        if hit != negate:
            out.append(mu)
    return out


def _filter_ok(f, mu):
    kind, a, b = f
    av = mu.get(a)
    if kind == "neq":
        bv = mu.get(b)
        return av is not None and bv is not None and av != bv
    # starts
    return av is not None and av.startswith(b)


def _beval(triples, g):
    """Evaluate a group dict -> (vars, multiset of solution dicts) in
    document order, filters + EXISTS at group end (mirroring
    ``_compile_group``)."""
    vars_, sols = set(), None
    for tag, payload in g["elements"]:
        if tag == "bgp":
            rv = {t[1:] for pat in payload for t in pat
                  if t.startswith("?")}
            vars_, sols = _merge_sols(
                vars_, sols, rv, _eval_bgp(triples, payload), "inner"
            )
        elif tag == "group":
            rv, rs = _beval(triples, payload)
            vars_, sols = _merge_sols(vars_, sols, rv, rs, "inner")
        elif tag == "optional":
            rv, rs = _beval(triples, payload)
            vars_, sols = _merge_sols(vars_, sols, rv, rs, "left")
        elif tag == "union":
            arms = [_beval(triples, a) for a in payload]
            av = set().union(*(v for v, _ in arms))
            order = sorted(av)
            seen, rs = set(), []
            for _, ss in arms:  # engine: aligned set-semantics union
                for mu in ss:
                    key = tuple(mu.get(v) for v in order)
                    if key not in seen:
                        seen.add(key)
                        rs.append(mu)
            vars_, sols = _merge_sols(vars_, sols, av, rs, "inner")
        elif tag == "minus":
            _, rs = _beval(triples, payload)
            sols = _apply_minus(sols, rs)
        elif tag == "values":
            vvars, rows = payload
            sols = _apply_values([{}] if sols is None else sols,
                                 vvars, rows)
            vars_ |= set(vvars)
        else:  # bind
            src, new = payload
            sols = [
                dict(mu, **{new: None if mu.get(src) is None
                            else mu[src] + "_k"})
                for mu in sols
            ]
            vars_.add(new)
    for negate, body in g["exists"]:
        _, rs = _beval(triples, body)
        sols = _apply_exists(sols, rs, negate)
    for f in g["filters"]:
        sols = [mu for mu in sols if _filter_ok(f, mu)]
    return vars_, sols


# ----------------------------------------------------------- generation
def _fmt(term):
    return term if term.startswith("?") else f"<{term}>"


def _render(g, indent="  "):
    lines = []
    for tag, payload in g["elements"]:
        if tag == "bgp":
            for s, p, o in payload:
                lines.append(f"{indent}{_fmt(s)} {_fmt(p)} {_fmt(o)} .")
        elif tag == "group":
            lines.append(indent + "{")
            lines.extend(_render(payload, indent + "  "))
            lines.append(indent + "}")
        elif tag == "optional":
            lines.append(indent + "OPTIONAL {")
            lines.extend(_render(payload, indent + "  "))
            lines.append(indent + "}")
        elif tag == "union":
            parts = []
            for arm in payload:
                parts.append(
                    "{\n" + "\n".join(_render(arm, indent + "  "))
                    + "\n" + indent + "}"
                )
            lines.append(indent + " UNION ".join(parts))
        elif tag == "minus":
            lines.append(indent + "MINUS {")
            lines.extend(_render(payload, indent + "  "))
            lines.append(indent + "}")
        elif tag == "values":
            vvars, rows = payload
            cells = " ".join(
                "(" + " ".join("UNDEF" if v is None else f"<{v}>"
                               for v in row) + ")"
                for row in rows
            )
            lines.append(
                f"{indent}VALUES (" + " ".join("?" + v for v in vvars)
                + f") {{ {cells} }}"
            )
        else:  # bind
            src, new = payload
            lines.append(
                f'{indent}BIND (CONCAT(?{src}, "_k") AS ?{new})'
            )
    for negate, body in g["exists"]:
        kw = "NOT EXISTS" if negate else "EXISTS"
        lines.append(indent + f"FILTER {kw} {{")
        lines.extend(_render(body, indent + "  "))
        lines.append(indent + "}")
    for kind, a, b in g["filters"]:
        if kind == "neq":
            lines.append(f"{indent}FILTER(?{a} != ?{b})")
        else:
            lines.append(f'{indent}FILTER(STRSTARTS(?{a}, "{b}"))')
    return lines


class _Gen:
    """Random nested-group generator honouring the engine's subset
    guards: every group leads with a BGP, OPTIONAL bodies share >=1
    variable with their base, MINUS/EXISTS bodies stay statically
    NULL-free (plain BGP + filter), filters use only group-local
    variables, BIND targets are fresh."""

    def __init__(self, rng):
        self.rng = rng
        self.fresh = 0

    def new_var(self):
        self.fresh += 1
        return f"v{self.fresh}"

    def pattern(self, must_var=None, pool=()):
        rng = self.rng
        mk = lambda: (  # noqa: E731
            "?" + rng.choice(pool) if pool and rng.random() < 0.6
            else rng.choice(NODES)
        )
        s, o = mk(), mk()
        if must_var is not None:
            if rng.random() < 0.5:
                s = "?" + must_var
            else:
                o = "?" + must_var
        return (s, rng.choice(PREDS), o)

    def plain_group(self, share_var, extra_filter=True):
        """A statically NULL-free group: one BGP (+ optional local
        filter) — legal as a MINUS / EXISTS body."""
        v = self.new_var()
        pats = [self.pattern(must_var=share_var, pool=[share_var, v])]
        g = {"elements": [("bgp", pats)], "filters": [], "exists": []}
        gv = sorted({t[1:] for pat in pats for t in pat
                     if t.startswith("?")})
        if extra_filter and gv and self.rng.random() < 0.3:
            g["filters"].append(
                ("starts", self.rng.choice(gv), self.rng.choice(NODES))
            )
        return g

    def group(self, outer_vars, depth):
        """A full group; ``outer_vars`` lists variables the enclosing
        scope guarantees bound (used to anchor OPTIONAL sharing)."""
        rng = self.rng
        base_share = rng.choice(outer_vars) if outer_vars else None
        v2 = self.new_var()
        pool = ([base_share] if base_share else []) + [v2]
        pats = [self.pattern(must_var=base_share
                             if base_share else v2, pool=pool)]
        if rng.random() < 0.4:
            pats.append(self.pattern(pool=pool))
        g = {"elements": [("bgp", pats)], "filters": [], "exists": []}
        bound = {t[1:] for pat in pats for t in pat if t.startswith("?")}

        n_extra = rng.randrange(0, 3 if depth > 0 else 2)
        for _ in range(n_extra):
            kind = rng.choice(
                ["optional", "union", "minus", "values", "bind",
                 "group", "exists"]
                if depth > 0 else ["minus", "values", "bind", "exists"]
            )
            anchor = rng.choice(sorted(bound))
            if kind == "optional":
                body = self.group([anchor], depth - 1)
                g["elements"].append(("optional", body))
                bound |= body["_vars"]
            elif kind == "union":
                arms = [self.group([anchor], depth - 1)
                        for _ in range(2)]
                g["elements"].append(("union", arms))
                for a in arms:
                    bound |= a["_vars"]
            elif kind == "minus":
                g["elements"].append(
                    ("minus", self.plain_group(anchor))
                )
            elif kind == "exists":
                g["exists"].append(
                    (rng.random() < 0.5, self.plain_group(anchor))
                )
            elif kind == "values":
                k = rng.randrange(1, 3)
                vvars = sorted(rng.sample(sorted(bound), min(k, len(bound))))
                rows = [
                    tuple(None if rng.random() < 0.3
                          else rng.choice(NODES) for _ in vvars)
                    for _ in range(rng.randrange(1, 4))
                ]
                g["elements"].append(("values", (vvars, rows)))
            elif kind == "group":
                body = self.group([anchor], 0)
                g["elements"].append(("group", body))
                bound |= body["_vars"]
            else:  # bind
                new = self.new_var()
                g["elements"].append(
                    ("bind", (rng.choice(sorted(bound)), new))
                )
                bound.add(new)
        if rng.random() < 0.4:
            a = rng.choice(sorted(bound))
            if rng.random() < 0.5 and len(bound) > 1:
                b = rng.choice(sorted(bound - {a}))
                g["filters"].append(("neq", a, b))
            else:
                g["filters"].append(("starts", a, rng.choice(NODES)))
        g["_vars"] = bound
        return g


def _gen_case(rng):
    triples = sorted({
        (rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES))
        for _ in range(rng.randrange(8, 22))
    })
    g = _Gen(rng).group([], depth=2)
    text = "SELECT * WHERE {\n" + "\n".join(_render(g)) + "\n}"
    return triples, g, text


# ---------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def _tdf_cache():
    return {}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(seed=st.integers(0, 2**30))
def test_nested_sparql_matches_bruteforce(spark, _tdf_cache, seed):
    from ontocast_spark.plans.sparql import sparql

    rng = random.Random(seed)
    triples, g, text = _gen_case(rng)
    key = tuple(triples)
    tdf = _tdf_cache.get(key)
    if tdf is None:
        tdf = spark.createDataFrame(
            triples, "subj string, pred string, obj string"
        ).cache()
        _tdf_cache[key] = tdf

    got_df = sparql(tdf, text)
    cols = sorted(got_df.columns)
    got = Counter(tuple(r[c] for c in cols) for r in got_df.collect())
    _, brute = _beval(triples, g)
    want = Counter(tuple(mu.get(c) for c in cols) for mu in brute)
    assert got == want, (seed, text)
