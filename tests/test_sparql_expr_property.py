"""Property test for the SPARQL expression compiler
(plans/sparql.py:_compile_expr): random typed expression trees —
arithmetic with numeric coercion over lexical terms, three-valued
logic, IN, string builtins, COALESCE/IF — rendered to query text and
evaluated by Spark, then checked against a pure-Python reference
evaluator that mirrors the documented semantics (type error ->
unbound/NULL, divide-by-zero -> NULL, SQL/SPARQL Kleene logic).
Numeric results compare EXACTLY: both sides compute in IEEE doubles.
Solutions come from ``?s <v> ?x OPTIONAL { ?s <w> ?y }`` so ?y
exercises the NULL paths."""

import math
import random

import pytest

from ontocast_spark.plans.sparql import sparql

VALUES = ["0", "3", "-2", "2.5", "10", "abc", "B", "bc", ""]
NUM_LITS = [0.0, 1.0, 2.0, 3.0, 5.0, 10.0, 2.5, -2.0]
STR_LITS = ["abc", "B", "x", ""]


#: node kinds the compiler's _is_numeric_node treats as numeric
_NUM_KINDS = {"num", "arith", "slen", "absf", "ceilf", "floorf"}


def _fnum(v):
    """Mirror of try_cast('double') over a lexical term."""
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


# ----------------------------------------------------- generators
# nodes are (kind, ...) tuples rendered to text by _render and
# evaluated by _eval; kinds: num, str, nvar, svar, arith, slen,
# absf, ceilf, floorf, iff, ucase, lcase, concat, coalesce, substr,
# strbefore, strafter, cmp, scmp, inlist, orx, andx, notx, bound,
# contains, starts


def _gen_num(rng, depth):
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.5:
            return ("num", rng.choice(NUM_LITS))
        return ("nvar", rng.choice(["x", "y"]))
    k = rng.randrange(5)
    if k == 0:
        return ("arith", rng.choice("+-*/"),
                _gen_num(rng, depth - 1), _gen_num(rng, depth - 1))
    if k == 1:
        return ("slen", _gen_str(rng, depth - 1))
    if k == 2:
        return (rng.choice(["absf", "ceilf", "floorf"]),
                _gen_num(rng, depth - 1))
    if k == 3:
        return ("iff", _gen_bool(rng, depth - 1),
                _gen_num(rng, depth - 1), _gen_num(rng, depth - 1))
    return ("arith", rng.choice("+-"),
            _gen_num(rng, depth - 1), ("num", rng.choice(NUM_LITS)))


def _gen_str(rng, depth):
    if depth <= 0 or rng.random() < 0.3:
        if rng.random() < 0.4:
            return ("str", rng.choice(STR_LITS))
        return ("svar", rng.choice(["x", "y"]))
    k = rng.randrange(5)
    if k == 0:
        return (rng.choice(["ucase", "lcase"]), _gen_str(rng, depth - 1))
    if k == 1:
        return ("concat", _gen_str(rng, depth - 1), _gen_str(rng, depth - 1))
    if k == 2:
        return ("coalesce", _gen_str(rng, depth - 1),
                _gen_str(rng, depth - 1))
    if k == 3:
        return ("substr", _gen_str(rng, depth - 1), rng.randrange(1, 4))
    return (rng.choice(["strbefore", "strafter"]),
            _gen_str(rng, depth - 1), rng.choice(["b", "c", ""]))


def _gen_bool(rng, depth):
    if depth <= 0 or rng.random() < 0.35:
        k = rng.randrange(4)
        if k == 0:
            return ("cmp", rng.choice(["<", ">", "<=", ">=", "=", "!="]),
                    _gen_num(rng, 0), _gen_num(rng, 0))
        if k == 1:
            return ("scmp", rng.choice(["=", "!="]),
                    _gen_str(rng, 0), _gen_str(rng, 0))
        if k == 2:
            return ("bound", "y")
        return ("inlist", rng.random() < 0.5, _gen_str(rng, 0),
                [("str", rng.choice(VALUES))
                 for _ in range(rng.randrange(0, 3))])
    k = rng.randrange(4)
    if k == 0:
        return ("orx", _gen_bool(rng, depth - 1), _gen_bool(rng, depth - 1))
    if k == 1:
        return ("andx", _gen_bool(rng, depth - 1), _gen_bool(rng, depth - 1))
    if k == 2:
        return ("notx", _gen_bool(rng, depth - 1))
    return (rng.choice(["contains", "starts"]),
            _gen_str(rng, depth - 1), rng.choice(["b", "B", ""]))


# ----------------------------------------------------- render to text

def _q(s):
    return '"' + s + '"'


def _render(n):
    k = n[0]
    if k == "num":
        v = n[1]
        return str(int(v)) if v == int(v) else str(v)
    if k == "str":
        return _q(n[1])
    if k in ("nvar", "svar"):
        return "?" + n[1]
    if k == "arith":
        return f"({_render(n[2])} {n[1]} {_render(n[3])})"
    if k == "slen":
        return f"STRLEN({_render(n[1])})"
    if k == "absf":
        return f"ABS({_render(n[1])})"
    if k == "ceilf":
        return f"CEIL({_render(n[1])})"
    if k == "floorf":
        return f"FLOOR({_render(n[1])})"
    if k == "iff":
        return (f"IF({_render(n[1])}, {_render(n[2])}, {_render(n[3])})")
    if k in ("ucase", "lcase"):
        return f"{k.upper()[0]}CASE({_render(n[1])})"
    if k == "concat":
        return f"CONCAT({_render(n[1])}, {_render(n[2])})"
    if k == "coalesce":
        return f"COALESCE({_render(n[1])}, {_render(n[2])})"
    if k == "substr":
        return f"SUBSTR({_render(n[1])}, {n[2]})"
    if k in ("strbefore", "strafter"):
        return f"{k.upper()}({_render(n[1])}, {_q(n[2])})"
    if k == "cmp" or k == "scmp":
        return f"({_render(n[2])} {n[1]} {_render(n[3])})"
    if k == "inlist":
        items = ", ".join(_render(i) for i in n[3])
        neg = "NOT IN" if n[1] else "IN"
        return f"({_render(n[2])} {neg} ({items}))"
    if k == "orx":
        return f"({_render(n[1])} || {_render(n[2])})"
    if k == "andx":
        return f"({_render(n[1])} && {_render(n[2])})"
    if k == "notx":
        return f"(!{_render(n[1])})"
    if k == "bound":
        return f"BOUND(?{n[1]})"
    if k in ("contains", "starts"):
        fn = "CONTAINS" if k == "contains" else "STRSTARTS"
        return f"{fn}({_render(n[1])}, {_q(n[2])})"
    raise AssertionError(k)


# ----------------------------------------------------- reference eval

def _eval(n, row):
    """row = {'x': str, 'y': str|None}; returns float/str/bool/None,
    mirroring the compiled Catalyst semantics."""
    k = n[0]
    if k == "num":
        return n[1]
    if k == "str":
        return n[1]
    if k == "nvar":
        return _fnum(row[n[1]])
    if k == "svar":
        return row[n[1]]
    if k == "arith":
        a, b = _eval(n[2], row), _eval(n[3], row)
        a = a if isinstance(a, float) else _fnum(a)
        b = b if isinstance(b, float) else _fnum(b)
        if a is None or b is None:
            return None
        op = n[1]
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        return a / b if b != 0 else None
    if k == "slen":
        s = _eval(n[1], row)
        return None if s is None else float(len(s))
    if k in ("absf", "ceilf", "floorf"):
        v = _eval(n[1], row)
        v = v if isinstance(v, float) else _fnum(v)
        if v is None:
            return None
        return {"absf": abs(v), "ceilf": float(math.ceil(v)),
                "floorf": float(math.floor(v))}[k]
    if k == "iff":
        # mirror the compiler's branch unification: a numeric branch
        # beside a string one coerces the string side numerically
        c = _eval(n[1], row)
        tn, en = n[2][0] in _NUM_KINDS, n[3][0] in _NUM_KINDS
        a = _eval(n[2], row) if c is True else _eval(n[3], row)
        coerced = (en and not tn and c is True) or \
            (tn and not en and c is not True)
        if coerced and not isinstance(a, float):
            a = _fnum(a)
        return a
    if k in ("ucase", "lcase"):
        s = _eval(n[1], row)
        if s is None:
            return None
        return s.upper() if k == "ucase" else s.lower()
    if k == "concat":
        a, b = _eval(n[1], row), _eval(n[2], row)
        return None if a is None or b is None else a + b
    if k == "coalesce":
        a = _eval(n[1], row)
        return a if a is not None else _eval(n[2], row)
    if k == "substr":
        s = _eval(n[1], row)
        return None if s is None else s[n[2] - 1:]
    if k in ("strbefore", "strafter"):
        s, needle = _eval(n[1], row), n[2]
        if s is None:
            return None
        pos = s.find(needle)
        if pos < 0:
            return ""
        return s[:pos] if k == "strbefore" else s[pos + len(needle):]
    if k == "cmp":
        # numeric coercion only when either side is a numeric NODE
        # (the compiler's _is_numeric_node rule); two plain terms
        # compare as codepoint strings, per SPARQL simple literals —
        # so vars evaluate RAW here, not through the numeric path
        def _operand(nn):
            if nn[0] in ("nvar", "svar"):
                return row[nn[1]]
            return _eval(nn, row)

        a, b = _operand(n[2]), _operand(n[3])
        if n[2][0] in _NUM_KINDS or n[3][0] in _NUM_KINDS:
            a = a if isinstance(a, float) else _fnum(a)
            b = b if isinstance(b, float) else _fnum(b)
        if a is None or b is None:
            return None
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b,
                "=": a == b, "!=": a != b}[n[1]]
    if k == "scmp":
        a, b = _eval(n[2], row), _eval(n[3], row)
        if a is None or b is None:
            return None
        return a == b if n[1] == "=" else a != b
    if k == "inlist":
        neg, probe, items = n[1], _eval(n[2], row), n[3]
        hit = None
        for i in items:  # OR-equality chain, NULL-propagating
            e = None if probe is None else probe == i[1]
            hit = e if hit is None else _or3(hit, e)
        if hit is None and not items:
            hit = False
        res = hit
        if res is None:
            return None
        return (not res) if neg else res
    if k == "orx":
        return _or3(_eval(n[1], row), _eval(n[2], row))
    if k == "andx":
        a, b = _eval(n[1], row), _eval(n[2], row)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if k == "notx":
        v = _eval(n[1], row)
        return None if v is None else (not v)
    if k == "bound":
        return row[n[1]] is not None
    if k in ("contains", "starts"):
        s = _eval(n[1], row)
        if s is None:
            return None
        return (n[2] in s) if k == "contains" else s.startswith(n[2])
    raise AssertionError(k)


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _norm(v):
    if v is None:
        return None
    # Spark keeps pure-int expressions (STRLEN arithmetic) integral
    # while the reference computes in floats — compare numerically
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        v = float(v)
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return v


@pytest.fixture(scope="module")
def _rows(spark):
    rng = random.Random(777)
    rows, table = [], []
    for i in range(14):
        x = rng.choice(VALUES)
        y = rng.choice(VALUES) if rng.random() < 0.7 else None
        rows.append({"s": f"s{i}", "x": x, "y": y})
        table.append((f"s{i}", "v", x))
        if y is not None:
            table.append((f"s{i}", "w", y))
    tdf = spark.createDataFrame(
        table, "subj string, pred string, obj string"
    )
    return rows, tdf


@pytest.mark.parametrize("seed", range(40))
def test_expression_compiler_matches_reference(spark, _rows, seed):
    rows, tdf = _rows
    rng = random.Random(9000 + seed)
    nexpr = _gen_num(rng, 2)
    sexpr = _gen_str(rng, 2)
    bexpr = _gen_bool(rng, 2)
    text = (
        f"SELECT ?s ({_render(nexpr)} AS ?n) ({_render(sexpr)} AS ?t)\n"
        f"WHERE {{ ?s <v> ?x OPTIONAL {{ ?s <w> ?y }}\n"
        f"         FILTER({_render(bexpr)}) }}"
    )
    got = {
        (r["s"], _norm(r["n"]), _norm(r["t"]))
        for r in sparql(tdf, text).collect()
    }
    def _eval_top(nn, row):
        # a bare-var projection compiles to the raw term column — no
        # numeric coercion at top level
        if nn[0] in ("nvar", "svar"):
            return row[nn[1]]
        return _eval(nn, row)

    want = {
        (row["s"], _norm(_eval_top(nexpr, row)), _norm(_eval_top(sexpr, row)))
        for row in rows
        if _eval(bexpr, row) is True
    }
    assert got == want, text
