"""Minimal Turtle (TTL) parser + serializer (stdlib only).

The reference stores ontologies and facts as Turtle files via rdflib
(/root/reference/ontocast/tool/triple_manager/filesystem_manager.py:60-143);
rdflib is not available here, so this module implements the Turtle
subset those files actually use:

- ``@prefix p: <iri> .`` declarations plus the SPARQL-style
  ``PREFIX`` / ``BASE`` forms (case-insensitive, no trailing dot),
- ``@base <iri> .`` with RFC 3986 relative-IRI resolution,
- prefixed names, ``<full-iri>`` terms, and ``_:label`` blank-node
  labels (skolemized deterministically like ``[...]`` nodes),
- ``a`` as ``rdf:type``,
- string literals (single- or double-quoted, both triple-quoted
  long forms) with ``@lang`` and ``^^datatype``, ``\\uXXXX`` /
  ``\\UXXXXXXXX`` escapes, plus bare numeric/boolean literals,
- predicate lists (``;``), object lists (``,``), comments (``#``).

Parse output is the engine's plain triple model
``(s, p, o, o_is_literal, o_datatype)``. Language-tagged literals
carry the tag in the datatype slot as ``"@tag"`` (per RDF 1.1 the
datatype of a lang-tagged literal is always ``rdf:langString``, so the
slot is otherwise unused for them); the public DataFrame boundary
splits it into an explicit ``obj_lang`` column
(:func:`ontocast_spark.schemas.split_lang_columns`). Serialization
emits prefixed, sorted, deterministic Turtle with ``@tag`` round-trip.
Round-trip is tested in tests/test_turtle.py.

Blank nodes ``[...]`` / ``[]`` are skolemized to deterministic IRIs
(``urn:skolem:`` + content-hash scope) rather than rejected, so
real-world ontologies with OWL restrictions load. Collections
``( a b c )`` expand to the standard rdf:first/rdf:rest/rdf:nil list
over skolemized list nodes (e.g. ``owl:oneOf`` enumerations in the
reference's criminal.ttl).
"""

from __future__ import annotations

import re

from ..kernels.rdfterms import RDF_TYPE, XSD_NS, render_text_hash

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<ws>\s+)
  | (?P<prefix_decl>@prefix|[Pp][Rr][Ee][Ff][Ii][Xx]\b(?!:))
  | (?P<base_decl>@base|[Bb][Aa][Ss][Ee]\b(?!:))
  | (?P<iri><[^>]*>)
  | (?P<triple_quote>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
  | (?P<string>"(?:[^"\\\n]|\\.)*")
  | (?P<triple_squote>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<squote>'(?:[^'\\\n]|\\.)*')
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<number>[+-]?(?:\d+(?:\.\d+)?|\.\d+)(?:[eE][+-]?\d+)?)
  | (?P<punct>[;,.\[\]()])
  | (?P<a_kw>\ba\b)
  | (?P<boolean>\btrue\b|\bfalse\b)
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.%\-\u00C0-\uFFFF]*)
""",
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}
_UNESCAPE_RE = re.compile(
    r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)", re.DOTALL
)


def _unescape(s: str) -> str:
    # single left-to-right pass — sequential str.replace mis-handles a
    # literal backslash followed by n/t/r (escape-order bug); numeric
    # \uXXXX / \UXXXXXXXX escapes decode to the code point
    def sub(m):
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _ESCAPES.get(g, g)

    return _UNESCAPE_RE.sub(sub, s)


def _tokenize(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at {text[pos:pos + 40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("comment", "ws"):
            continue
        if kind == "local":  # pname match ends on the local group
            yield ("pname", (m.group("pname") or "", m.group("local")))
        else:
            yield (kind, m.group(0))


def parse_turtle(text: str) -> tuple[list[tuple], dict[str, str]]:
    """Returns (triples, prefixes). Triples use full IRIs."""
    tokens = list(_tokenize(text))
    prefixes: dict[str, str] = {}
    triples: list[tuple] = []
    i = 0
    base = [None]  # current @base / BASE, for relative-IRI resolution
    # deterministic skolemization scope: same file content -> same IRIs;
    # distinct files -> distinct IRIs (no accidental cross-file merges)
    _skolem_scope = render_text_hash(text)
    _skolem_n = [0]

    _SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

    def _resolve_iri(raw: str) -> str:
        if base[0] is None or _SCHEME_RE.match(raw):
            return raw
        from urllib.parse import urljoin

        # RFC 3986 join; urljoin drops a bare fragment's base unless
        # told the scheme — it handles <#x>, <x>, </x>, <../x> forms
        return urljoin(base[0], raw)

    def resolve(tok) -> str:
        kind, val = tok
        if kind == "iri":
            return _resolve_iri(val[1:-1])
        if kind == "pname":
            p, local = val
            if p == "_":  # _:label blank node -> deterministic skolem
                return f"urn:skolem:{_skolem_scope}:l{local}"
            if p not in prefixes:
                raise ValueError(f"turtle: unknown prefix {p!r}")
            return prefixes[p] + local
        if kind == "a_kw":
            return RDF_TYPE
        raise ValueError(f"turtle: expected IRI, got {tok}")

    def parse_bnode(j):
        """``[ pred obj ; ... ]`` -> skolem IRI + emitted triples.
        tokens[j] must be '['. Returns (iri, next_j)."""
        iri = f"urn:skolem:{_skolem_scope}:b{_skolem_n[0]}"
        _skolem_n[0] += 1
        j += 1
        if j < len(tokens) and tokens[j] == ("punct", "]"):
            return iri, j + 1
        while True:
            pred = resolve(tokens[j])
            j += 1
            while True:
                (obj, lit, dt), j = read_object(j)
                triples.append((iri, pred, obj, lit, dt))
                if j < len(tokens) and tokens[j] == ("punct", ","):
                    j += 1
                    continue
                break
            if j < len(tokens) and tokens[j] == ("punct", ";"):
                j += 1
                if j < len(tokens) and tokens[j] == ("punct", "]"):
                    return iri, j + 1
                continue
            if j < len(tokens) and tokens[j] == ("punct", "]"):
                return iri, j + 1
            raise ValueError("turtle: expected ';' or ']' in blank node")

    def parse_collection(j):
        """``( o1 o2 ... )`` -> rdf:first/rdf:rest chain over skolem
        nodes; returns (head_iri_or_rdf_nil, next_j). tokens[j] == '('."""
        rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        j += 1
        items = []
        while j < len(tokens) and tokens[j] != ("punct", ")"):
            (obj, lit, dt), j = read_object(j)
            items.append((obj, lit, dt))
        if j >= len(tokens):
            raise ValueError("turtle: unterminated collection")
        j += 1  # consume ')'
        if not items:
            return rdf_ns + "nil", j
        nodes = []
        for _ in items:
            nodes.append(f"urn:skolem:{_skolem_scope}:b{_skolem_n[0]}")
            _skolem_n[0] += 1
        for node, (obj, lit, dt), k in zip(nodes, items, range(len(items))):
            triples.append((node, rdf_ns + "first", obj, lit, dt))
            rest = nodes[k + 1] if k + 1 < len(nodes) else rdf_ns + "nil"
            triples.append((node, rdf_ns + "rest", rest, False, None))
        return nodes[0], j

    def read_object(j):
        kind, val = tokens[j]
        if kind == "punct" and val == "[":
            iri, j = parse_bnode(j)
            return (iri, False, None), j
        if kind == "punct" and val == "(":
            iri, j = parse_collection(j)
            return (iri, False, None), j
        if kind in ("iri", "pname"):
            return (resolve(tokens[j]), False, None), j + 1
        if kind in ("string", "triple_quote", "squote", "triple_squote"):
            raw = (
                val[3:-3]
                if kind in ("triple_quote", "triple_squote")
                else val[1:-1]
            )
            lex = _unescape(raw)
            dt = None
            if j + 1 < len(tokens) and tokens[j + 1][0] == "langtag":
                dt = tokens[j + 1][1]  # "@tag" sentinel in the dt slot
                j += 1
            elif j + 1 < len(tokens) and tokens[j + 1][0] == "dtype":
                dt = resolve(tokens[j + 2])
                j += 2
            return (lex, True, dt), j + 1
        if kind == "number":
            dt = XSD_NS + ("decimal" if ("." in val or "e" in val.lower()) else "integer")
            return (val, True, dt), j + 1
        if kind == "boolean":
            return (val, True, XSD_NS + "boolean"), j + 1
        raise ValueError(f"turtle: unsupported object token {tokens[j]}")

    while i < len(tokens):
        kind, val = tokens[i]
        if kind == "prefix_decl":
            p = tokens[i + 1][1][0] if tokens[i + 1][0] == "pname" else None
            if p is None:
                raise ValueError("turtle: malformed @prefix")
            iri = _resolve_iri(tokens[i + 2][1][1:-1])
            prefixes[p] = iri
            i += 3
            # '@prefix' requires the trailing '.'; SPARQL 'PREFIX' forbids it
            if val == "@prefix":
                if i >= len(tokens) or tokens[i] != ("punct", "."):
                    raise ValueError("turtle: @prefix missing '.'")
                i += 1
            continue
        if kind == "base_decl":
            if tokens[i + 1][0] != "iri":
                raise ValueError("turtle: malformed base declaration")
            base[0] = _resolve_iri(tokens[i + 1][1][1:-1])
            i += 2
            if val == "@base":
                if i >= len(tokens) or tokens[i] != ("punct", "."):
                    raise ValueError("turtle: @base missing '.'")
                i += 1
            continue
        if tokens[i] == ("punct", "["):
            subj, i = parse_bnode(i)
            if i < len(tokens) and tokens[i] == ("punct", "."):
                i += 1  # pure anonymous-subject statement: [ ... ] .
                continue
        else:
            subj = resolve(tokens[i])
            i += 1
        while True:
            pred = resolve(tokens[i])
            i += 1
            while True:
                (obj, lit, dt), i = read_object(i)
                triples.append((subj, pred, obj, lit, dt))
                if i < len(tokens) and tokens[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < len(tokens) and tokens[i] == ("punct", ";"):
                i += 1
                if i < len(tokens) and tokens[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if i < len(tokens) and tokens[i] == ("punct", "."):
                i += 1
                break
            raise ValueError(f"turtle: expected ';' or '.' near {tokens[i - 1]}")
    return triples, prefixes


def serialize_turtle(
    triples, prefixes: dict[str, str] | None = None
) -> str:
    """Deterministic Turtle: sorted prefixes, sorted triples, predicate
    grouping with ';'. Full IRIs are shortened when a prefix matches."""
    prefixes = dict(prefixes or {})

    def shorten(iri: str) -> str:
        best_p, best_ns = None, ""
        for p, ns in prefixes.items():
            if iri.startswith(ns) and len(ns) > len(best_ns):
                rest = iri[len(ns):]
                if re.fullmatch(r"[\w.\-\u00C0-\uFFFF]*", rest) and rest:
                    best_p, best_ns = p, ns
        if best_p is not None:
            return f"{best_p}:{iri[len(best_ns):]}"
        return f"<{iri}>"

    def fmt_obj(o, lit, dt):
        if not lit:
            return shorten(o)
        # Turtle STRING_LITERAL_QUOTE forbids raw '"', '\\', LF and CR
        esc = (
            o.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
        if dt and dt.startswith("@"):
            return f'"{esc}"{dt}'
        if dt:
            return f'"{esc}"^^{shorten(dt)}'
        return f'"{esc}"'

    lines = [
        f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())
    ]
    if lines:
        lines.append("")
    by_subj: dict[str, list] = {}
    for s, p, o, lit, dt in sorted(set(map(tuple, triples))):
        by_subj.setdefault(s, []).append((p, o, lit, dt))
    for s in sorted(by_subj):
        parts = [
            f"{shorten(p)} {fmt_obj(o, lit, dt)}"
            for p, o, lit, dt in by_subj[s]
        ]
        lines.append(f"{shorten(s)} " + " ;\n    ".join(parts) + " .")
    return "\n".join(lines) + "\n"
