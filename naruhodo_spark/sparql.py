"""SPARQL basic-graph-pattern SELECT over the distributed edge table.

The reference's graph lives in one networkx object, so users query it
with ad-hoc Python; the public query language for RDF-shaped data is
SPARQL (https://www.w3.org/TR/sparql11-query/). This module compiles
the workhorse subset of SPARQL SELECT — a basic graph pattern with
FILTER / FILTER NOT EXISTS, DISTINCT, ORDER BY, LIMIT — into the
motif engine (operators/motif.py), i.e. into a chain of Catalyst
equi-joins over a (src, pred, dst) DataFrame. Nothing here executes
per-row Python: the parser runs once on the driver over the query
STRING; the data path is pure DataFrame.

Supported subset (documented, loudly rejected otherwise):

- ``PREFIX x: <iri>`` declarations; prefixed names expand to
  ``<iri><local>``.
- ``SELECT [DISTINCT] ?a ?b … | *`` — ``*`` projects every variable in
  first-appearance order (node variables then predicate variables,
  the motif engine's output contract).
- A WHERE block of triple patterns. Terms: ``?var``, ``<iri>``
  (angle brackets stripped), ``prefix:local``, ``"literal"`` (with
  ``\\" \\\\ \\n \\t`` escapes), bare identifiers (a deliberate
  relaxation — this engine's entities are plain strings like
  ``alice``), and the ``a`` keyword, which expands to this engine's
  taxonomy predicate ``is_a``.
- ``FILTER (expr)`` where expr is ``&&``-conjoined comparisons
  ``term op term`` (op ∈ ``= != < <= > >=``). A comparison against a
  NUMERIC literal casts the variable side to double; everything else
  compares as strings (the engine's node domain).
- ``FILTER NOT EXISTS { one triple pattern }`` — compiled to a
  correlated left-anti join. Variables bound by positive patterns are
  the correlation keys, constants filter the probe side, fresh
  variables are existential ('no such edge to anything'); at least one
  bound variable is required.
- ``ORDER BY (ASC|DESC)?(?v) …`` and ``LIMIT n``.

SPARQL semantics kept faithfully: solutions are HOMOMORPHIC (two
variables may bind the same node — ``distinct_nodes=False``), bag
semantics unless DISTINCT, and a constant term constrains its slot
without consuming a variable. Reusing one predicate variable across
two patterns is not supported (the motif compiler binds each predicate
variable once) and raises.

Scale shape: identical to the motif engine — each pattern is one
equi-join with literal predicates pushed into the scan, NOT EXISTS is
one anti join, constant-term equality filters sit directly above their
step's projection so Catalyst pushes them into that branch's scan.
No cross products can be expressed (a disconnected pattern raises).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<iri><[^<>\s]*>)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_-]*)?:[A-Za-z_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_])?)
    | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
    | (?P<word>[A-Za-z_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_])?)
    | (?P<punct>&&|!=|<=|>=|[{}().=<>*:])
    )
    """,
    re.VERBOSE,
)

_ESCAPES = {'\\"': '"', "\\\\": "\\", "\\n": "\n", "\\t": "\t", "\\r": "\r"}

_OPS = {"=", "!=", "<", "<=", ">", ">="}


class SparqlError(ValueError):
    """Raised on any query outside the documented subset."""


def _tokenize(query: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if m is None:
            if query[pos:].strip():
                raise SparqlError(
                    f"cannot tokenize SPARQL at: {query[pos:pos + 30]!r}"
                )
            break
        pos = m.end()
        if m.lastgroup != "comment":
            toks.append(m.group(m.lastgroup))
    return toks


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(
        r"\\.", lambda m: _ESCAPES.get(m.group(0), m.group(0)[1]), body
    )


class _Term:
    __slots__ = ("kind", "value")  # kind: var | const | num

    def __init__(self, kind: str, value):
        self.kind, self.value = kind, value


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks, self.i = toks, 0
        self.prefixes: dict[str, str] = {}

    def peek(self) -> "str | None":
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, want: str) -> None:
        tok = self.next()
        if tok.upper() != want.upper():
            raise SparqlError(f"expected {want!r}, got {tok!r}")

    def kw(self, word: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.upper() == word.upper():
            self.i += 1
            return True
        return False

    def term(self) -> _Term:
        tok = self.next()
        if tok in ("&&", "!=", "<=", ">=", ":") or (
            len(tok) == 1 and tok in "{}().=<>*"
        ):
            raise SparqlError(f"expected a term, got {tok!r}")
        if tok.startswith("?"):
            return _Term("var", tok[1:])
        if tok.startswith('"'):
            return _Term("const", _unquote(tok))
        if tok.startswith("<"):
            return _Term("const", tok[1:-1])
        if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", tok):
            return _Term("num", float(tok))
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx in self.prefixes:
                return _Term("const", self.prefixes[pfx] + local)
            # undeclared default prefix: ':alice' means the plain
            # string 'alice' (this engine's bare node names)
            return _Term("const", local if pfx == "" else tok)
        if tok == "a":
            return _Term("const", "is_a")
        if tok.upper() in (
            "SELECT", "WHERE", "FILTER", "NOT", "EXISTS", "DISTINCT",
            "ORDER", "BY", "LIMIT", "ASC", "DESC", "PREFIX",
        ):
            raise SparqlError(f"expected a term, got {tok!r}")
        return _Term("const", tok)


def _parse(query: str) -> dict:
    p = _Parser(_tokenize(query))
    while p.kw("PREFIX"):
        name = p.next()
        if name == ":":
            name = ""
        else:
            p.expect(":")
        iri = p.next()
        if not iri.startswith("<"):
            raise SparqlError(f"PREFIX IRI must be <...>, got {iri!r}")
        p.prefixes[name] = iri[1:-1]
    p.expect("SELECT")
    distinct = p.kw("DISTINCT")
    proj: "list[str] | None"
    if p.kw("*"):
        proj = None
    else:
        proj = []
        while p.peek() is not None and p.peek().startswith("?"):
            proj.append(p.next()[1:])
        if not proj:
            raise SparqlError("SELECT needs ?vars or *")
    p.expect("WHERE")
    p.expect("{")
    triples: list[tuple[_Term, _Term, _Term]] = []
    antis: list[tuple[_Term, _Term, _Term]] = []
    filters: list[tuple[_Term, str, _Term]] = []
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlError("unterminated WHERE block")
        if tok == "}":
            p.next()
            break
        if tok.upper() == "FILTER":
            p.next()
            if p.kw("NOT"):
                p.expect("EXISTS")
                p.expect("{")
                antis.append((p.term(), p.term(), p.term()))
                p.kw(".")
                p.expect("}")
            else:
                p.expect("(")
                while True:
                    left = p.term()
                    op = p.next()
                    if op not in _OPS:
                        raise SparqlError(f"unsupported operator {op!r}")
                    filters.append((left, op, p.term()))
                    if not p.kw("&&"):
                        break
                p.expect(")")
            p.kw(".")
            continue
        triples.append((p.term(), p.term(), p.term()))
        p.kw(".")
    order: list[tuple[str, bool]] = []
    if p.kw("ORDER"):
        p.expect("BY")
        while True:
            tok = p.peek()
            if tok is None:
                break
            if tok.upper() in ("ASC", "DESC"):
                p.next()
                p.expect("(")
                var = p.next()
                if not var.startswith("?"):
                    raise SparqlError("ORDER BY needs a ?var")
                p.expect(")")
                order.append((var[1:], tok.upper() == "DESC"))
            elif tok.startswith("?"):
                order.append((p.next()[1:], False))
            else:
                break
        if not order:
            raise SparqlError("empty ORDER BY")
    limit = None
    if p.kw("LIMIT"):
        tok = p.next()
        if not re.fullmatch(r"[0-9]+", tok):
            raise SparqlError(f"LIMIT needs an integer, got {tok!r}")
        limit = int(tok)
    if p.peek() is not None:
        raise SparqlError(f"trailing tokens from {p.peek()!r}")
    if not triples:
        raise SparqlError("WHERE block has no triple patterns")
    return {
        "distinct": distinct, "proj": proj, "triples": triples,
        "antis": antis, "filters": filters, "order": order,
        "limit": limit,
    }


def _compile_patterns(parsed: dict):
    """Lower terms: node constants become shared internal variables
    with equality constraints (same constant → same variable, so the
    motif compiler equi-joins occurrences); predicate constants stay
    literals (pushed into the scan); ``?p`` predicates become motif
    ``?``-bound variables."""
    const_var: dict[str, str] = {}
    const_eqs: list[tuple[str, str]] = []  # (internal var, constant)

    def node(t: _Term) -> str:
        if t.kind == "var":
            if re.fullmatch(r"_const\d+", t.value):
                raise SparqlError(
                    f"?{t.value} collides with internal constant slots"
                )
            return t.value
        if t.kind == "num":
            v = t.value
            value = str(int(v)) if float(v).is_integer() else str(v)
        else:
            value = str(t.value)
        if value not in const_var:
            iv = f"_const{len(const_var)}"
            const_var[value] = iv
            const_eqs.append((iv, value))
        return const_var[value]

    def pred(t: _Term) -> "str | None":
        if t.kind == "var":
            return "?" + t.value
        return str(t.value)

    pattern = [(node(s), pred(pr), node(o)) for s, pr, o in parsed["triples"]]
    return pattern, const_eqs


def _filter_col(left: _Term, op: str, right: _Term) -> Column:
    def side(t: _Term) -> Column:
        if t.kind == "var":
            return F.col(t.value)
        return F.lit(t.value)

    l, r = side(left), side(right)
    if left.kind == "num" and right.kind == "var":
        r = r.cast("double")
    if right.kind == "num" and left.kind == "var":
        l = l.cast("double")
    if op == "=":
        return l == r
    if op == "!=":
        return l != r
    if op == "<":
        return l < r
    if op == "<=":
        return l <= r
    if op == ">":
        return l > r
    return l >= r


def _not_exists(
    out: DataFrame, edges: DataFrame, s: _Term, pr: _Term, o: _Term,
    bound: set,
) -> DataFrame:
    """Compile one ``FILTER NOT EXISTS { s pr o }`` to a correlated
    left-anti join: constants filter the probe side, variables bound by
    the positive patterns become anti-join keys, fresh variables are
    existential (no constraint — 'any such edge'). At least one bound
    variable is required: an uncorrelated NOT EXISTS is a global
    emptiness test, not a per-solution filter."""
    step = edges
    keys: list[tuple[str, str]] = []  # (outer var, edge column)

    def slot(t: _Term, col: str) -> None:
        if t.kind == "var":
            if t.value in bound:
                keys.append((t.value, col))
            return  # fresh variable: existentially quantified
        nonlocal step
        value = str(int(t.value)) if (
            t.kind == "num" and float(t.value).is_integer()
        ) else str(t.value)
        step = step.where(F.col(col) == F.lit(value))

    if s.kind == "var" and o.kind == "var" and s.value == o.value:
        step = step.where(F.col("src") == F.col("dst"))
        slot(s, "src")
    else:
        slot(s, "src")
        slot(o, "dst")
    slot(pr, "pred")
    if not keys:
        raise SparqlError(
            "FILTER NOT EXISTS must share at least one bound variable "
            "with the positive patterns"
        )
    probe = step.select(
        *[F.col(col).alias(var) for var, col in keys]
    ).distinct()
    return out.join(probe, on=[var for var, _ in keys], how="left_anti")


def sparql_select(edges: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT (subset above) over an edge DataFrame with
    (src, pred, dst) columns — or a KSG table with (subj, pred, obj),
    renamed via the same edge_target contract as the motif engine.
    Returns one column per projected variable."""
    from naruhodo_spark.operators.motif import match_motif

    if "subj" in edges.columns and "src" not in edges.columns:
        from naruhodo_spark.operators.agg import edge_target

        edges = edges.select(
            F.col("subj").alias("src"), "pred",
            edge_target().alias("dst"),
        )
    parsed = _parse(query)
    pattern, const_eqs = _compile_patterns(parsed)
    out = match_motif(edges, pattern, anti=None, distinct_nodes=False)
    for iv, value in const_eqs:
        out = out.where(F.col(iv) == F.lit(value))
    bound = set(out.columns)
    for s, pr, o in parsed["antis"]:
        out = _not_exists(out, edges, s, pr, o, bound)
    for left, op, right in parsed["filters"]:
        for t in (left, right):
            if t.kind == "var" and t.value not in bound:
                raise SparqlError(f"FILTER uses unbound variable ?{t.value}")
        out = out.where(_filter_col(left, op, right))
    proj = parsed["proj"]
    if proj is None:
        proj = [c for c in out.columns if not re.fullmatch(r"_const\d+", c)]
    else:
        missing = [v for v in proj if v not in bound]
        if missing:
            raise SparqlError(f"SELECT projects unbound variables {missing}")
    out = out.select(*proj)
    if parsed["distinct"]:
        out = out.distinct()
    if parsed["order"]:
        for var, _ in parsed["order"]:
            if var not in proj:
                raise SparqlError(f"ORDER BY on unprojected variable ?{var}")
        out = out.orderBy(
            *[F.desc(v) if desc else F.asc(v) for v, desc in parsed["order"]]
        )
    if parsed["limit"] is not None:
        out = out.limit(parsed["limit"])
    return out
