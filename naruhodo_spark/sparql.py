"""SPARQL basic-graph-pattern SELECT/ASK over the distributed edge table.

The reference's graph lives in one networkx object, so users query it
with ad-hoc Python; the public query language for RDF-shaped data is
SPARQL (https://www.w3.org/TR/sparql11-query/). This module compiles
the workhorse subset of SPARQL into the motif engine
(operators/motif.py), i.e. into a chain of Catalyst equi-joins over a
(src, pred, dst) DataFrame. Nothing here executes per-row Python: the
parser runs once on the driver over the query STRING; the data path is
pure DataFrame.

Supported subset (documented, loudly rejected otherwise):

- ``PREFIX x: <iri>`` declarations; prefixed names expand to
  ``<iri><local>``.
- ``SELECT [DISTINCT] ?a ?b … | *`` and ``ASK`` (one boolean ``ask``
  row). ``*`` projects every variable in first-appearance order.
- Aggregates in SELECT — ``(COUNT(*) AS ?n)``, ``(COUNT|SUM|AVG|MIN|
  MAX|GROUP_CONCAT|SAMPLE([DISTINCT] ?v) AS ?alias)``, GROUP_CONCAT
  with an optional ``; SEPARATOR="…"`` (values sorted
  lexicographically before joining — SPARQL leaves the order
  implementation-defined and a distributed engine must pick a
  deterministic one; SAMPLE likewise picks min) — with
  ``GROUP BY ?g …`` and
  ``HAVING (comparisons)``; plain projected variables must be group
  keys (SPARQL 1.1 §11). Lowered to one hash aggregate with map-side
  partials; SUM/AVG cast the string node domain to double.
- ``VALUES ?x { a b }`` / ``VALUES (?x ?y) { (a b) … }`` inline data,
  joined as a broadcast bag join on the shared variables (≥1
  required; UNDEF rejected).
- ``MINUS { triple patterns }`` — left-anti join on the shared
  variables; per the SPARQL spec a domain-disjoint MINUS removes
  nothing.
- Triple list sugar: ``;`` (same subject) and ``,`` (same
  subject+predicate).
- A WHERE block of triple patterns, or ``{ … } UNION { … }`` group
  alternation (each group is a full block; all groups must bind the
  same variables; bag-semantics union). FILTERs trailing the UNION
  chain apply to the union result (lowered into every branch).
- Terms: ``?var``, ``<iri>`` (angle brackets stripped),
  ``prefix:local``, ``"literal"`` (with ``\\" \\\\ \\n \\t`` escapes),
  bare identifiers (a deliberate relaxation — this engine's entities
  are plain strings like ``alice``), and the ``a`` keyword, which
  expands to this engine's taxonomy predicate ``is_a``.
- Predicate paths: alternation ``p|q|r`` (constants only), inverse
  ``^p`` (the edge walked backwards), sequence ``p/^q/r``, negated
  property sets ``!p`` / ``!(p|q|r)`` (§9.1, forward-only — lowered to
  an internal predicate variable with a NOT-IN filter, i.e. one scan
  predicate, no per-member branch), and the
  bounded quantifier ``[^]p{m,n}`` (1 ≤ m ≤ n ≤ 8) — expanded at
  compile time into per-length join chains over fresh internal
  variables, unioned. Unbounded closures ``[^]p+`` / ``[^]p*``
  (SPARQL 1.1 §9.1 OneOrMorePath / ZeroOrMorePath; constant
  predicates, not sequence elements) compile to the semi-naive
  reachability fixpoint (operators/closure.py): the per-predicate
  closure is computed ONCE per query, spliced into the edge frame
  under an internal marker predicate, and the pattern joins it like
  any other edge — so a closure step costs diameter-bounded delta
  joins up front and one equi-join in the pattern, never a per-row
  recursion. ``p*`` adds the identity pair over every node of the
  QUERIED GRAPH (zero-length path, per spec). ``^p+`` ≡ the ``p+``
  closure walked backwards (closure and inverse commute).
- ``OPTIONAL { triple patterns }`` — compiled to a left outer join on
  the shared variables (≥1 required). Plain patterns only inside.
- ``FILTER (expr)`` where expr is ``&&``-conjoined comparisons
  ``term op term`` (op ∈ ``= != < <= > >=``). A comparison against a
  NUMERIC literal casts the variable side to double; everything else
  compares as strings (the engine's node domain). ``BOUND(?v)`` /
  ``!BOUND(?v)`` test OPTIONAL bindings.
- ``FILTER NOT EXISTS { one triple pattern }`` — compiled to a
  correlated left-anti join. Variables bound by positive patterns are
  the correlation keys, constants filter the probe side, fresh
  variables are existential ('no such edge to anything'); at least one
  bound variable is required.
- ``BIND(expr AS ?new)`` — expr is a term, ``CONCAT(t, t, …)``,
  ``COALESCE(t, t, …)``, ``IF(t op t, t, t)`` (one comparison using
  the FILTER operator set — the OPTIONAL-default idiom
  ``BIND(COALESCE(?opt, "fallback") AS ?v)`` works), or
  ONE binary arithmetic ``t (+|-|*|/) t`` (operands cast to double;
  write the minus operator spaced — a glued ``-1`` lexes as a
  negative literal). Compiled as a projection after the group's
  pattern joins and before its FILTERs (which therefore see the
  binding, per SPARQL group scope); the bound variable must be fresh
  and cannot appear in triple patterns — the simplification vs full
  sequential scope, both rejected loudly.
- ``ORDER BY (ASC|DESC)?(?v) …`` and ``LIMIT n``.
- ``CONSTRUCT { template } WHERE { … }`` (via ``sparql_construct``) —
  the template is plain triple patterns (``;``/``,`` sugar, ``a``
  keyword; no paths, no blank nodes) instantiated once per WHERE
  solution; rows with an unbound OPTIONAL variable emit nothing for
  the templates referencing it (SPARQL 1.1 §16.2), and the result is
  an RDF *graph*, i.e. a DISTINCT (src, pred, dst) DataFrame. Solution
  modifiers (GROUP BY / HAVING / ORDER BY / LIMIT / DISTINCT) are
  rejected under CONSTRUCT — the graph is already a set, and a LIMIT
  over an unordered solution bag would be nondeterministic.
- ``DESCRIBE node [node …]`` (via ``sparql_describe``) — constants
  only, no WHERE form: the bounded Concise-Bounded-Description this
  engine defines as all edges incident to the named nodes, one
  pushdown-friendly ``isin`` filter over the edge table.

SPARQL semantics kept faithfully: solutions are HOMOMORPHIC (two
variables may bind the same node — ``distinct_nodes=False``), bag
semantics unless DISTINCT, and a constant term constrains its slot
without consuming a variable. Reusing one predicate variable across
two patterns is not supported (the motif compiler binds each predicate
variable once) and raises.

Scale shape: identical to the motif engine — each pattern is one
equi-join with literal predicates pushed into the scan, OPTIONAL is
one left outer join, NOT EXISTS is one anti join, UNION and path
quantifiers are plan-level unions of identically-shaped branches,
constant-term equality filters sit directly above their step's
projection so Catalyst pushes them into that branch's scan. No cross
products can be expressed (a disconnected pattern raises).
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
    | (?P<punct>&&|!=|<=|>=|[{}().=<>*:,|!+/^;-])
    )
    """,
    re.VERBOSE,
)

_ESCAPES = {'\\"': '"', "\\\\": "\\", "\\n": "\n", "\\t": "\t", "\\r": "\r"}

_OPS = {"=", "!=", "<", "<=", ">", ">="}

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}

_INTERNAL = re.compile(r"_(const|alt|path)\d+(_\d+)?")

MAX_PATH_LEN = 8
MAX_VARIANTS = 64


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
    """kind: var | const | num | alt (value: list of constants) |
    path (value: (pred constant, m, n))."""

    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value):
        self.kind, self.value = kind, value


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks, self.i = toks, 0
        self.prefixes: dict[str, str] = {}

    def peek(self, ahead: int = 0) -> "str | None":
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

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
            len(tok) == 1 and tok in "{}().=<>*,|!+/^;-"
        ):
            raise SparqlError(f"expected a term, got {tok!r}")
        if tok.startswith("?"):
            if _INTERNAL.fullmatch(tok[1:]):
                raise SparqlError(
                    f"{tok} collides with internal variable slots"
                )
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
            "SELECT", "ASK", "WHERE", "FILTER", "NOT", "EXISTS",
            "DISTINCT", "ORDER", "BY", "LIMIT", "ASC", "DESC", "PREFIX",
            "OPTIONAL", "UNION", "BOUND", "GROUP", "HAVING", "VALUES",
            "MINUS", "AS", "UNDEF", "CONSTRUCT", "DESCRIBE", "BIND",
            "CONCAT", "COALESCE", "IF",
        ):
            raise SparqlError(f"expected a term, got {tok!r}")
        return _Term("const", tok)

    def pred_term(self) -> _Term:
        """A predicate position: a plain term, an inverse ``^p``, an
        alternation ``p|q|r``, a bounded path ``[^]p{m,n}``, a
        sequence ``[^]p/[^]q/…``, a closure ``[^]p+``/``[^]p*``, or a
        negated property set ``!p`` / ``!(p|q|r)`` (SPARQL 1.1 §9.1 —
        forward direction only; ``!^p`` is rejected)."""
        if self.kw("!"):
            preds: list[str] = []
            if self.kw("("):
                while True:
                    if self.peek() == "^":
                        raise SparqlError(
                            "inverse members in a negated property set "
                            "are not supported"
                        )
                    t = self.term()
                    if t.kind != "const":
                        raise SparqlError(
                            "negated property set needs constant predicates"
                        )
                    preds.append(str(t.value))
                    if not self.kw("|"):
                        break
                self.expect(")")
            else:
                if self.peek() == "^":
                    raise SparqlError(
                        "inverse members in a negated property set "
                        "are not supported"
                    )
                t = self.term()
                if t.kind != "const":
                    raise SparqlError(
                        "negated property set needs constant predicates"
                    )
                preds.append(str(t.value))
            return _Term("neg", preds)
        inv = bool(self.kw("^"))
        t = self.term()
        if inv and t.kind != "const":
            raise SparqlError("inverse path '^' needs a constant predicate")
        if self.peek() == "/":
            if t.kind != "const":
                raise SparqlError("path sequence needs constant predicates")
            seq: list[tuple[str, bool]] = [(str(t.value), inv)]
            while self.kw("/"):
                e_inv = bool(self.kw("^"))
                nxt = self.term()
                if nxt.kind != "const":
                    raise SparqlError(
                        "path sequence needs constant predicates"
                    )
                seq.append((str(nxt.value), e_inv))
            if len(seq) > MAX_PATH_LEN:
                raise SparqlError(
                    f"path sequence longer than {MAX_PATH_LEN}"
                )
            return _Term("seq", seq)
        if self.peek() == "|":
            if inv:
                raise SparqlError(
                    "inverse '^' inside an alternation is not supported"
                )
            if t.kind != "const":
                raise SparqlError("path alternation needs constant predicates")
            alts = [str(t.value)]
            while self.kw("|"):
                nxt = self.term()
                if nxt.kind != "const":
                    raise SparqlError(
                        "path alternation needs constant predicates"
                    )
                alts.append(str(nxt.value))
            return _Term("alt", alts)
        if self.peek() in ("+", "*"):
            if t.kind != "const":
                raise SparqlError(
                    f"closure path '{self.peek()}' needs a constant predicate"
                )
            star = self.next() == "*"
            return _Term("closure", (str(t.value), star, inv))
        if self.peek() == "{":
            if t.kind != "const":
                raise SparqlError("path quantifier needs a constant predicate")
            self.next()
            m_tok = self.next()
            if not re.fullmatch(r"[0-9]+", m_tok):
                raise SparqlError(f"bad path quantifier bound {m_tok!r}")
            m = int(m_tok)
            n = m
            if self.kw(","):
                n_tok = self.next()
                if not re.fullmatch(r"[0-9]+", n_tok):
                    raise SparqlError(f"bad path quantifier bound {n_tok!r}")
                n = int(n_tok)
            self.expect("}")
            if not (1 <= m <= n <= MAX_PATH_LEN):
                raise SparqlError(
                    f"path quantifier must satisfy 1 <= m <= n <= "
                    f"{MAX_PATH_LEN}, got {{{m},{n}}}"
                )
            return _Term("path", (str(t.value), m, n, inv))
        if inv:
            return _Term("inv", str(t.value))
        return t


def _parse_filter_clause(p: _Parser, antis, filters, bound_tests) -> None:
    """Parse one FILTER clause (the ``FILTER`` keyword already
    consumed): either ``NOT EXISTS { pattern }`` into ``antis`` or a
    parenthesised ``&&``-conjunction of comparisons / BOUND tests into
    ``filters`` / ``bound_tests``. Consumes a trailing ``.`` if any."""
    if p.kw("NOT"):
        p.expect("EXISTS")
        p.expect("{")
        antis.append((p.term(), p.term(), p.term()))
        p.kw(".")
        p.expect("}")
    else:
        p.expect("(")
        while True:
            neg = p.kw("!")
            if p.peek() is not None and p.peek().upper() == "BOUND":
                p.next()
                p.expect("(")
                var = p.next()
                if not var.startswith("?"):
                    raise SparqlError("BOUND needs a ?var")
                p.expect(")")
                bound_tests.append((var[1:], not neg))
            else:
                if neg:
                    raise SparqlError(
                        "'!' is only supported as !BOUND(?v)"
                    )
                left = p.term()
                op = p.next()
                if op not in _OPS:
                    raise SparqlError(f"unsupported operator {op!r}")
                filters.append((left, op, p.term()))
            if not p.kw("&&"):
                break
        p.expect(")")
    p.kw(".")


_ARITH = {"+", "-", "*", "/"}


def _parse_bind_expr(p: _Parser):
    """The BIND expression subset: a term, ``CONCAT(t, t, …)``,
    ``COALESCE(t, t, …)``, ``IF(t op t, t, t)`` (one comparison, the
    FILTER operator set), or a single binary arithmetic
    ``t (+|-|*|/) t`` (operands cast to double — the engine's node
    domain is strings). Returns an AST tuple consumed by _bind_col."""
    head = p.peek().upper() if p.peek() is not None else ""
    if head in ("CONCAT", "COALESCE"):
        p.next()
        p.expect("(")
        parts = [p.term()]
        while p.kw(","):
            parts.append(p.term())
        p.expect(")")
        return (head.lower(), parts)
    if head == "IF":
        p.next()
        p.expect("(")
        left = p.term()
        op = p.next()
        if op not in _OPS:
            raise SparqlError(f"IF condition: unsupported operator {op!r}")
        right = p.term()
        p.expect(",")
        then = p.term()
        p.expect(",")
        els = p.term()
        p.expect(")")
        return ("if", (left, op, right), then, els)
    left = p.term()
    if p.peek() in _ARITH:
        op = p.next()
        return ("arith", left, op, p.term())
    return ("term", left)


def _bind_col(expr, bound: set) -> Column:
    def side(t: _Term, numeric=False) -> Column:
        if t.kind == "var":
            if t.value not in bound:
                raise SparqlError(
                    f"BIND uses unbound variable ?{t.value}"
                )
            c = F.col(t.value)
            return c.cast("double") if numeric else c
        c = F.lit(t.value)
        return c if t.kind == "num" or not numeric else c.cast("double")

    kind = expr[0]
    if kind == "term":
        return side(expr[1])
    if kind == "concat":
        return F.concat(
            *[side(t).cast("string") for t in expr[1]]
        )
    if kind == "coalesce":
        return F.coalesce(*[side(t) for t in expr[1]])
    if kind == "if":
        (left, op, right), then, els = expr[1], expr[2], expr[3]
        for t in (left, right):
            if t.kind == "var" and t.value not in bound:
                raise SparqlError(
                    f"BIND uses unbound variable ?{t.value}"
                )
        return F.when(_filter_col(left, op, right), side(then)).otherwise(
            side(els)
        )
    _, left, op, right = expr
    l, r = side(left, numeric=True), side(right, numeric=True)
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    return l / r


def _mk_triple(s: _Term, pr: _Term, o: _Term) -> tuple:
    """Assemble one triple; an inverse predicate ``^p`` is rewritten to
    the forward edge with swapped ends right here. An inverse CLOSURE
    ``^p+`` / ``^p*`` likewise swaps ends — reachability over reversed
    edges IS the reversed reachability relation — leaving downstream
    closure terms inverse-free ``(pred, star)`` pairs."""
    if pr.kind == "inv":
        return (o, _Term("const", pr.value), s)
    if pr.kind == "closure":
        pv, star, inv = pr.value
        fwd = _Term("closure", (pv, star))
        return (o, fwd, s) if inv else (s, fwd, o)
    return (s, pr, o)


def _parse_triple_group(p: _Parser, out: list) -> None:
    """One subject's triple patterns with SPARQL list sugar: ``;``
    repeats the subject, ``,`` repeats subject+predicate. Consumes a
    trailing ``.`` if any."""
    s = p.term()
    while True:
        pr = p.pred_term()
        while True:
            out.append(_mk_triple(s, pr, p.term()))
            if not p.kw(","):
                break
        if not p.kw(";"):
            break
    p.kw(".")


def _parse_template_group(p: _Parser, out: list) -> None:
    """One subject's CONSTRUCT-template patterns: same ``;``/``,``
    sugar as a WHERE group, but every slot must be a plain variable or
    constant — paths, alternations, and inverse predicates have no
    meaning in a template and the plain ``term()`` parser rejects
    their operator tokens. Consumes a trailing ``.`` if any."""

    def slot() -> _Term:
        t = p.term()
        if t.kind == "num":
            # normalize like VALUES: integers without the trailing .0
            v = float(t.value)
            return _Term(
                "const", str(int(v)) if v.is_integer() else str(v)
            )
        return t

    s = slot()
    while True:
        pr = slot()
        while True:
            out.append((s, pr, slot()))
            if not p.kw(","):
                break
        if not p.kw(";"):
            break
    p.kw(".")


def _values_const(p: _Parser) -> str:
    """One VALUES datum: a constant or number (normalized the same way
    node lowering normalizes — integers without the trailing .0)."""
    t = p.term()
    if t.kind == "var":
        raise SparqlError("VALUES data must be constants, not variables")
    if t.kind in ("alt", "path", "seq", "inv"):
        raise SparqlError("VALUES data must be plain constants")
    if t.kind == "num":
        v = t.value
        return str(int(v)) if float(v).is_integer() else str(v)
    return str(t.value)


def _parse_values(p: _Parser) -> tuple[list[str], list[tuple]]:
    """``VALUES ?x { a b }`` or ``VALUES (?x ?y) { (a b) (c d) }``
    (the VALUES keyword already consumed). UNDEF is rejected — this
    subset has no partial-binding compatibility semantics."""
    if p.kw("("):
        vars_: list[str] = []
        while p.peek() is not None and p.peek().startswith("?"):
            vars_.append(p.next()[1:])
        p.expect(")")
        if not vars_:
            raise SparqlError("VALUES needs at least one ?var")
        p.expect("{")
        rows: list[tuple] = []
        while not p.kw("}"):
            p.expect("(")
            row = tuple(_values_const(p) for _ in vars_)
            p.expect(")")
            rows.append(row)
    else:
        var = p.next()
        if not var.startswith("?"):
            raise SparqlError(f"VALUES needs a ?var, got {var!r}")
        vars_ = [var[1:]]
        p.expect("{")
        rows = []
        while not p.kw("}"):
            rows.append((_values_const(p),))
    if not rows:
        raise SparqlError("empty VALUES block")
    p.kw(".")
    return vars_, rows


def _parse_block(p: _Parser) -> dict:
    """Parse block elements until the closing '}' (consumed):
    triples, FILTER, FILTER NOT EXISTS, OPTIONAL, MINUS, VALUES."""
    triples: list[tuple] = []
    antis: list[tuple] = []
    optionals: list[list[tuple]] = []
    minuses: list[list[tuple]] = []
    values: list[tuple[list[str], list[tuple]]] = []
    filters: list[tuple] = []
    bound_tests: list[tuple[str, bool]] = []  # (var, want_bound)
    binds: list[tuple[str, tuple]] = []  # (var, expression AST)
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlError("unterminated block")
        if tok == "}":
            p.next()
            break
        if tok.upper() in ("OPTIONAL", "MINUS"):
            which = p.next().upper()
            p.expect("{")
            sub: list[tuple] = []
            while True:
                t2 = p.peek()
                if t2 is None:
                    raise SparqlError(f"unterminated {which} block")
                if t2 == "}":
                    p.next()
                    break
                if t2.upper() in (
                    "FILTER", "OPTIONAL", "UNION", "MINUS", "VALUES",
                ):
                    raise SparqlError(
                        "only plain triple patterns are supported inside "
                        f"{which}"
                    )
                _parse_triple_group(p, sub)
            if not sub:
                raise SparqlError(f"empty {which} block")
            (optionals if which == "OPTIONAL" else minuses).append(sub)
            p.kw(".")
            continue
        if tok.upper() == "VALUES":
            p.next()
            values.append(_parse_values(p))
            continue
        if tok.upper() == "FILTER":
            p.next()
            _parse_filter_clause(p, antis, filters, bound_tests)
            continue
        if tok.upper() == "BIND":
            p.next()
            p.expect("(")
            expr = _parse_bind_expr(p)
            p.expect("AS")
            var = p.next()
            if not var.startswith("?"):
                raise SparqlError("BIND needs '… AS ?var'")
            p.expect(")")
            p.kw(".")
            binds.append((var[1:], expr))
            continue
        if tok == "{" or tok.upper() == "UNION":
            raise SparqlError(
                "group patterns may only appear as a top-level "
                "{ … } UNION { … } chain"
            )
        _parse_triple_group(p, triples)
    if not triples:
        raise SparqlError("block has no triple patterns")
    return {
        "triples": triples, "antis": antis, "optionals": optionals,
        "minuses": minuses, "values": values,
        "filters": filters, "bound_tests": bound_tests, "binds": binds,
    }


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
    distinct = False
    items: "list[tuple] | None" = None
    template: list[tuple] = []
    if p.kw("ASK"):
        form = "ask"
    elif p.kw("DESCRIBE"):
        # constants-only form; no WHERE block follows
        nodes: list[str] = []
        while p.peek() is not None:
            t = p.term()
            if t.kind != "const":
                raise SparqlError(
                    "DESCRIBE takes constant nodes only (no ?vars/WHERE)"
                )
            nodes.append(str(t.value))
        if not nodes:
            raise SparqlError("DESCRIBE needs at least one node")
        return {"form": "describe", "nodes": nodes}
    elif p.kw("CONSTRUCT"):
        form = "construct"
        p.expect("{")
        while p.peek() is not None and p.peek() != "}":
            _parse_template_group(p, template)
        p.expect("}")
        if not template:
            raise SparqlError("CONSTRUCT needs at least one template triple")
        p.expect("WHERE")
    else:
        p.expect("SELECT")
        form = "select"
        distinct = p.kw("DISTINCT")
        if p.kw("*"):
            items = None
        else:
            items = []
            while True:
                tok = p.peek()
                if tok is None:
                    break
                if tok.startswith("?"):
                    items.append(("var", p.next()[1:]))
                elif tok == "(":
                    p.next()
                    func = p.next().upper()
                    if func not in _AGG_FUNCS:
                        raise SparqlError(
                            f"unsupported aggregate {func!r} (supported: "
                            f"{sorted(_AGG_FUNCS)})"
                        )
                    p.expect("(")
                    agg_distinct = p.kw("DISTINCT")
                    if p.kw("*"):
                        if func != "COUNT" or agg_distinct:
                            raise SparqlError(
                                "'*' is only supported in COUNT(*)"
                            )
                        var = None
                    else:
                        v = p.next()
                        if not v.startswith("?"):
                            raise SparqlError(
                                f"aggregate needs a ?var or *, got {v!r}"
                            )
                        var = v[1:]
                    sep = " "
                    if p.kw(";"):
                        word = p.next()
                        if word.upper() != "SEPARATOR":
                            raise SparqlError(
                                f"expected SEPARATOR, got {word!r}"
                            )
                        if func != "GROUP_CONCAT":
                            raise SparqlError(
                                "SEPARATOR only applies to GROUP_CONCAT"
                            )
                        p.expect("=")
                        s = p.next()
                        if not s.startswith('"'):
                            raise SparqlError(
                                "SEPARATOR needs a quoted string"
                            )
                        sep = _unquote(s)
                    p.expect(")")
                    p.expect("AS")
                    alias_tok = p.next()
                    if not alias_tok.startswith("?"):
                        raise SparqlError("aggregate alias needs a ?name")
                    alias = alias_tok[1:]
                    if _INTERNAL.fullmatch(alias):
                        raise SparqlError(
                            f"?{alias} collides with internal variable slots"
                        )
                    p.expect(")")
                    items.append(
                        ("agg", func, agg_distinct, var, alias, sep)
                    )
                else:
                    break
            if not items:
                raise SparqlError("SELECT needs ?vars, aggregates, or *")
        p.expect("WHERE")
    p.expect("{")
    branches: list[dict] = []
    if p.peek() == "{":
        # top-level { block } UNION { block } …
        while True:
            p.expect("{")
            branches.append(_parse_block(p))
            if p.kw("UNION"):
                continue
            break
        # Trailing FILTERs after the UNION chain apply to the union
        # result. Filters distribute over union, and every branch must
        # bind the same variables (enforced at compile time), so lower
        # each outer filter into EVERY branch — Catalyst then pushes it
        # below each branch's joins independently.
        while p.peek() is not None and p.peek().upper() == "FILTER":
            p.next()
            antis: list[tuple] = []
            filters: list[tuple] = []
            bound_tests: list[tuple[str, bool]] = []
            _parse_filter_clause(p, antis, filters, bound_tests)
            for b in branches:
                b["antis"].extend(antis)
                b["filters"].extend(filters)
                b["bound_tests"].extend(bound_tests)
        p.expect("}")
    else:
        branches.append(_parse_block(p))
    group: list[str] = []
    if p.kw("GROUP"):
        if form != "select":
            raise SparqlError(
                f"GROUP BY makes no sense under {form.upper()}"
            )
        p.expect("BY")
        while p.peek() is not None and p.peek().startswith("?"):
            group.append(p.next()[1:])
        if not group:
            raise SparqlError("empty GROUP BY")
    having: list[tuple] = []
    if p.kw("HAVING"):
        if form != "select":
            raise SparqlError(
                f"HAVING makes no sense under {form.upper()}"
            )
        p.expect("(")
        while True:
            left = p.term()
            op = p.next()
            if op not in _OPS:
                raise SparqlError(
                    f"unsupported operator {op!r} in HAVING"
                )
            having.append((left, op, p.term()))
            if not p.kw("&&"):
                break
        p.expect(")")
    order: list[tuple[str, bool]] = []
    if p.kw("ORDER"):
        if form == "construct":
            raise SparqlError(
                "ORDER BY under CONSTRUCT is not supported — the result "
                "is a distinct graph, not a solution sequence"
            )
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
        if form == "construct":
            raise SparqlError(
                "LIMIT under CONSTRUCT is not supported — it would pick "
                "a nondeterministic subset of an unordered solution bag"
            )
        tok = p.next()
        if not re.fullmatch(r"[0-9]+", tok):
            raise SparqlError(f"LIMIT needs an integer, got {tok!r}")
        limit = int(tok)
    if p.peek() is not None:
        raise SparqlError(f"trailing tokens from {p.peek()!r}")
    return {
        "form": form, "distinct": distinct, "items": items,
        "branches": branches, "group": group, "having": having,
        "order": order, "limit": limit, "template": template,
    }


def _expand_paths(triples: list[tuple]) -> list[list[tuple]]:
    """Rewrite bounded-path and sequence predicates into chains over
    fresh internal node variables; returns the variant list (cartesian
    across path patterns, capped at MAX_VARIANTS). An inverted element
    contributes the forward edge with swapped ends."""
    variants: list[list[tuple]] = [[]]
    fresh = [0]

    def edge(a, pv, inv, b):
        pr = _Term("const", pv)
        return (b, pr, a) if inv else (a, pr, b)

    def chain(s, elems, o):
        """elems: list of (pred, inverted) walked left to right."""
        out = []
        prev = s
        for step, (pv, inv) in enumerate(elems[:-1]):
            mid = _Term("var", f"_path{fresh[0]}_{step}")
            out.append(edge(prev, pv, inv, mid))
            prev = mid
        pv, inv = elems[-1]
        out.append(edge(prev, pv, inv, o))
        return out

    for s, pr, o in triples:
        if pr.kind == "path":
            pv, m, n, inv = pr.value
            new = []
            for variant in variants:
                for length in range(m, n + 1):
                    new.append(
                        variant + chain(s, [(pv, inv)] * length, o)
                    )
                    fresh[0] += 1
            variants = new
            if len(variants) > MAX_VARIANTS:
                raise SparqlError(
                    f"path expansion exceeds {MAX_VARIANTS} variants"
                )
        elif pr.kind == "seq":
            variants = [v + chain(s, pr.value, o) for v in variants]
            fresh[0] += 1
        else:
            variants = [v + [(s, pr, o)] for v in variants]
    return variants


class _Lowering:
    """Term lowering shared by one block compilation: node constants
    become shared internal variables with equality constraints (same
    constant → same variable, so the motif compiler equi-joins
    occurrences); predicate constants stay literals (pushed into the
    scan); ``?p`` predicates become motif ``?``-bound variables;
    alternations become internal predicate variables with an IN
    filter."""

    def __init__(self):
        self.const_var: dict[str, str] = {}
        self.const_eqs: list[tuple[str, str]] = []
        self.alt_filters: list[tuple[str, list[str]]] = []
        self.neg_filters: list[tuple[str, list[str]]] = []

    def node(self, t: _Term) -> str:
        if t.kind == "var":
            # internal-looking user vars are rejected at parse time, so
            # a var here is either a user var or a path-chain internal
            return t.value
        if t.kind == "num":
            v = t.value
            value = str(int(v)) if float(v).is_integer() else str(v)
        else:
            value = str(t.value)
        if value not in self.const_var:
            iv = f"_const{len(self.const_var)}"
            self.const_var[value] = iv
            self.const_eqs.append((iv, value))
        return self.const_var[value]

    def pred(self, t: _Term) -> "str | None":
        if t.kind == "var":
            return "?" + t.value
        if t.kind == "alt":
            iv = f"_alt{len(self.alt_filters)}"
            self.alt_filters.append((iv, [str(v) for v in t.value]))
            return "?" + iv
        if t.kind == "neg":
            iv = f"_neg{len(self.neg_filters)}"
            self.neg_filters.append((iv, [str(v) for v in t.value]))
            return "?" + iv
        return str(t.value)


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
        if t.kind in ("alt", "path"):
            raise SparqlError("paths are not supported inside NOT EXISTS")
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


def _user_vars(triples: list[tuple]) -> list[str]:
    """User-visible variables of a triple list, first-appearance order:
    node variables then predicate variables (motif's output contract),
    internals excluded."""
    node_vars: list[str] = []
    pred_vars: list[str] = []
    for s, pr, o in triples:
        for t in (s, o):
            if t.kind == "var" and not _INTERNAL.fullmatch(t.value) \
                    and t.value not in node_vars:
                node_vars.append(t.value)
        if pr.kind == "var" and pr.value not in pred_vars:
            pred_vars.append(pr.value)
    return node_vars + [v for v in pred_vars if v not in node_vars]


def _splice_closures(
    edges: DataFrame, triples: list[tuple]
) -> tuple[DataFrame, list[tuple]]:
    """Replace closure predicates with internal marker constants and
    splice each closure's reachability pairs into the edge frame under
    that marker. One fixpoint per distinct (pred, star) in the pattern
    — shared across variants and across multiple uses; the marker
    starts with ``\\x1f`` and real edges carrying a ``\\x1f``-prefixed
    predicate are excluded from the augmented frame, so a marker can
    never alias a user predicate."""
    keys: list[tuple[str, bool]] = []
    for _, pr, _ in triples:
        if pr.kind == "closure" and pr.value not in keys:
            keys.append(pr.value)
    if not keys:
        return edges, triples
    from naruhodo_spark.operators.closure import (
        reflexive_transitive_closure,
        transitive_closure,
    )

    aug = edges.where(F.substring("pred", 1, 1) != "\x1f")
    nodes = None
    markers: dict[tuple[str, bool], str] = {}
    for i, (pv, star) in enumerate(keys):
        marker = f"\x1f_closure{i}\x1f{pv}{'*' if star else '+'}"
        markers[(pv, star)] = marker
        rel = edges.where(F.col("pred") == pv).select("src", "dst")
        if star:
            if nodes is None:
                # zero-length paths match every node of the GRAPH
                # (SPARQL 1.1 §9.3), not just the relation's endpoints
                nodes = (
                    edges.select(F.col("src").alias("node"))
                    .unionByName(edges.select(F.col("dst").alias("node")))
                    .distinct()
                    .localCheckpoint(eager=False)
                )
            cdf = reflexive_transitive_closure(rel, nodes)
        else:
            cdf = transitive_closure(rel)
        aug = aug.unionByName(
            cdf.select("src", F.lit(marker).alias("pred"), "dst")
        )
    new_triples = [
        (
            s,
            _Term("const", markers[pr.value]) if pr.kind == "closure" else pr,
            o,
        )
        for s, pr, o in triples
    ]
    return aug, new_triples


def _compile_bgp(edges: DataFrame, triples: list[tuple]) -> DataFrame:
    """One basic graph pattern (possibly with paths/alternations) →
    solutions projected to its user variables."""
    from naruhodo_spark.operators.motif import match_motif

    uvars = _user_vars(triples)
    edges, triples = _splice_closures(edges, triples)
    out = None
    for variant in _expand_paths(triples):
        low = _Lowering()
        pattern = [
            (low.node(s), low.pred(pr), low.node(o))
            for s, pr, o in variant
        ]
        sol = match_motif(edges, pattern, anti=None, distinct_nodes=False)
        for iv, value in low.const_eqs:
            sol = sol.where(F.col(iv) == F.lit(value))
        for iv, values in low.alt_filters:
            sol = sol.where(F.col(iv).isin(values))
        for iv, values in low.neg_filters:
            sol = sol.where(~F.col(iv).isin(values))
        sol = sol.select(*uvars)
        out = sol if out is None else out.unionByName(sol)
    return out


def _compile_block(edges: DataFrame, block: dict) -> DataFrame:
    out = _compile_bgp(edges, block["triples"])
    bound = set(out.columns)
    for vars_, rows in block["values"]:
        # Inline data is a bag join on the shared variables; the tiny
        # literal table is broadcast so the solutions never shuffle.
        shared = [v for v in vars_ if v in bound]
        if not shared:
            raise SparqlError(
                "VALUES must share at least one variable with the "
                "patterns (a disjoint VALUES is a cross product)"
            )
        vdf = edges.sparkSession.createDataFrame(
            rows, ", ".join(f"{v} string" for v in vars_)
        )
        out = out.join(F.broadcast(vdf), on=shared, how="inner")
        bound.update(vars_)
    for opt in block["optionals"]:
        sub = _compile_bgp(edges, opt)
        shared = [c for c in sub.columns if c in bound]
        if not shared:
            raise SparqlError(
                "OPTIONAL must share at least one variable with the "
                "positive patterns"
            )
        out = out.join(sub, on=shared, how="left")
        bound.update(sub.columns)
    for s, pr, o in block["antis"]:
        out = _not_exists(out, edges, s, pr, o, bound)
    for mn in block["minuses"]:
        sub = _compile_bgp(edges, mn)
        shared = [c for c in sub.columns if c in bound]
        if not shared:
            # SPARQL semantics: MINUS with a disjoint variable domain
            # removes nothing (no binding is "compatible AND overlapping")
            continue
        out = out.join(
            sub.select(*shared).distinct(), on=shared, how="left_anti"
        )
    # BIND after the pattern joins (its variables must come from the
    # patterns; later binds may use earlier ones) and before FILTER /
    # BOUND, which per SPARQL group semantics see the whole group's
    # bindings. BIND variables cannot appear in triple patterns — the
    # simplification vs full SPARQL sequential scope, rejected loudly
    # via the shadowing check here.
    for var, expr in block["binds"]:
        if var in bound:
            raise SparqlError(
                f"BIND would rebind ?{var}, which is already bound"
            )
        out = out.withColumn(var, _bind_col(expr, bound))
        bound.add(var)
    for var, want in block["bound_tests"]:
        if var not in bound:
            raise SparqlError(f"BOUND tests unknown variable ?{var}")
        out = out.where(
            F.col(var).isNotNull() if want else F.col(var).isNull()
        )
    for left, op, right in block["filters"]:
        for t in (left, right):
            if t.kind == "var" and t.value not in bound:
                raise SparqlError(f"FILTER uses unbound variable ?{t.value}")
        out = out.where(_filter_col(left, op, right))
    return out


def _agg_col(
    func: str, distinct: bool, var: "str | None", sep: str = " "
) -> Column:
    """One SELECT aggregate → a Spark aggregate column. SUM/AVG cast
    to double (the engine's node domain is strings); MIN/MAX compare
    lexically, matching SPARQL's behavior on plain literals.
    GROUP_CONCAT sorts its values lexicographically before joining and
    SAMPLE is min() — SPARQL leaves both orders implementation-defined
    and a distributed engine must pick DETERMINISTIC readings."""
    if func == "GROUP_CONCAT":
        vals = (
            F.collect_set(var) if distinct else F.collect_list(var)
        )
        return F.array_join(F.sort_array(vals), sep)
    if func == "SAMPLE":  # DISTINCT is a no-op for a single pick
        return F.min(var)
    if func == "COUNT":
        if var is None:
            return F.count(F.lit(1))
        return (
            F.count_distinct(F.col(var)) if distinct else F.count(var)
        )
    if func in ("MIN", "MAX"):  # DISTINCT is a no-op for min/max
        return F.min(var) if func == "MIN" else F.max(var)
    col = F.col(var).cast("double")
    if func == "SUM":
        return F.sum_distinct(col) if distinct else F.sum(col)
    # AVG: no avg_distinct builtin; var names are tokenizer-safe
    # identifiers so the expr string cannot inject
    if distinct:
        return F.expr(f"avg(DISTINCT cast({var} AS double))")
    return F.avg(col)


def _as_edges(edges: DataFrame) -> DataFrame:
    """Accept (src, pred, dst) directly, or a KSG table with (subj,
    pred, obj) renamed via the same edge_target contract as the motif
    engine."""
    if "subj" in edges.columns and "src" not in edges.columns:
        from naruhodo_spark.operators.agg import edge_target

        edges = edges.select(
            F.col("subj").alias("src"), "pred",
            edge_target().alias("dst"),
        )
    return edges


def sparql_select(edges: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT or ASK (subset above) over an edge DataFrame
    with (src, pred, dst) columns — or a KSG table with (subj, pred,
    obj), renamed via the same edge_target contract as the motif
    engine. Returns one column per projected variable (SELECT) or one
    boolean ``ask`` row (ASK)."""
    edges = _as_edges(edges)
    parsed = _parse(query)
    if parsed["form"] == "construct":
        raise SparqlError("CONSTRUCT queries go through sparql_construct")
    if parsed["form"] == "describe":
        raise SparqlError("DESCRIBE queries go through sparql_describe")
    frames = [_compile_block(edges, b) for b in parsed["branches"]]
    var_sets = [tuple(sorted(f.columns)) for f in frames]
    if len(set(var_sets)) > 1:
        raise SparqlError(
            f"UNION branches bind different variables: {sorted(set(var_sets))}"
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if parsed["form"] == "ask":
        return out.limit(1).agg(
            (F.count(F.lit(1)) > 0).alias("ask")
        )
    bound = set(out.columns)
    items = parsed["items"]
    group = parsed["group"]
    aggs = [it for it in (items or []) if it[0] == "agg"]
    if group or aggs:
        if items is None:
            raise SparqlError("SELECT * cannot be combined with GROUP BY")
        plain = [it[1] for it in items if it[0] == "var"]
        aliases = [it[4] for it in aggs]
        for v in group:
            if v not in bound:
                raise SparqlError(f"GROUP BY on unbound variable ?{v}")
        for v in plain:
            if v not in group:
                raise SparqlError(
                    f"SELECT ?{v} must appear in GROUP BY when aggregating"
                )
        for _, func, _, var, alias, _sep in aggs:
            if var is not None and var not in bound:
                raise SparqlError(
                    f"{func} aggregates unbound variable ?{var}"
                )
        names = [it[1] if it[0] == "var" else it[4] for it in items]
        if len(set(names)) != len(names) or set(aliases) & bound:
            raise SparqlError(
                "aggregate aliases must be unique and must not shadow "
                "pattern variables"
            )
        if aggs:
            gb = out.groupBy(*group) if group else out.groupBy()
            out = gb.agg(
                *[
                    _agg_col(func, dist, var, sep).alias(alias)
                    for _, func, dist, var, alias, sep in aggs
                ]
            )
        else:
            # GROUP BY with no aggregates = the distinct group keys
            out = out.select(*group).distinct()
        visible = set(group) | set(aliases)
        for left, op, right in parsed["having"]:
            for t in (left, right):
                if t.kind == "var" and t.value not in visible:
                    raise SparqlError(
                        f"HAVING uses ?{t.value}, which is neither a "
                        "group key nor an aggregate alias"
                    )
            out = out.where(_filter_col(left, op, right))
        proj = names
    else:
        if parsed["having"]:
            raise SparqlError("HAVING requires GROUP BY or aggregates")
        proj = (
            list(frames[0].columns)
            if items is None
            else [it[1] for it in items]
        )
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


def sparql_construct(edges: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL ``CONSTRUCT { template } WHERE { … }`` (subset
    above) over an edge DataFrame and return the constructed graph as
    a DISTINCT (src, pred, dst) DataFrame.

    Semantics (SPARQL 1.1 §16.2): the template is instantiated once
    per WHERE solution; a template triple whose variable is unbound in
    a solution (OPTIONAL miss) contributes nothing for that solution;
    the results across template triples and solutions union into a
    set. Scale shape: the WHERE block is the same equi-join chain as
    SELECT; each template triple is ONE map-only projection of the
    solution frame; the final distinct is one hash aggregate on the
    uniform (src, pred, dst) key — no new join surfaces."""
    edges = _as_edges(edges)
    parsed = _parse(query)
    if parsed["form"] != "construct":
        raise SparqlError(
            f"sparql_construct needs a CONSTRUCT query, got "
            f"{parsed['form'].upper()} — use sparql_select/sparql_describe"
        )
    frames = [_compile_block(edges, b) for b in parsed["branches"]]
    var_sets = [tuple(sorted(f.columns)) for f in frames]
    if len(set(var_sets)) > 1:
        raise SparqlError(
            f"UNION branches bind different variables: {sorted(set(var_sets))}"
        )
    sols = frames[0]
    for f in frames[1:]:
        sols = sols.unionByName(f)
    bound = set(sols.columns)
    tmpl_vars = {
        t.value
        for triple in parsed["template"]
        for t in triple
        if t.kind == "var"
    }
    missing = sorted(tmpl_vars - bound)
    if missing:
        raise SparqlError(
            f"CONSTRUCT template uses unbound variables {missing}"
        )

    def slot_col(t: _Term) -> Column:
        return F.col(t.value) if t.kind == "var" else F.lit(str(t.value))

    out = None
    for s, pr, o in parsed["template"]:
        row = sols.select(
            slot_col(s).alias("src"),
            slot_col(pr).alias("pred"),
            slot_col(o).alias("dst"),
        )
        out = row if out is None else out.unionByName(row)
    # an unbound OPTIONAL variable nulls its slot — that solution emits
    # nothing for this template triple (spec: the triple is dropped)
    return out.where(
        F.col("src").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("dst").isNotNull()
    ).distinct()


def sparql_describe(edges: DataFrame, query: str) -> DataFrame:
    """Run ``DESCRIBE node [node …]`` (constants only) and return this
    engine's bounded Concise-Bounded-Description: every edge incident
    to any named node, as (src, pred, dst). One isin filter Catalyst
    pushes into the edge scan — map-only at any graph size."""
    edges = _as_edges(edges)
    parsed = _parse(query)
    if parsed["form"] != "describe":
        raise SparqlError(
            f"sparql_describe needs a DESCRIBE query, got "
            f"{parsed['form'].upper()}"
        )
    nodes = parsed["nodes"]
    return edges.select("src", "pred", "dst").where(
        F.col("src").isin(nodes) | F.col("dst").isin(nodes)
    )
