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
- A WHERE block of triple patterns, or ``{ … } UNION { … }`` group
  alternation (each group is a full block; all groups must bind the
  same variables; bag-semantics union). FILTERs trailing the UNION
  chain apply to the union result (lowered into every branch).
- Terms: ``?var``, ``<iri>`` (angle brackets stripped),
  ``prefix:local``, ``"literal"`` (with ``\\" \\\\ \\n \\t`` escapes),
  bare identifiers (a deliberate relaxation — this engine's entities
  are plain strings like ``alice``), and the ``a`` keyword, which
  expands to this engine's taxonomy predicate ``is_a``.
- Predicate paths: alternation ``p|q|r`` (constants only) and the
  bounded quantifier ``p{m,n}`` (1 ≤ m ≤ n ≤ 8) — expanded at compile
  time into per-length join chains over fresh internal variables,
  unioned. Unbounded ``p+``/``p*`` are rejected with a pointer to
  ``p{1,k}`` (an unbounded closure belongs to the iterative operators:
  canon.connected_components / graphstats BFS).
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
- ``ORDER BY (ASC|DESC)?(?v) …`` and ``LIMIT n``.

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
    | (?P<punct>&&|!=|<=|>=|[{}().=<>*:,|!+])
    )
    """,
    re.VERBOSE,
)

_ESCAPES = {'\\"': '"', "\\\\": "\\", "\\n": "\n", "\\t": "\t", "\\r": "\r"}

_OPS = {"=", "!=", "<", "<=", ">", ">="}

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
            len(tok) == 1 and tok in "{}().=<>*,|!+"
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
            "OPTIONAL", "UNION", "BOUND",
        ):
            raise SparqlError(f"expected a term, got {tok!r}")
        return _Term("const", tok)

    def pred_term(self) -> _Term:
        """A predicate position: a plain term, an alternation
        ``p|q|r``, or a bounded path ``p{m,n}``."""
        t = self.term()
        if self.peek() == "|":
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
            raise SparqlError(
                f"unbounded path '{self.peek()}' is not supported — use a "
                "bounded quantifier p{1,k}, or the iterative graph "
                "operators for true closures"
            )
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
            return _Term("path", (str(t.value), m, n))
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


def _parse_block(p: _Parser) -> dict:
    """Parse block elements until the closing '}' (consumed):
    triples, FILTER, FILTER NOT EXISTS, OPTIONAL."""
    triples: list[tuple] = []
    antis: list[tuple] = []
    optionals: list[list[tuple]] = []
    filters: list[tuple] = []
    bound_tests: list[tuple[str, bool]] = []  # (var, want_bound)
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlError("unterminated block")
        if tok == "}":
            p.next()
            break
        if tok.upper() == "OPTIONAL":
            p.next()
            p.expect("{")
            opt: list[tuple] = []
            while True:
                t2 = p.peek()
                if t2 is None:
                    raise SparqlError("unterminated OPTIONAL block")
                if t2 == "}":
                    p.next()
                    break
                if t2.upper() in ("FILTER", "OPTIONAL", "UNION"):
                    raise SparqlError(
                        "only plain triple patterns are supported inside "
                        "OPTIONAL"
                    )
                opt.append((p.term(), p.pred_term(), p.term()))
                p.kw(".")
            if not opt:
                raise SparqlError("empty OPTIONAL block")
            optionals.append(opt)
            p.kw(".")
            continue
        if tok.upper() == "FILTER":
            p.next()
            _parse_filter_clause(p, antis, filters, bound_tests)
            continue
        if tok == "{" or tok.upper() == "UNION":
            raise SparqlError(
                "group patterns may only appear as a top-level "
                "{ … } UNION { … } chain"
            )
        triples.append((p.term(), p.pred_term(), p.term()))
        p.kw(".")
    if not triples:
        raise SparqlError("block has no triple patterns")
    return {
        "triples": triples, "antis": antis, "optionals": optionals,
        "filters": filters, "bound_tests": bound_tests,
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
    proj: "list[str] | None" = None
    if p.kw("ASK"):
        form = "ask"
    else:
        p.expect("SELECT")
        form = "select"
        distinct = p.kw("DISTINCT")
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
    return {
        "form": form, "distinct": distinct, "proj": proj,
        "branches": branches, "order": order, "limit": limit,
    }


def _expand_paths(triples: list[tuple]) -> list[list[tuple]]:
    """Rewrite bounded-path predicates into per-length chains over
    fresh internal node variables; returns the variant list (cartesian
    across path patterns, capped at MAX_VARIANTS)."""
    variants: list[list[tuple]] = [[]]
    fresh = [0]

    def chain(s, pv, length, o):
        out = []
        prev = s
        for step in range(length - 1):
            mid = _Term("var", f"_path{fresh[0]}_{step}")
            out.append((prev, _Term("const", pv), mid))
            prev = mid
        out.append((prev, _Term("const", pv), o))
        return out

    for s, pr, o in triples:
        if pr.kind == "path":
            pv, m, n = pr.value
            new = []
            for variant in variants:
                for length in range(m, n + 1):
                    new.append(variant + chain(s, pv, length, o))
                    fresh[0] += 1
            variants = new
            if len(variants) > MAX_VARIANTS:
                raise SparqlError(
                    f"path expansion exceeds {MAX_VARIANTS} variants"
                )
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


def _compile_bgp(edges: DataFrame, triples: list[tuple]) -> DataFrame:
    """One basic graph pattern (possibly with paths/alternations) →
    solutions projected to its user variables."""
    from naruhodo_spark.operators.motif import match_motif

    uvars = _user_vars(triples)
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
        sol = sol.select(*uvars)
        out = sol if out is None else out.unionByName(sol)
    return out


def _compile_block(edges: DataFrame, block: dict) -> DataFrame:
    out = _compile_bgp(edges, block["triples"])
    bound = set(out.columns)
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


def sparql_select(edges: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL SELECT or ASK (subset above) over an edge DataFrame
    with (src, pred, dst) columns — or a KSG table with (subj, pred,
    obj), renamed via the same edge_target contract as the motif
    engine. Returns one column per projected variable (SELECT) or one
    boolean ``ask`` row (ASK)."""
    if "subj" in edges.columns and "src" not in edges.columns:
        from naruhodo_spark.operators.agg import edge_target

        edges = edges.select(
            F.col("subj").alias("src"), "pred",
            edge_target().alias("dst"),
        )
    parsed = _parse(query)
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
    proj = parsed["proj"]
    if proj is None:
        proj = list(frames[0].columns)
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
