"""RDF N-Triples interchange — format KG edges as W3C N-Triples lines
and parse N-Triples text back into an edge DataFrame, both as pure
Catalyst column programs (chained ``regexp_replace`` / one
``regexp_extract`` per field; no Python in the row path).

N-Triples (https://www.w3.org/TR/n-triples/) is the line-oriented RDF
serialization every public triple store ingests (Wikidata dumps,
DBpedia, Freebase exports), so it is the natural interchange surface
for a KG-construction engine: ``format_ntriples`` publishes the KSG,
``parse_ntriples`` ingests third-party graphs into the same
(subj, pred, obj) edge shape the rest of the package consumes.

Scale shape: both directions are map-only column expressions over the
edge/line frame — zero shuffles, zero driver state, whole-stage
codegen end to end. A 10^12-edge export is exactly as partitionable as
its input; ordering is the caller's choice (``export.py`` discipline:
sort only when a deterministic file is requested).

Escaping contract (the subset of the spec this engine emits):

- IRIs are ``<base><percent-encoded local name>``. The local name
  percent-encodes ``%`` first, then the characters N-Triples forbids
  inside ``IRIREF`` (space, ``< > " { } | ^ `` backtick, backslash)
  plus newline/tab/CR — the codeset is :data:`IRI_CODES`.
- Literals escape backslash first, then ``"``, LF, CR, TAB
  (:data:`LIT_CODES`), per the spec's ECHAR production.
- ``parse_ntriples`` keeps IRIs verbatim (RFC 3987: percent-encoding
  in an IRI is significant; decoding is NOT idempotent), and exposes
  :func:`strip_base` to invert exactly this module's encoder for
  roundtrips. ``\\uXXXX`` escapes in foreign files are kept raw (the
  audit column flags nothing — they are legal literal bytes here).
- Malformed lines are never silently dropped (repo policy): they come
  back with null fields and ``malformed = true`` so callers can audit
  or quarantine them; blank lines and ``#`` comment lines (legal
  N-Triples) are dropped as non-data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: '%' must be encoded first (else re-encoding the escape
# introducer corrupts prior codes) and decoded last.
IRI_CODES: list[tuple[str, str]] = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\\", "%5C"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
]

# literal ECHARs; backslash first on encode, last on decode.
LIT_CODES: list[tuple[str, str]] = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def _chain_replace(col, pairs: list[tuple[str, str]]):
    for raw, esc in pairs:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def encode_iri(col, base: str):
    """``<base + percent-encoded name>`` as a Catalyst expression."""
    return F.concat(
        F.lit("<"), F.lit(base), _chain_replace(col, IRI_CODES), F.lit(">")
    )


def encode_literal(col):
    """``"escaped text"`` as a Catalyst expression."""
    return F.concat(F.lit('"'), _chain_replace(col, LIT_CODES), F.lit('"'))


def format_ntriples(
    edges: DataFrame,
    base: str = "http://example.org/kg/",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    obj_is_literal: bool = False,
) -> DataFrame:
    """One ``line`` column of N-Triples per edge row (map-only).

    ``obj_is_literal=True`` emits the object as an escaped string
    literal instead of an IRI (use for attribute/comment edges).
    NULL in any term is a data error the caller should have filtered;
    here it is surfaced, not hidden: the line is emitted as NULL so a
    count of NULL lines is the malformed-input audit.
    """
    obj = (
        encode_literal(F.col(obj_col))
        if obj_is_literal
        else encode_iri(F.col(obj_col), base)
    )
    return edges.select(
        F.concat(
            encode_iri(F.col(subj_col), base),
            F.lit(" "),
            encode_iri(F.col(pred_col), base),
            F.lit(" "),
            obj,
            F.lit(" ."),
        ).alias("line")
    )


def write_ntriples(
    edges: DataFrame, path: str, base: str = "http://example.org/kg/", **kw
) -> None:
    """Format + write as text files. Unsorted and partition-parallel on
    purpose — a 10^12-edge dump must not single-thread through a global
    sort; downstream RDF loaders are order-insensitive."""
    format_ntriples(edges, base=base, **kw).where(
        F.col("line").isNotNull()
    ).write.mode("overwrite").text(path)


# one regex per term keeps each extraction a single whole-stage-codegen
# expression; the full-line anchor is re-checked for the malformed flag.
_IRI = r"<([^<>\s]*)>"
_LIT = r'"((?:[^"\\]|\\.)*)"(?:\^\^<[^<>\s]*>|@[A-Za-z][A-Za-z0-9-]*)?'
_LINE = rf"^\s*{_IRI}\s+{_IRI}\s+(?:{_IRI}|{_LIT})\s*\.\s*$"


def parse_ntriples(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """(subj, pred, obj, obj_kind, malformed) from N-Triples text.

    ``obj_kind`` is 'iri' or 'literal'; literal objects are unescaped
    (ECHAR decode, backslash last), IRIs are kept verbatim (see module
    docstring). Datatype/langtag suffixes are accepted and discarded.
    Blank and comment lines are dropped; anything else that fails the
    grammar survives with ``malformed = true`` and null terms.
    """
    c = F.col(line_col)
    data = lines.where(
        c.isNotNull() & ~c.rlike(r"^\s*$") & ~c.rlike(r"^\s*#")
    )
    ok = c.rlike(_LINE)
    iri_obj = F.regexp_extract(c, _LINE, 3)
    lit_obj = F.regexp_extract(c, _LINE, 4)
    # a line whose object term is a literal (exact grammar re-check, so
    # the empty IRI `<>` is never misread as an empty literal)
    is_lit = ok & c.rlike(rf"^\s*{_IRI}\s+{_IRI}\s+{_LIT}\s*\.\s*$")
    # ECHAR decode must treat the escaped backslash atomically — a
    # sequential replace chain would mis-decode r'\\n' (escaped
    # backslash + n) as backslash + LF. Split on the literal two-char
    # token '\\' (so each segment's remaining backslashes are exactly
    # the named-escape introducers the grammar allows), decode the
    # named ECHARs per segment, rejoin with a real backslash.
    segs = F.split(lit_obj, r"\\\\", -1)
    unescaped = F.array_join(
        F.transform(
            segs,
            lambda s: _chain_replace(
                s, [("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')]
            ),
        ),
        "\\",
    )
    return data.select(
        F.when(ok, F.regexp_extract(c, _LINE, 1)).alias("subj"),
        F.when(ok, F.regexp_extract(c, _LINE, 2)).alias("pred"),
        F.when(
            ok, F.when(is_lit, unescaped).otherwise(iri_obj)
        ).alias("obj"),
        F.when(ok, F.when(is_lit, F.lit("literal")).otherwise(F.lit("iri"))).alias(
            "obj_kind"
        ),
        (~ok).alias("malformed"),
    )


def read_ntriples(spark, path: str) -> DataFrame:
    """Text files → parsed edge frame (see :func:`parse_ntriples`)."""
    return parse_ntriples(spark.read.text(path), line_col="value")


def strip_base(col, base: str):
    """Invert :func:`encode_iri` for IRIs under ``base``: drop the
    prefix and percent-decode exactly this module's codeset (decode
    order is the encode order reversed, ``%25`` last). IRIs outside
    ``base`` are returned unchanged (still absolute) so mixed-source
    graphs roundtrip losslessly."""
    local = F.substring(col, len(base) + 1, 2_147_483_647)
    decoded = _chain_replace(
        local, [(esc, raw) for raw, esc in reversed(IRI_CODES)]
    )
    return F.when(col.startswith(base), decoded).otherwise(col)
