"""N-Triples format/parse — escaping goldens, roundtrip property,
malformed-line audit, and the map-only plan pin."""

from pyspark.sql import functions as F

from naruhodo_spark import rdf

BASE = "http://example.org/kg/"


def _lines(df):
    return [r["line"] for r in df.collect()]


def test_format_iri_golden(spark):
    edges = spark.createDataFrame(
        [("tokyo", "capital_of", "japan")], "subj string, pred string, obj string"
    )
    assert _lines(rdf.format_ntriples(edges, base=BASE)) == [
        f"<{BASE}tokyo> <{BASE}capital_of> <{BASE}japan> ."
    ]


def test_format_percent_encodes_forbidden_iri_chars(spark):
    edges = spark.createDataFrame(
        [('a b<c>"d', "has|brace", "x{y}^`\\\n\r\t%")],
        "subj string, pred string, obj string",
    )
    [line] = _lines(rdf.format_ntriples(edges, base=BASE))
    assert line == (
        f"<{BASE}a%20b%3Cc%3E%22d> <{BASE}has%7Cbrace> "
        f"<{BASE}x%7By%7D%5E%60%5C%0A%0D%09%25> ."
    )
    # '%' encodes FIRST: a raw '%' becomes %25, and a raw '%20'-looking
    # name stays distinguishable from an encoded space
    [l2] = _lines(
        rdf.format_ntriples(
            spark.createDataFrame([("p%20q", "p", "o")], "subj string, pred string, obj string"),
            base=BASE,
        )
    )
    assert l2.startswith(f"<{BASE}p%2520q>")


def test_format_literal_escapes(spark):
    edges = spark.createDataFrame(
        [("n1", "comment", 'say "hi"\\path\nline2\r\ttab')],
        "subj string, pred string, obj string",
    )
    [line] = _lines(rdf.format_ntriples(edges, base=BASE, obj_is_literal=True))
    assert line == (
        f'<{BASE}n1> <{BASE}comment> "say \\"hi\\"\\\\path\\nline2\\r\\ttab" .'
    )


def test_parse_golden_iri_literal_datatype_lang(spark):
    lines = spark.createDataFrame(
        [
            (f"<{BASE}a> <{BASE}p> <{BASE}b> .",),
            (f'<{BASE}a> <{BASE}c> "plain" .',),
            (f'<{BASE}a> <{BASE}c> "typed"^^<http://www.w3.org/2001/XMLSchema#string> .',),
            (f'<{BASE}a> <{BASE}c> "tagged"@en-US .',),
            ("  # a comment",),
            ("",),
            ("this is not a triple",),
            (f'<{BASE}a> <{BASE}c> "no terminator"',),
        ],
        "line string",
    )
    rows = rdf.parse_ntriples(lines).collect()
    # blank + comment dropped; 6 data lines remain
    assert len(rows) == 6
    good = [r for r in rows if not r["malformed"]]
    bad = [r for r in rows if r["malformed"]]
    assert len(bad) == 2 and all(r["subj"] is None for r in bad)
    objs = {(r["obj"], r["obj_kind"]) for r in good}
    assert objs == {
        (f"{BASE}b", "iri"),
        ("plain", "literal"),
        ("typed", "literal"),
        ("tagged", "literal"),
    }


def test_parse_empty_iri_object_is_not_a_literal(spark):
    lines = spark.createDataFrame([(f"<{BASE}a> <{BASE}p> <> .",)], "line string")
    [r] = rdf.parse_ntriples(lines).collect()
    assert not r["malformed"] and r["obj_kind"] == "iri" and r["obj"] == ""


def test_roundtrip_iri_edges(spark):
    # names spanning the whole encoder codeset plus unicode
    names = [
        "plain",
        "two words",
        'q"uote',
        "back\\slash",
        "angle<>",
        "b{r|a^c}e`s",
        "nl\nand\ttab\rcr",
        "pct%20already",
        "日本語ノード",
    ]
    edges = spark.createDataFrame(
        [(a, "rel x", b) for a in names for b in names[:3]],
        "subj string, pred string, obj string",
    )
    lines = rdf.format_ntriples(edges, base=BASE)
    back = rdf.parse_ntriples(lines).select(
        rdf.strip_base(F.col("subj"), BASE).alias("subj"),
        rdf.strip_base(F.col("pred"), BASE).alias("pred"),
        rdf.strip_base(F.col("obj"), BASE).alias("obj"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, edges.collect()))
    # nothing malformed on our own output
    assert rdf.parse_ntriples(lines).where("malformed").count() == 0


def test_roundtrip_literal_edges(spark):
    lits = ['say "hi"', "a\\b", "l1\nl2", "tab\there", "cr\rend", "\\n raw echar-looking"]
    edges = spark.createDataFrame(
        [("s", "p", v) for v in lits], "subj string, pred string, obj string"
    )
    lines = rdf.format_ntriples(edges, base=BASE, obj_is_literal=True)
    got = sorted(
        r["obj"]
        for r in rdf.parse_ntriples(lines).where("obj_kind = 'literal'").collect()
    )
    assert got == sorted(lits)


def test_foreign_iri_outside_base_survives_strip(spark):
    lines = spark.createDataFrame(
        [("<http://other.org/x> <http://other.org/p> <http://other.org/y> .",)],
        "line string",
    )
    [r] = (
        rdf.parse_ntriples(lines)
        .select(rdf.strip_base(F.col("subj"), BASE).alias("s"))
        .collect()
    )
    assert r["s"] == "http://other.org/x"


def test_write_read_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "p", "b"), ("c d", "p", "e%f")], "subj string, pred string, obj string"
    )
    rdf.write_ntriples(edges, str(tmp_path / "nt"), base=BASE)
    back = rdf.read_ntriples(spark, str(tmp_path / "nt")).select(
        rdf.strip_base(F.col("subj"), BASE).alias("subj"),
        rdf.strip_base(F.col("pred"), BASE).alias("pred"),
        rdf.strip_base(F.col("obj"), BASE).alias("obj"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, edges.collect()))


def test_null_term_surfaces_as_null_line_audit(spark):
    edges = spark.createDataFrame(
        [("a", "p", None), ("b", "p", "c")], "subj string, pred string, obj string"
    )
    lines = rdf.format_ntriples(edges, base=BASE)
    assert lines.where(F.col("line").isNull()).count() == 1
    assert lines.where(F.col("line").isNotNull()).count() == 1


def test_plan_is_map_only(spark):
    """Both directions must stay shuffle-free map-only column programs
    (the 10^12-edge contract)."""
    edges = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    for df in (
        rdf.format_ntriples(edges, base=BASE),
        rdf.parse_ntriples(rdf.format_ntriples(edges, base=BASE)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


# ---------------------------------------------------------------- codecs
# Property tests: the codec ALGEBRA roundtrips on arbitrary unicode
# (hypothesis over pure-python mirrors of the replace chains — running
# a Spark job per example would be prohibitive), plus one Spark job
# pinning that Catalyst implements the identical codec.

from hypothesis import given, settings
from hypothesis import strategies as st

from naruhodo_spark.rdf import IRI_CODES, LIT_CODES


def _py_enc_iri(s):
    for raw, esc in IRI_CODES:
        s = s.replace(raw, esc)
    return s


def _py_dec_iri(s):
    for raw, esc in reversed(IRI_CODES):
        s = s.replace(esc, raw)
    return s


def _py_enc_lit(s):
    for raw, esc in LIT_CODES:
        s = s.replace(raw, esc)
    return s


def _py_dec_lit(s):
    segs = s.split("\\\\")
    named = [("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')]
    out = []
    for seg in segs:
        for esc, raw in named:
            seg = seg.replace(esc, raw)
        out.append(seg)
    return "\\".join(out)


_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@given(_texts)
@settings(max_examples=500, deadline=None)
def test_iri_codec_roundtrips_any_unicode(s):
    enc = _py_enc_iri(s)
    assert _py_dec_iri(enc) == s
    # encoded form is IRIREF-clean: none of the forbidden raws survive
    for raw, _ in IRI_CODES[1:]:  # '%' legitimately appears as escapes
        assert raw not in enc


@given(_texts)
@settings(max_examples=500, deadline=None)
def test_literal_codec_roundtrips_any_unicode(s):
    enc = _py_enc_lit(s)
    assert _py_dec_lit(enc) == s
    assert '"' not in enc.replace('\\"', "")
    assert "\n" not in enc and "\r" not in enc and "\t" not in enc


def test_catalyst_codec_equals_python_mirror(spark):
    """One Spark job over a deliberately nasty corpus: the Catalyst
    chains must produce byte-identical encodings to the python mirrors
    and the full parse must invert them."""
    nasty = [
        "", "%", "%%", "%2", "%25", "\\", "\\\\", "\\n", '\\"',
        'a"b\\c\nd\te\rf', "%20%0A", "\\%", "%\\", "  spaced  ",
        "<>{}|^`", "日本\\語\n", '"' * 5, "\\" * 5, "mixed %25\\n\"x",
    ]
    edges = spark.createDataFrame(
        [(n, "p", n) for n in nasty], "subj string, pred string, obj string"
    )
    iri_lines = rdf.format_ntriples(edges, base=BASE).collect()
    for (line,), raw in zip(iri_lines, nasty):
        want = f"<{BASE}{_py_enc_iri(raw)}> <{BASE}p> <{BASE}{_py_enc_iri(raw)}> ."
        assert line == want, raw
    lit_lines = rdf.format_ntriples(edges, base=BASE, obj_is_literal=True)
    back = rdf.parse_ntriples(lit_lines)
    got = [
        (r["subj"], r["obj"])
        for r in back.select(
            rdf.strip_base(F.col("subj"), BASE).alias("subj"), "obj"
        ).collect()
    ]
    assert sorted(got) == sorted((n, n) for n in nasty)
