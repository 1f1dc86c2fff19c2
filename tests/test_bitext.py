"""Bitext mining (ops/similarity.bitext_pairs) vs a brute-force numpy
mirror of the margin criterion, plus the hub-suppression property the
margin exists to provide."""

import numpy as np
import pytest

from naruhodo_spark.ops import similarity as SIM


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, label int, lang string"
    )


def _np_bitext(rows, k, thr):
    import itertools

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    cand = {}
    for x, y in itertools.permutations(rows, 2):
        if x[2] != y[2] or x[3] == y[3]:
            continue
        cand.setdefault(x[0], []).append((cos(x[1], y[1]), y[0]))
    avg = {
        v: float(np.mean([c for c, _ in sorted(cs, key=lambda t: (-t[0], t[1]))[:k]]))
        for v, cs in cand.items()
    }
    out = []
    for x, y in itertools.combinations(rows, 2):
        if x[2] != y[2] or x[3] == y[3]:
            continue
        if x[3] > y[3]:
            x, y = y, x
        c = cos(x[1], y[1])
        den = avg[x[0]] + avg[y[0]]
        if c <= 0 or den <= 0:   # mirror the operator's sign gates
            continue
        m = round(c / (0.5 * den), 6)
        if m >= thr:
            out.append((x[0], x[3], y[0], y[3], c, m))
    return sorted(out)


def test_bitext_matches_bruteforce(spark):
    rng = np.random.default_rng(21)
    rows = []
    # 6 "concepts": an en and a fr vector near each concept direction
    for i in range(6):
        base = rng.normal(size=4)
        base /= np.linalg.norm(base)
        for lang in ("en", "fr"):
            v = base + rng.normal(scale=0.12, size=4)
            rows.append((f"{lang}{i}", [float(x) for x in v], 0, lang))
    got = sorted(
        map(tuple, SIM.bitext_pairs(
            _emb_df(spark, rows), k=3, margin_threshold=1.02
        ).collect())
    )
    want = _np_bitext(rows, k=3, thr=1.02)
    assert got == want
    assert len(got) > 0


def test_bitext_mines_true_pairs(spark):
    """Planted translations (same direction, two langs) must be mined;
    unrelated cross-lang pairs must not."""
    rng = np.random.default_rng(8)
    rows = []
    for i in range(5):
        base = rng.normal(size=6)
        base /= np.linalg.norm(base)
        rows.append((f"en{i}", [float(x) for x in base], 0, "en"))
        v = base + rng.normal(scale=0.05, size=6)
        rows.append((f"fr{i}", [float(x) for x in v], 0, "fr"))
    mined = {
        (r["vec_a"], r["vec_b"])
        for r in SIM.bitext_pairs(
            _emb_df(spark, rows), k=2, margin_threshold=1.1
        ).collect()
    }
    for i in range(5):
        assert (f"en{i}", f"fr{i}") in mined, i
    for a, b in mined:
        assert a[2:] == b[2:]  # no cross-concept false positives


def test_bitext_same_lang_and_cells_excluded(spark):
    rows = [
        ("en0", [1.0, 0.0], 0, "en"),
        ("en1", [1.0, 0.01], 0, "en"),      # same lang: never a pair
        ("fr0", [0.99, 0.02], 1, "fr"),     # other cell: never a candidate
    ]
    assert SIM.bitext_pairs(_emb_df(spark, rows), k=2).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        SIM.bitext_pairs(_emb_df(spark, rows), k=0)


def test_bitext_negative_similarity_never_mined(spark):
    """Anti-aligned cross-language vectors have negative cosine AND
    negative neighborhoods — the ratio would 'pass' (−/− > 1) without
    the sign gates."""
    rows = [
        ("en0", [1.0, 0.0], 0, "en"),
        ("fr0", [-1.0, -0.05], 0, "fr"),
    ]
    assert SIM.bitext_pairs(_emb_df(spark, rows), k=1,
                            margin_threshold=1.05).count() == 0
