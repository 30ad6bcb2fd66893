"""Mojibake repair: python-reference parity, both artifact flavours
(latin-1 byte and cp1252 glyph), guard paths (legit accents, non-latin,
ASCII), and the repair-inverts-corruption property."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_vector_tile_spark.functions.text import (
    _CP1252_BYTES,
    _CP1252_GLYPHS,
    _MOJI_MARK_RE,
    fix_mojibake,
)

_B2G = {ord(b): g for g, b in zip(_CP1252_GLYPHS, _CP1252_BYTES)}
_G2B = {ord(g): b for g, b in zip(_CP1252_GLYPHS, _CP1252_BYTES)}


def _moji_latin1(clean: str) -> str:
    return clean.encode("utf-8").decode("latin-1")


def _moji_cp1252(clean: str) -> str:
    # sloppy cp1252: defined bytes render as glyphs, undefined stay controls
    return "".join(_B2G.get(b, chr(b)) for b in clean.encode("utf-8"))


def _ref(s: str, min_marks: int = 1):
    marks = len(re.findall(_MOJI_MARK_RE, s))
    norm = s.translate(_G2B)
    if any(ord(c) > 0xFF for c in norm):
        return (marks, False, s)
    try:
        rep = bytes(ord(c) for c in norm).decode("utf-8")
    except UnicodeDecodeError:
        return (marks, False, s)
    if marks >= min_marks and len(rep) < len(s):
        return (marks, True, rep)
    return (marks, False, s)


def _run(spark, texts):
    df = spark.createDataFrame(list(texts.items()), ["id", "t"])
    out = df.select("id", fix_mojibake(F.col("t")).alias("m")).select("id", "m.*")
    return {
        r["id"]: (r["n_marks"], r["repaired"], r["text_fixed"])
        for r in out.collect()
    }


CLEAN = [
    "café au lait",
    "naïve résumé",
    "“quoted” text — with dash",
    "price €5 ’tis fine",
    "mañana À bientôt",
]


def test_latin1_flavour_repairs_to_clean(spark):
    got = _run(spark, {i: _moji_latin1(c) for i, c in enumerate(CLEAN)})
    for i, c in enumerate(CLEAN):
        n, rep, fixed = got[i]
        assert rep and fixed == c and n >= 1, (i, got[i])


def test_cp1252_flavour_repairs_to_clean(spark):
    got = _run(spark, {i: _moji_cp1252(c) for i, c in enumerate(CLEAN)})
    for i, c in enumerate(CLEAN):
        n, rep, fixed = got[i]
        assert rep and fixed == c, (i, got[i])


def test_guards_keep_text_verbatim(spark):
    texts = {
        0: "plain ascii only",
        1: "déjà vu legit accents",  # utf8-invalid as latin1 bytes
        2: "中文 text with Ã© mark",  # non-latinable
        3: "Â¿mixedÃQ",  # mark present but decode fails
    }
    got = _run(spark, texts)
    for i, t in texts.items():
        n, rep, fixed = got[i]
        assert not rep and fixed == t, (i, got[i])
    assert got[0][0] == 0
    assert got[2][0] >= 1 and got[3][0] >= 1


def test_matches_reference_randomized(spark):
    rng = np.random.default_rng(31)
    words = "alpha beta gamma delta".split()
    specials = list("éñ“”—€’è")
    texts = {}
    for i in range(60):
        parts = []
        for _ in range(int(rng.integers(2, 8))):
            parts.append(
                str(rng.choice(specials))
                if rng.random() < 0.4
                else str(rng.choice(words))
            )
        clean = " ".join(parts)
        r = rng.random()
        if r < 0.4:
            texts[i] = _moji_latin1(clean)
        elif r < 0.8:
            texts[i] = _moji_cp1252(clean)
        else:
            texts[i] = clean
    got = _run(spark, texts)
    for i, t in texts.items():
        assert got[i] == _ref(t), (i, t)


def test_repair_inverts_corruption_property(spark):
    # any clean string with at least one multi-byte char: fix(moji(x)) == x
    rng = np.random.default_rng(7)
    cleans = [
        "wé " + "".join(rng.choice(list("abc éü—"), 12))
        for _ in range(20)
    ]
    got = _run(spark, {i: _moji_latin1(c) for i, c in enumerate(cleans)})
    for i, c in enumerate(cleans):
        assert got[i][2] == c, (i, c)


def test_repaired_output_is_fixed_point(spark):
    once = _run(spark, {0: _moji_latin1(CLEAN[0])})[0][2]
    twice = _run(spark, {0: once})[0]
    assert not twice[1] and twice[2] == once


def test_validation(spark):
    with pytest.raises(ValueError):
        fix_mojibake(F.lit("x"), min_marks=0)
