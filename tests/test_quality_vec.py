"""Bit-identical equality between the scalar oracle (core.quality /
core.entities) and the vectorized NumPy implementation
(operators.quality_vec) over the full fixture domain + adversarial cases.
"""

from __future__ import annotations

import pandas as pd

from documentai_spark.core.entities import completeness_from_text
from documentai_spark.core.extract import extract_turn
from documentai_spark.core.quality import (
    blank_score, brightness_score, contrast_score, edge_crop_score,
    legibility_score, noise_score, resolution_score, shadow_glare_score,
    skew_score,
)
from documentai_spark.operators.quality_vec import (
    blank_scores, brightness_scores, completeness_scores, contrast_scores,
    edge_crop_scores, legibility_scores, noise_scores, resolution_scores,
    shadow_glare_scores, skew_scores,
)
from documentai_spark.sources.transcripts import gen_rows

ADVERSARIAL = [
    "", "   ", " \n\t \n ", "x", "ok", "a" * 200, " a  b   c ",
    "\x00\x01\x02 control", "ALLCAPS TOKENS ONLY", "123 456 789",
    "w" * 25 + " short", "PO NUMBER PO-1 DATED 01.01.2024 USD 5,000.00 FOB",
    "token " * 50000,  # mega turn
    "no\nnewlines\nhandled\n\nblocks",
    # r3 metric stressors (skew/edge_crop/shadow_glare/resolution inputs)
    "\n".join(" " * (i * 3) + "drifting line of text" for i in range(9)),
    " " * 30 + "tiny island" + " " * 30,
    "w" * 80 + " " * 12 + "y" * 45 + "\nnormal line follows here",
    ("   indented mega\n" + " " * 7 + "line\n") * 20000,  # mega + indents
]


def _texts():
    texts = list(ADVERSARIAL)
    for r in gen_rows(42, 40, mega_every=0):
        texts.append(r["text"])
        texts.append(extract_turn(r["text"])[1])
    return texts


def test_blank_bit_identical():
    texts = _texts()
    vec = blank_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == blank_score(t), (i, repr(t[:60]))


def test_legibility_bit_identical():
    texts = _texts()
    vec = legibility_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == legibility_score(t), (i, repr(t[:60]))


def test_completeness_bit_identical():
    texts = _texts()
    vec = completeness_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == completeness_from_text(t), (i, repr(t[:60]))


def test_noise_bit_identical():
    texts = _texts()
    vec = noise_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == noise_score(t), (i, repr(t[:60]))


def test_contrast_bit_identical():
    texts = _texts()
    vec = contrast_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == contrast_score(t), (i, repr(t[:60]))


def test_brightness_bit_identical():
    texts = _texts()
    vec = brightness_scores(pd.Series(texts))
    for i, t in enumerate(texts):
        assert vec[i] == brightness_score(t), (i, repr(t[:60]))


def test_round3_metrics_bit_identical():
    texts = _texts() + [
        "    indented\n        more\n            most\nflat",
        " " * 40 + "cropped" + " " * 40,
        "x" * 80 + " " * 30 + "tail",
        "\n".join(["w" * 66] * 4),
        "  \n \n  mixed \n" + " " * 12 + "deep indent line here",
    ]
    s = pd.Series(texts)
    pairs = ((skew_scores, skew_score), (edge_crop_scores, edge_crop_score),
             (shadow_glare_scores, shadow_glare_score),
             (resolution_scores, resolution_score))
    for fv, f in pairs:
        vec = fv(s)
        for i, t in enumerate(texts):
            assert vec[i] == f(t), (fv.__name__, i, repr(t[:60]))


def test_none_handling():
    vec = blank_scores(pd.Series([None, "x"], dtype=object))
    assert vec[0] == 1.0
    assert legibility_scores(pd.Series([None], dtype=object))[0] == 0.0
    assert completeness_scores(pd.Series([None], dtype=object))[0] == 0.0


def test_fused_quality_equals_individual():
    """Count-reuse path (identity rows share _Counts) is bit-identical to
    the independent computations."""
    from documentai_spark.operators.quality_vec import fused_quality
    raws = []
    exts = []
    for r in gen_rows(42, 30, mega_every=10, mega_turns=150):
        raws.append(r["text"])
        exts.append(extract_turn(r["text"])[1])
    raw_s = pd.Series(raws, dtype=object)
    (qb, ql, qc, qsk, qn, qct, qbr, qec, qsg, qre) = \
        fused_quality(raw_s, exts)
    ext_s = pd.Series(exts, dtype=object)
    assert (qb == blank_scores(raw_s)).all()
    assert (ql == legibility_scores(ext_s)).all()
    assert (qc == completeness_scores(ext_s)).all()
    assert (qsk == skew_scores(ext_s)).all()
    assert (qn == noise_scores(ext_s)).all()
    assert (qct == contrast_scores(ext_s)).all()
    assert (qbr == brightness_scores(ext_s)).all()
    assert (qec == edge_crop_scores(ext_s)).all()
    assert (qsg == shadow_glare_scores(ext_s)).all()
    assert (qre == resolution_scores(ext_s)).all()
    # and against the scalar oracle directly
    for i, (r, e) in enumerate(zip(raws, exts)):
        assert qb[i] == blank_score(r) and ql[i] == legibility_score(e)
        assert qn[i] == noise_score(e) and qct[i] == contrast_score(e)
        assert qbr[i] == brightness_score(e)
        assert qsk[i] == skew_score(e) and qec[i] == edge_crop_score(e)
        assert qsg[i] == shadow_glare_score(e)
        assert qre[i] == resolution_score(e)
