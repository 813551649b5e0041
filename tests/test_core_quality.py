"""Unit tests for quality ensembles, entities, rules (oracle core)."""

from documentai_spark.core.entities import (
    completeness_score, extract_entities, extraction_confidence,
)
from documentai_spark.core.quality import (
    blank_score, confidence_score, legibility_score, score_turn, verdict_for,
)
from documentai_spark.core.rules import (
    compile_rules, parse_english_rule, validate_entities,
)


def test_blank_score_extremes():
    assert blank_score("") == 1.0
    assert blank_score("   \n\t ") == 1.0
    long_text = "this is a perfectly normal document " * 10
    assert blank_score(long_text) < 0.3


def test_blank_hard_blocker_verdict():
    s = score_turn("   ", "", 0.0)
    assert s.verdict == "re-scan"


def test_legibility_ranges():
    assert legibility_score("") == 0.0
    good = "the quick brown fox jumps over the lazy dog near the river bank"
    assert legibility_score(good) > 0.6
    garbage = "\x00\x01\x02 ### $$$ %%% ^^^ &&& *** ((( )))"
    assert legibility_score(garbage) < legibility_score(good)


def test_verdict_thresholds():
    assert verdict_for(0.0, 0.96) == "direct analysis"
    assert verdict_for(0.0, 0.95) == "direct analysis"
    assert verdict_for(0.0, 0.85) == "pre-processing"
    assert verdict_for(0.0, 0.80) == "pre-processing"
    assert verdict_for(0.0, 0.65) == "azure document analysis"
    assert verdict_for(0.0, 0.59) == "reupload"
    assert verdict_for(0.95, 0.99) == "re-scan"  # hard blocker wins


def test_confidence_critical_flat_return():
    # legibility (blur analog) below CRITICAL_LOW returns the flat 0.55
    # (quality_config.py:57-62 returns it outright, not min())
    assert confidence_score(0.1, 1.0, 0.0, 0.0, 1.0, 1.0) == 0.55
    # noise is reverse-critical: 1-noise < 0.4 -> flat 0.55 even when the
    # weighted mean would be LOWER or higher
    assert confidence_score(0.9, 0.9, 0.0, 0.7, 0.9, 0.9) == 0.55
    # skew is reverse-critical too (quality_config.py:43-46)
    assert confidence_score(0.9, 0.9, 0.7, 0.1, 0.9, 0.9) == 0.55
    # healthy metrics -> plain weighted mean over the 12-point scheme
    assert confidence_score(0.9, 0.9, 0.0, 0.1, 0.9, 0.9) > 0.8
    assert confidence_score(1.0, 1.0, 0.0, 0.0, 1.0, 1.0) == 1.0
    # blank is excluded from confidence entirely (signature has no blank)


def test_new_metric_extremes():
    from documentai_spark.core.quality import (
        brightness_score, contrast_score, noise_score,
    )
    assert noise_score("") == 0.0
    clean = "a perfectly ordinary sentence with normal words here"
    noisy = "??? ### ~~~ ^^^ ||| \\\\ ??? mojibake #### ~~ ???"
    assert noise_score(noisy) > noise_score(clean)
    assert contrast_score("") == 0.0
    even = "\n".join(["a sensible line of roughly sixty characters in "
                      "total here ok"] * 5)
    ragged = "\n".join(["x", "a" * 300, "", "yz", "b" * 250])
    assert contrast_score(even) > contrast_score(ragged)
    assert brightness_score("") == 0.0
    normal = "The quick brown Fox jumps over the lazy dog near a river"
    caps = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR A RIVER"
    assert brightness_score(normal) > brightness_score(caps)


def test_recommendations():
    from documentai_spark.core.quality import (
        BLANK_RECOMMENDATION, recommendations_for,
    )
    # blank hard blocker -> single re-scan line
    assert recommendations_for(0.95, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0,
                               0.0, 0.0, 1.0) == [BLANK_RECOMMENDATION]
    # all excellent -> no advice
    assert recommendations_for(0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0,
                               0.0, 0.0, 1.0) == []
    # low legibility + medium contrast -> two lines, pinned order/format
    recs = recommendations_for(0.0, 0.2, 1.0, 0.0, 0.0, 0.5, 1.0,
                               0.0, 0.0, 1.0)
    assert len(recs) == 2
    assert recs[0].startswith("Legibility: ")
    assert recs[1].startswith("Contrast: ")
    # reported-only metrics advise after the weighted six (pinned order)
    recs = recommendations_for(0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0,
                               0.9, 0.9, 0.5)
    assert [x.split(":")[0] for x in recs] == \
        ["Edge crop", "Shadow glare", "Resolution"]


def test_entities():
    text = ("PO NUMBER PO-12345 DATED 09.06.2024 total USD 19,555.00 "
            "shipped FOB contact a@b.com")
    ents = extract_entities(text)
    assert ents["po_number"] == "PO-12345"
    assert ents["date_numeric"] == "09.06.2024"
    assert ents["currency"] == "USD" and ents["amount"] == "19,555.00"
    assert ents["incoterm"] == "FOB"
    assert ents["email"] == "a@b.com"
    assert completeness_score(ents) == 1.0
    assert extraction_confidence(ents) == 1.0  # capped


def test_entities_empty():
    assert extract_entities("") == {}
    assert completeness_score({}) == 0.0
    assert extraction_confidence({}) == 0.0


def test_rule_compile_and_validate():
    rules = compile_rules([
        "po_number must not be empty",
        "date_numeric must be a valid date",
        "amount must be a number",
        "currency must be one of USD, EUR or GBP",
        "amount must be greater than 1,000",
        "incoterm must equal FOB",
    ])
    assert len(rules) == 6
    ents = {"po_number": "PO-1", "date_numeric": "09.06.2024",
            "amount": "19,555.00", "currency": "USD", "incoterm": "FOB"}
    res = validate_entities(rules, ents)
    assert res["overall_valid"] and res["passed"] == 6

    res2 = validate_entities(rules, {**ents, "amount": "500"})
    assert res2["failed"] == 1 and not res2["overall_valid"]


def test_rule_grammar_misc():
    assert parse_english_rule("purchase order number must not be empty")["field"] \
        == "purchase_order_number"
    assert parse_english_rule("x must be less than 5")["type"] == "less_than"
    assert parse_english_rule("nonsense sentence") is None
    r = parse_english_rule("desc must contain widget")
    assert r["type"] == "contains"


def test_round3_metric_extremes():
    from documentai_spark.core.quality import (
        edge_crop_score, resolution_score, shadow_glare_score, skew_score,
    )
    assert skew_score("") == 0.0
    flat = "\n".join(["a normal line of text here"] * 6)
    drifty = "\n".join(" " * (i * 3) + "drifting line" for i in range(8))
    assert skew_score(drifty) > skew_score(flat)
    # invalid-image convention: empty -> max severity (reference returns
    # value 1.0 for invalid input, edge_crop_score.py:155)
    assert edge_crop_score("") == 1.0
    assert shadow_glare_score("") == 1.0
    clean = "\n".join(["a tidy line of prose that is wide enough ok"] * 5)
    cropped = " " * 40 + "tiny" + " " * 40
    assert edge_crop_score(cropped) > edge_crop_score(clean)
    glarey = "x" * 80 + " " * 30 + "y" * 60
    assert shadow_glare_score(glarey) > shadow_glare_score(clean)
    assert resolution_score("") == 0.0
    wide = "\n".join(["w" * 66] * 5)
    narrow = "\n".join(["w"] * 5)
    assert resolution_score(wide) > resolution_score(narrow)


def test_blank_zeroes_confidence():
    # verdict_for_page returns (re-scan, 0.0) on the blank hard block
    s = score_turn("   ", "", 0.0)
    assert s.verdict == "re-scan" and s.confidence == 0.0


def test_confidence_weights_are_the_live_scheme():
    """CONFIDENCE_WEIGHTS is the documented scheme; the implementations
    hardcode it for IEEE op-order pinning. Rebuild confidence generically
    from the tuple and require bit-equality so an un-mirrored weight edit
    fails here instead of silently not taking effect (r7 review)."""
    import itertools

    from documentai_spark.core.quality import (
        CONFIDENCE_W_TOTAL, CONFIDENCE_WEIGHTS, CRITICAL_CAP, CRITICAL_LOW,
    )

    assert sum(w for _, w in CONFIDENCE_WEIGHTS) == CONFIDENCE_W_TOTAL

    def generic(m):
        if (m["legibility"] < CRITICAL_LOW
                or (1.0 - m["skew"]) < CRITICAL_LOW
                or (1.0 - m["noise"]) < CRITICAL_LOW):
            return CRITICAL_CAP
        acc = 0.0
        for name, w in CONFIDENCE_WEIGHTS:
            v = (1.0 - m[name]) if name in ("skew", "noise") else m[name]
            acc = acc + v * w
        return acc / CONFIDENCE_W_TOTAL

    grid = [0.0, 0.1, 0.39, 0.4, 0.55, 0.61, 0.9, 1.0]
    names = [n for n, _ in CONFIDENCE_WEIGHTS]
    for combo in itertools.product(grid, repeat=3):
        # vary the three critical metrics fully; spot the rest on a plane
        for rest in (0.3, 0.85):
            m = dict(zip(names, [combo[0], rest, combo[1], combo[2],
                                 rest, 1.0 - rest]))
            got = confidence_score(m["legibility"], m["completeness"],
                                   m["skew"], m["noise"], m["contrast"],
                                   m["brightness"])
            assert got == generic(m), m


def test_completeness_currency_comma_only_match():
    """currency_amount's [\\d,]+ can match with ZERO digits ('USD ,a') —
    the vec pre-gate must be digit-OR-comma or it diverges from core and
    the RE2 oracle (r7 review finding, verified divergence)."""
    import numpy as np
    import pandas as pd

    from documentai_spark.core.entities import completeness_from_text
    from documentai_spark.operators.quality_vec import (
        _Counts, completeness_scores,
    )

    rows = ["USD ,a hello world",        # comma-only currency match
            "USD 1,000.50 invoice",      # normal match
            "no entities here at all",   # no match
            "EUR ,,,,x",                 # comma-only again
            ""]
    core = np.array([completeness_from_text(t) for t in rows])
    s = pd.Series(rows, dtype=object)
    vec_gated = completeness_scores(s, counts=_Counts(rows))
    vec_ungated = completeness_scores(s)
    np.testing.assert_array_equal(vec_gated, core)
    np.testing.assert_array_equal(vec_ungated, core)
    assert core[0] > 0.0 and core[3] > 0.0  # the adversarial rows match


def test_counts_empty_batch_has_all_slots():
    """k==0 _Counts must still expose lead_ws/trail_ws (empty Arrow
    batches hit edge_crop_scores; r7 review found an AttributeError)."""
    import pandas as pd

    from documentai_spark.operators.quality_vec import (
        edge_crop_scores, fused_quality,
    )

    empty = pd.Series([], dtype=object)
    assert len(edge_crop_scores(empty)) == 0
    out = fused_quality(empty, [])
    assert all(len(a) == 0 for a in out)
