"""Frozen bigram-LM curation scoring: core oracle units, the
operator-vs-core byte equality, and the committed-artifact freshness
pin (the data/ml_frozen contract family)."""

from __future__ import annotations

import math

import pytest

from documentai_spark.core.lm import (
    BACKOFF_COST, SCALE, UNK, score_doc, tokens, train_lm,
)


def test_tokens_pinned():
    # non-empty WS_CLASS fields of lower(text) — boundary empties
    # dropped (the shingle/ml convention, NOT textstats.token_count's
    # field-count form which keeps them)
    assert tokens("The  Fast\tkey\n") == ["the", "fast", "key"]
    assert tokens("\x0bx\x0c y\r") == ["x", "y"]
    assert tokens(None) == []
    assert tokens("") == []
    assert tokens("   ") == []
    # \x1c-\x1f are NOT separators in THIS formulation (they are in
    # ml_classify._WS_SPLIT — different pinned tokenizer): a \x1c stays
    # inside the token on every engine (RE2/Python explicit class)
    assert tokens("a\x1cb c") == ["a\x1cb", "c"]


def _tiny_model():
    # tokens: doc1 a=4 b=4, doc2 a=1 c=1, doc3 a=3 b=3 -> a=8, b=7,
    # c=1; vocab_size 2 keeps a, b; c maps to <unk>
    texts = ["a b a b a b a b", "a c", "b a b a b a"]
    return train_lm(texts, vocab_size=2, min_bigram_count=3)


def test_train_lm_tiny_hand_computed():
    m = _tiny_model()
    assert m["vocab"] == ["a", "b"]  # count desc (a=8, b=7), then word
    # mapped unigrams: a=8, b=7, <unk>=1, total=16
    assert m["unigram_cost"]["a"] == round(-math.log10(8 / 16) * SCALE)
    assert m["unigram_cost"][UNK] == round(-math.log10(1 / 16) * SCALE)
    # within-doc pairs only (no cross-doc pair): doc1 'a b'x4 'b a'x3,
    # doc2 ('a','<unk>')x1, doc3 'b a'x3 'a b'x2 -> 'a b'=6, 'b a'=6,
    # 'a <unk>'=1; min count 3 keeps the first two; p = count / count(w1)
    assert set(m["bigram_cost"]) == {"a b", "b a"}
    assert m["bigram_cost"]["a b"] == round(-math.log10(6 / 8) * SCALE)
    assert m["bigram_cost"]["b a"] == round(-math.log10(6 / 7) * SCALE)
    assert m["backoff_cost"] == BACKOFF_COST == \
        round(-math.log10(0.4) * SCALE)


def test_score_doc_all_three_paths():
    m = _tiny_model()
    # 'a b'  -> bigram LUT hit
    # 'b b'  -> not in LUT -> unigram(b) + backoff
    # 'b zz' -> zz OOV -> maps to <unk> -> unigram(<unk>) + backoff
    n, c = score_doc("a b b zz", m)
    assert n == 3
    assert c == (m["bigram_cost"]["a b"]
                 + m["unigram_cost"]["b"] + BACKOFF_COST
                 + m["unigram_cost"][UNK] + BACKOFF_COST)
    # degenerate docs: < 2 tokens -> (0, 0)
    assert score_doc(None, m) == (0, 0)
    assert score_doc("", m) == (0, 0)
    assert score_doc("a", m) == (0, 0)
    assert score_doc("\t \n", m) == (0, 0)


def test_frozen_lm_is_fresh():
    """The committed data/lm_frozen artifact must equal a live retrain
    from the frozen recipe — a stale artifact after a core/lm semantic
    change fails here, not at the driver gate."""
    from documentai_spark.operators.curation import load_lm_model
    from tools.freeze_lm_model import OUT, train

    committed = load_lm_model(OUT)
    regen = train()
    for k in ("vocab", "unigram_cost", "bigram_cost", "backoff_cost",
              "scale"):
        assert committed[k] == regen[k], \
            f"data/lm_frozen is stale on {k!r} — rerun " \
            "tools/freeze_lm_model.py"


def test_operator_matches_core_and_flags_exactly(spark):
    """with_lm_perplexity == core/lm.score_doc on every committed
    fixture doc (integer byte-equality), the round(6) mean within one
    ulp of the exact ratio, and the flag evaluated in the integer
    domain (never through the float mean)."""
    from documentai_spark.operators.curation import (
        load_lm_model, with_lm_perplexity,
    )
    from tools.freeze_lm_model import OUT

    model = load_lm_model(OUT)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(80))
    rows = {r.doc_id: r for r in
            with_lm_perplexity(docs, model, threshold=1.45).collect()}
    pdocs = docs.collect()
    assert len(rows) == len(pdocs) > 0
    thr_e4 = int(round(1.45 * model["scale"]))
    n_flagged = 0
    for d in pdocs:
        b, c = score_doc(d.text, model)
        r = rows[d.doc_id]
        assert (r.lm_bigrams, r.lm_cost) == (b, c), d.doc_id
        if b > 0:
            # round(6) moves an exact half-tie (x.xxxxxx5, e.g. doc 15's
            # 355269/24/1e4 = 1.4802875) by exactly 5e-7
            assert abs(r.lm_mean_cost - c / b / model["scale"]) <= 5.1e-7
        else:
            assert r.lm_mean_cost is None
        assert r.high_perplexity == (b > 0 and c > thr_e4 * b)
        n_flagged += int(r.high_perplexity)
    # threshold 1.45 sits inside the corpus range: both classes live
    assert 0 < n_flagged < len(pdocs)


def test_operator_reserved_collision_raises(spark):
    from documentai_spark.operators.curation import (
        load_lm_model, with_lm_perplexity,
    )
    from tools.freeze_lm_model import OUT

    model = load_lm_model(OUT)
    df = spark.createDataFrame([(1, "a b", 0)],
                               ["doc_id", "text", "lm_cost"])
    with pytest.raises(ValueError, match="lm_cost"):
        with_lm_perplexity(df, model)


def test_stateless_flags_fold_high_perplexity(spark):
    """with_stateless_flags folds high_perplexity into keep when the
    caller ran with_lm_perplexity (the streaming composition —
    streaming_curate / near_curate_finish lm_threshold=); absent, the
    schema and keep logic are unchanged."""
    from documentai_spark.operators.curation import with_stateless_flags

    good = " ".join(["the scan sort merge join order"] * 5)
    df = spark.createDataFrame(
        [(1, good, 0.9, False), (2, good, 0.9, True)],
        ["doc_id", "text", "confidence", "high_perplexity"])
    out = {r.doc_id: r for r in
           with_stateless_flags(df, min_stopword_ratio=0.0).collect()}
    assert out[1].keep
    assert not out[2].keep  # identical row except the LM flag


def test_prepare_lm_threshold_config_and_accounting(spark, tmp_path):
    """--prepare --lm-threshold: high_perplexity rides the corpus-stage
    Observation into by_reason, the threshold is part of the resume
    config (a resume with a different — or newly absent — LM filter
    refuses; an identical resume skips both stages with the same
    accounting), and lm_model/lm_threshold must be passed together."""
    import pytest as _pytest

    from documentai_spark.operators.curation import load_lm_model
    from documentai_spark.plans.checkpoint import run_prepare_stages
    from tools.freeze_lm_model import OUT

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "lm_in")
    docs.write.parquet(in_dir)
    out = str(tmp_path / "lm_out")
    model = load_lm_model(OUT)
    kw = dict(budget=120, pack_shards=4, log=lambda *_: None)

    r = run_prepare_stages(spark, in_dir, out, resume=True,
                           lm_model=model, lm_threshold=1.45, **kw)
    # 95 of the 500 sf0.001 docs sit above 1.45 digits/bigram (the
    # committed-model measurement the gate threshold was chosen from)
    assert r["by_reason"]["high_perplexity"] == 95
    assert r["kept"] <= r["rows"] - 95

    with _pytest.raises(ValueError, match="different configuration"):
        run_prepare_stages(spark, in_dir, out, resume=True,
                           lm_model=model, lm_threshold=1.5, **kw)
    with _pytest.raises(ValueError, match="different configuration"):
        run_prepare_stages(spark, in_dir, out, resume=True, **kw)
    with _pytest.raises(ValueError, match="go together"):
        run_prepare_stages(spark, in_dir, str(tmp_path / "lm_out2"),
                           lm_model=model, **kw)

    r2 = run_prepare_stages(spark, in_dir, out, resume=True,
                            lm_model=model, lm_threshold=1.45, **kw)
    assert r2["stages_skipped"] == ["corpus", "assignment"]
    assert r2["by_reason"] == r["by_reason"]
    assert r2["kept"] == r["kept"]


def test_prepare_resume_tolerates_pre_lm_manifests(spark, tmp_path):
    """A stage manifest committed BEFORE the lm_threshold config key
    existed (r8 review: the key is setdefault'd to None on read) must
    still resume for an LM-less run — otherwise every pre-r8 export is
    permanently unresumable with an unsatisfiable error."""
    import json
    import os

    from documentai_spark.plans.checkpoint import run_prepare_stages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "pl_in")
    docs.write.parquet(in_dir)
    out = str(tmp_path / "pl_out")
    kw = dict(budget=120, pack_shards=4, log=lambda *_: None)
    r1 = run_prepare_stages(spark, in_dir, out, resume=True, **kw)

    # simulate pre-r8 manifests: strip the lm_threshold key everywhere
    ckdir = os.path.join(out, "_checkpoints")
    for name in os.listdir(ckdir):
        path = os.path.join(ckdir, name)
        with open(path) as f:
            rec = json.load(f)
        if isinstance(rec.get("config"), dict):
            rec["config"].pop("lm_threshold", None)
            with open(path, "w") as f:
                json.dump(rec, f)

    r2 = run_prepare_stages(spark, in_dir, out, resume=True, **kw)
    assert r2["stages_skipped"] == ["corpus", "assignment"]
    assert r2["by_reason"] == r1["by_reason"]
