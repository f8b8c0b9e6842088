"""Corpus-cleansing properties (corpus/cleanse_q.py) — planted-span,
temperature-rate closed form, and decontamination recall, checked
directly (oracle parity is covered by the corpus gate plus the
null/unicode/empty fuzz gates in test_fuzz_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.cleanse_q import (
    DECON_K,
    SPAN_K,
    duplicated_spans,
)
from us_weather_energy_analysis_pipeline_spark.corpus.registry import REGISTRY
from us_weather_energy_analysis_pipeline_spark.session import local_df


def _spans(spark, docs):
    df = local_df(spark, docs, "doc_id long, text string")
    return {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_shared_run_is_one_exact_span(spark):
    """A run of L ≥ K tokens shared verbatim by two documents surfaces as
    exactly ONE span per document, covering exactly the run (grams
    straddling the run boundary mix in per-document-unique tokens, so
    they never duplicate)."""
    run = _words("shared", 20)
    pre_a, suf_a = _words("a", 7), _words("aa", 5)
    pre_b, suf_b = _words("b", 3), _words("bb", 9)
    docs = [(1, f"{pre_a} {run} {suf_a}"), (2, f"{pre_b} {run} {suf_b}")]
    got = _spans(spark, docs)
    # doc 1: run occupies 1-based token positions 8..27; doc 2: 4..23
    assert got == {(1, 8, 27), (2, 4, 23)}


def test_separated_runs_stay_separate_islands(spark):
    """Two shared runs separated by unique filler merge into two distinct
    spans, not one (island merge only bridges overlap/adjacency)."""
    run1, run2 = _words("x", SPAN_K * 2), _words("y", SPAN_K * 2)
    docs = [
        (1, f"{run1} {_words('a', 5)} {run2}"),
        (2, f"{run1} {_words('b', 5)} {run2}"),
    ]
    got = _spans(spark, docs)
    assert len([s for s in got if s[0] == 1]) == 2
    assert len([s for s in got if s[0] == 2]) == 2


def test_within_document_repeat_not_cross_doc_duplicate(spark):
    """A document repeating ITS OWN k-gram is not cross-document
    duplication — the dup test is min(doc) ≠ max(doc)."""
    run = _words("self", SPAN_K)
    docs = [(1, f"{run} {_words('mid', 4)} {run}"), (2, _words("other", 30))]
    assert _spans(spark, docs) == set()


def _write_documents(spark, tmp_path, rows):
    sf = str(tmp_path)
    df = local_df(spark, rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_temperature_rates_closed_form(spark, tmp_path):
    """Planted lang counts 64/16/4 with α=0.5, frac=0.5: √n = 8/4/2,
    budget = 42, so rates are exactly 0.375 / 0.75 / min(1, 1.5)=1.0 —
    all exactly representable doubles, so the audit table's 4-dp rates
    must match bit-for-bit, and the saturated language keeps every doc."""
    rows = []
    i = 0
    for lang, n in (("en", 64), ("de", 16), ("fr", 4)):
        for _ in range(n):
            rows.append((i, _words(f"w{i}x", 12), lang, "srcT"))
            i += 1
    sf = _write_documents(spark, tmp_path, rows)
    out = {
        r["lang"]: r
        for r in REGISTRY["corpus_temperature_resample"].spark_fn(spark, sf).collect()
    }
    assert out["en"]["sample_rate"] == 0.375
    assert out["de"]["sample_rate"] == 0.75
    assert out["fr"]["sample_rate"] == 1.0
    assert out["fr"]["n_kept"] == 4 and out["fr"]["achieved_rate"] == 1.0
    for lang, n in (("en", 64), ("de", 16)):
        assert 0 <= out[lang]["n_kept"] <= n
    # low-resource languages are up-weighted: rates monotone in 1/n
    assert out["fr"]["sample_rate"] >= out["de"]["sample_rate"] >= out["en"]["sample_rate"]


def test_decontamination_catches_embedded_eval_gram(spark, tmp_path):
    """A training doc embedding one eval k-gram is flagged with
    n_shared=1; a full eval copy of L tokens shares L−K+1 grams; a clean
    doc is absent."""
    eval_text = _words("ev", DECON_K + 4)  # 12 tokens → 5 grams
    ev_toks = eval_text.split(" ")
    embedded = " ".join(ev_toks[:DECON_K])  # exactly one eval gram
    rows = [
        (0, eval_text, "en", "src0"),
        (1, f"{_words('t1', 6)} {embedded} {_words('t1b', 6)}", "en", "srcA"),
        (2, eval_text, "en", "srcB"),  # verbatim eval copy
        (3, _words("clean", 30), "en", "srcA"),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["source"], r["n_shared"])
        for r in REGISTRY["decontaminate_ngram_overlap"].spark_fn(spark, sf).collect()
    }
    assert got == {1: ("srcA", 1), 2: ("srcB", 5)}


def test_bloom_prefilter_variant_identical_and_broadcast_joined(spark, tmp_path):
    """The Bloom pre-filter twin returns exactly the overlap variant's
    rows (false positives removed by the exact join), and its exact join
    is the deliberate BROADCAST shape (r15, VERDICT r14 item 4): the
    eval gram set is small by the operator's own sizing contract, so
    the survivors stream must NOT pay a shuffle on gh."""
    eval_text = _words("ev", DECON_K + 4)
    ev_toks = eval_text.split(" ")
    embedded = " ".join(ev_toks[:DECON_K])
    rows = [
        (0, eval_text, "en", "src0"),
        (1, f"{_words('t1', 6)} {embedded} {_words('t1b', 6)}", "en", "srcA"),
        (2, eval_text, "en", "srcB"),
        (3, _words("clean", 30), "en", "srcA"),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    base = REGISTRY["decontaminate_ngram_overlap"].spark_fn(spark, sf)
    bloom = REGISTRY["decontaminate_bloom_prefilter"].spark_fn(spark, sf)
    assert base.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(base).count() == 0
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_span_dup_ratio_flags_mostly_duplicated_doc(spark, tmp_path):
    """Coverage accounting: a doc whose text is ~all shared flags
    drop_flag=1; a doc with a minority shared span does not; the integer
    comparison (dup·2 ≥ n) is exact."""
    run = _words("dup", 24)
    rows = [
        (1, run, "en", "s1"),  # 24/24 covered → flag
        (2, f"{run} {_words('u', 30)}", "en", "s2"),  # 24/54 → no flag
        (3, _words("solo", 40), "en", "s3"),  # no dup grams → absent
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r
        for r in REGISTRY["doc_span_dup_ratio"].spark_fn(spark, sf).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["drop_flag"] == 1 and got[1]["dup_ratio"] == 1.0
    assert got[2]["drop_flag"] == 0 and got[2]["dup_tokens"] == 24
    assert got[2]["n_tokens"] == 54
