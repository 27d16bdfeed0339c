"""Edge-case tests for text operators (oracle parity is covered by
tools/check_correctness.py; these target corpus shapes the sf testdata
doesn't contain)."""

import os

import pandas as pd
import pytest

from kafka_connect_storage_cloud_formats_spark.operators.text import doc_bigram_novelty


@pytest.fixture(scope="module")
def short_doc_sf_dir(tmp_path_factory):
    """A documents table containing 0/1-token docs alongside normal ones —
    the corpus shape where an unguarded sequence(1, size-1) runs DESCENDING
    ([1, 0]) and crashes slice(w, 0, ·) at runtime."""
    d = tmp_path_factory.mktemp("short_docs")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["single", "two tokens", "three word doc", "two tokens"],
            "lang": ["en"] * 4,
            "source": ["web"] * 4,
            "n_chars": [6, 10, 14, 10],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_bigram_novelty_survives_single_token_docs(spark, short_doc_sf_dir):
    rows = {
        r["doc_id"]: r.asDict()
        for r in doc_bigram_novelty(spark, short_doc_sf_dir).collect()
    }
    # the 1-token doc emits no bigrams → absent from the per-doc aggregate,
    # exactly like the oracle's range(1, 1)
    assert 1 not in rows
    # "two tokens" appears twice → its single bigram has corpus freq 2
    assert rows[2] == {
        "doc_id": 2,
        "n_bigrams": 1,
        "sum_freq": 2,
        "min_freq": 2,
        "n_rare": 0,
    }
    assert rows[4]["sum_freq"] == 2
    # the unique 3-word doc has 2 bigrams, both corpus-unique
    assert rows[3]["n_bigrams"] == 2
    assert rows[3]["n_rare"] == 2


@pytest.fixture(scope="module")
def repetitive_sf_dir(tmp_path_factory):
    """Docs with KNOWN bigram repetition structure for the Gopher-style
    repetition signals (hand-computable, unlike the word-soup corpus)."""
    d = tmp_path_factory.mktemp("repetitive_docs")
    texts = {
        1: "a b a b a b",  # bigrams: (a b)x3, (b a)x2 — all duplicated
        2: "x y z",  # 2 bigrams, both unique within the doc
        3: "single",  # <2 tokens: no bigram rows, absent from the result
        4: "p q p q r",  # (p q)x2, (q p)x1, (q r)x1
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en", "es", "en", "de"],
            "source": ["web"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_doc_repetition_stats_hand_computed(spark, repetitive_sf_dir):
    from kafka_connect_storage_cloud_formats_spark.operators.text import doc_repetition_stats

    rows = {
        r["doc_id"]: r.asDict()
        for r in doc_repetition_stats(spark, repetitive_sf_dir).collect()
    }
    assert 3 not in rows  # sub-bigram doc emits nothing (oracle's empty range)
    assert rows[1] == {
        "doc_id": 1,
        "lang": "en",
        "n_bigram_occ": 5,
        "n_distinct_bigrams": 2,
        "top_bigram_count": 3,
        "top_bigram_frac": 0.6,
        "dup_bigram_occ": 5,
        "dup_bigram_frac": 1.0,
    }
    assert rows[2]["dup_bigram_occ"] == 0 and rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == 0.5
    assert rows[4] == {
        "doc_id": 4,
        "lang": "de",
        "n_bigram_occ": 4,
        "n_distinct_bigrams": 3,
        "top_bigram_count": 2,
        "top_bigram_frac": 0.5,
        "dup_bigram_occ": 2,
        "dup_bigram_frac": 0.5,
    }


@pytest.fixture(scope="module")
def contamination_sf_dir(tmp_path_factory):
    """Corpus + benchmark (source=src0) slice with hand-known 5-gram
    overlap for the decontamination pricing row."""
    d = tmp_path_factory.mktemp("contamination_docs")
    rows = [
        # (doc_id, text, lang, source)
        (1, "a b c d e f", "en", "src0"),  # benchmark: grams abcde, bcdef
        (10, "a b c d e x y", "en", "src1"),  # shares "a b c d e" → dropped
        (11, "z z z z z z", "en", "src1"),  # own grams only → kept (6 tokens)
        (12, "q r s t", "es", "src2"),  # sub-shingle length → kept (4 tokens)
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def test_benchmark_decontaminate_hand_computed(spark, contamination_sf_dir):
    from kafka_connect_storage_cloud_formats_spark.operators.text import benchmark_decontaminate

    rows = {
        r["lang"]: r.asDict()
        for r in benchmark_decontaminate(spark, contamination_sf_dir).collect()
    }
    # benchmark doc itself (src0) is excluded from the corpus side entirely
    assert rows["en"] == {
        "lang": "en",
        "n_corpus_docs": 2,
        "n_contaminated": 1,
        "n_kept": 1,
        "kept_tokens": 6,
    }
    assert rows["es"] == {
        "lang": "es",
        "n_corpus_docs": 1,
        "n_contaminated": 0,
        "n_kept": 1,
        "kept_tokens": 4,
    }


def test_word_shingles_short_documents_yield_empty(spark):
    """Documents with fewer than n tokens produce the EMPTY shingle array —
    the old clamped sequence bound produced a descending [1, 0] index and
    slice(w, 0, n) crashed the whole job at runtime."""
    from pyspark.sql import functions as F

    from kafka_connect_storage_cloud_formats_spark.functions.text_functions import word_shingles

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("a b c d",), (None,)], "text string"
    )
    got = [r["s"] for r in df.select(word_shingles("text", 3).alias("s")).collect()]
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[3] == ["a b c", "b c d"]
    # NULL text propagates NULL (not []) — matches what any SQL oracle
    # renders for NULL input (round-4 ADVICE; the corpus has no NULL text,
    # so registered-query results are unchanged)
    assert got[4] is None


def test_word_shingles_matches_python_reference(spark):
    """word_shingles vs an independent Python reference over adversarial
    inputs: NULL, empty, multi-space (empty tokens count), unicode,
    duplicate shingles (distinct-ness), exactly-n tokens. Guards the
    sequence/slice/when machinery and this round's NULL-propagation fix."""
    from kafka_connect_storage_cloud_formats_spark.functions.text_functions import word_shingles

    texts = [
        None,
        "",
        " ",            # two empty tokens
        "a  b c",       # empty token mid-stream ('a','','b','c')
        "α β γ δ",      # non-ascii
        "x y z",        # exactly n tokens
        "p q",          # n-1 tokens
        "r s t r s t r s t",  # repeated shingles collapse
    ]

    def py_shingles(text, n=3):
        if text is None:
            return None
        w = text.split(" ")
        seen, out = set(), []
        for i in range(max(len(w) - n + 1, 0)):
            s = " ".join(w[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", word_shingles("text", 3).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_shingles(t), f"input {t!r}"
