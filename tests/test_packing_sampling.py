"""Sequence packing (operators/packing.py) and deterministic
stratified sampling (operators/sampling.py) — round 5."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from transformio_spark.operators.packing import pack_sequences
from transformio_spark.operators.sampling import (
    SAMPLE_DENOM,
    sample_col,
    stratified_sample,
    threshold,
)


def _toy_docs(spark, n=97, id_stride=7):
    """Sparse, shuffled ids with varying token counts (deterministic)."""
    rows = [
        (i * id_stride + (i % 3), (i * 37) % 211 + 1) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def test_pack_matches_sequential_prefix_sum(spark):
    """The two-level decomposition equals the single-threaded running
    sum exactly, for several range counts (incl. n_ranges=1, the
    degenerate sequential case)."""
    docs = _toy_docs(spark)
    rows = sorted(
        ((r.doc_id, r.n_tokens) for r in docs.collect())
    )
    expected = {}
    start = 0
    for doc_id, tok in rows:
        expected[doc_id] = start
        start += tok
    for n_ranges in (1, 4, 64):
        packed = {
            r.doc_id: (r.token_start, r.seq_bin, r.seq_offset)
            for r in pack_sequences(docs, 256, n_ranges=n_ranges).collect()
        }
        assert len(packed) == len(expected)
        for doc_id, exp_start in expected.items():
            got_start, got_bin, got_off = packed[doc_id]
            assert got_start == exp_start
            assert got_bin == exp_start // 256
            assert got_off == exp_start % 256


def test_pack_repartition_invariant(spark):
    docs = _toy_docs(spark)
    a = sorted(
        (r.doc_id, r.token_start)
        for r in pack_sequences(docs, 128).collect()
    )
    b = sorted(
        (r.doc_id, r.token_start)
        for r in pack_sequences(docs.repartition(13), 128).collect()
    )
    assert a == b


def test_pack_oversized_doc_spans_bins(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 10)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_sequences(docs, 256).collect()}
    assert out[1].seq_bin == 0 and out[1].seq_offset == 0
    assert out[2].token_start == 100          # starts in bin 0 at offset 100
    assert out[2].seq_bin == 0
    assert out[3].token_start == 5100         # after the straddling doc
    assert out[3].seq_bin == 5100 // 256


def test_pack_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, 64).count() == 0
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(empty, 0)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def _lang_docs(spark, n=400):
    langs = ["en", "de", "fr", "zh"]
    rows = [(i, langs[i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_matches_python_md5_reference(spark):
    """The engine's keep set equals the plain-Python md5 rule."""
    rates = {"en": 0.5, "de": 0.25, "zh": 1.0}  # fr absent -> dropped
    docs = _lang_docs(spark)
    kept = {
        r.doc_id for r in stratified_sample(docs, rates).collect()
    }
    expected = set()
    langs = ["en", "de", "fr", "zh"]
    for i in range(400):
        lang = langs[i % 4]
        if lang not in rates:
            continue
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        if u < threshold(rates[lang]):
            expected.add(i)
    assert kept == expected
    assert not any(i % 4 == 2 for i in kept)  # no fr rows


def test_sample_rate_edges_and_invariance(spark):
    docs = _lang_docs(spark)
    # rate 1.0 keeps every row of the stratum
    all_zh = stratified_sample(docs, {"zh": 1.0}).count()
    assert all_zh == 100
    # repartition-invariant (Spark's .sample is not)
    a = {r.doc_id for r in stratified_sample(docs, {"en": 0.3}).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(17), {"en": 0.3}).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="rate"):
        threshold(1.5)
    assert threshold(1.0) == SAMPLE_DENOM


def test_sample_is_narrow_no_shuffle(spark):
    """The keep decision is a pure Column filter: no Exchange, no
    Python in the plan."""
    docs = _lang_docs(spark)
    plan = (
        docs.where(sample_col("doc_id", "lang", {"en": 0.5}))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pack_plan_has_no_global_window(spark):
    """The packing window partitions by range — the plan must not
    contain a partition-less (global) Window sort."""
    docs = _toy_docs(spark)
    plan = (
        pack_sequences(docs, 256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    # a global window would show 'Window [...] , [_we' with no
    # partition spec; ours always carries the _range_id partition
    assert "_range_id" in plan


# ---------------------------------------------------------------------------
# decontamination + repetition (round 5)
# ---------------------------------------------------------------------------

def test_ngram_overlap_semantics_and_plan(spark):
    from transformio_spark.operators.decontam import ngram_overlap

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),       # shares 'the quick brown'
            (2, "entirely different words here now"),
            (3, "quick brown fox of doom"),          # shares 'quick brown fox'
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_overlap for r in ngram_overlap(docs, ev, 3).collect()}
    # doc 1 shares trigrams 'the quick brown' + 'quick brown fox';
    # doc 3 shares 'quick brown fox'; doc 2 is clean (absent)
    assert out == {1: 2, 3: 1}
    plan = (
        ngram_overlap(docs, ev, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_repetition_ratio_values(spark):
    from transformio_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 trigrams, 3 distinct -> 4/7
            (2, "all words unique in this text"),
            (3, "x y"),                 # shorter than n -> ratio 0
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.rep
        for r in df.select(
            "doc_id", repetition_ratio(F.col("text"), 3).alias("rep")
        ).collect()
    }
    assert out[1] == pytest.approx(1.0 - 3.0 / 7.0)
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_doc_chunk_windows_match_python_reference():
    """Chunker boundary semantics (third formulation): the DuckDB
    twin's generate_series + list_slice windows equal a hand-written
    Python chunker on edge cases — doc shorter than the window, length
    an exact multiple of the stride, single-token docs, and the
    overlap region appearing in consecutive chunks."""
    import duckdb

    from transformio_spark.plans.queries import CHUNK_S, CHUNK_W

    docs = [
        "one",                                  # shorter than window
        " ".join(f"t{i}" for i in range(CHUNK_W)),       # exactly one window
        " ".join(f"t{i}" for i in range(CHUNK_S * 3)),   # exact stride multiple
        " ".join(f"t{i}" for i in range(CHUNK_W + 1)),   # one past the window
        " ".join(f"t{i}" for i in range(200)),           # many chunks
    ]

    def py_chunks(text):
        toks = [t for t in text.split(" ") if t]
        starts = range(0, max(len(toks) - 1, 0) + 1, CHUNK_S)
        return [" ".join(toks[st : st + CHUNK_W]) for st in starts]

    con = duckdb.connect()
    con.execute("CREATE TABLE d (i int, text varchar)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(docs)))
    rows = con.execute(
        f"""
        WITH t AS (SELECT i,
               list_filter(string_split_regex(text, ' +'), x -> x <> '') AS toks
               FROM d),
        s AS (SELECT i, toks,
              unnest(generate_series(0, greatest(len(toks) - 1, 0), {CHUNK_S}))
                  AS st
              FROM t)
        SELECT i, st,
               array_to_string(list_slice(toks, st + 1, st + {CHUNK_W}), ' ')
        FROM s ORDER BY i, st
        """
    ).fetchall()
    got = {}
    for i, _, chunk in rows:
        got.setdefault(i, []).append(chunk)
    for i, text in enumerate(docs):
        assert got[i] == py_chunks(text), (i, got[i], py_chunks(text))
    # overlap property: consecutive chunks of the long doc share
    # exactly W - S tokens
    long_chunks = [c.split(" ") for c in got[4]]
    for a, b in zip(long_chunks, long_chunks[1:]):
        if len(b) == CHUNK_W:
            assert a[CHUNK_S:] == b[: CHUNK_W - CHUNK_S]
