"""Trained BPE tokenizer (operators/bpe.py): merge learning, apply
semantics, and the distributed dictionary-trick count vs a local replay."""

from __future__ import annotations

import pytest

from vtb_datafusion_2023_spark.operators.bpe import (
    SEED_MERGES,
    bpe_apply_word,
    bpe_token_count,
    bpe_train,
    bpe_train_from_counts,
)


def test_train_classic_example_deterministic():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_from_counts(counts, 4)
    # ('e','s') and ('s','t') both appear 9 times; ties break to the
    # lexicographically smallest pair, then the merged pair chains
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges == bpe_train_from_counts(dict(reversed(list(counts.items()))), 4)


def test_apply_merges_greedy_left_to_right():
    merges = [("a", "a")]
    assert bpe_apply_word("aaa", merges) == ["aa", "a"]
    assert bpe_apply_word("aaaa", merges) == ["aa", "aa"]
    merges2 = [("a", "a"), ("aa", "aa")]
    assert bpe_apply_word("aaaa", merges2) == ["aaaa"]


def test_more_merges_never_increase_tokens():
    words = ["the", "weather", "brightened", "considerably", "towards"]
    for w in words:
        prev = len(w)
        for k in (10, 50, 100):
            n = len(bpe_apply_word(w, SEED_MERGES[:k]))
            assert n <= prev
            prev = n
        assert sum(len(t) for t in bpe_apply_word(w, SEED_MERGES)) == len(w)


def test_train_on_corpus_partition_invariant(spark, sf_small):
    from vtb_datafusion_2023_spark.sources.readers import load_table

    docs = load_table(spark, sf_small, "documents")
    a = bpe_train(docs, n_merges=30, max_sample=200)
    b = bpe_train(docs.repartition(13), n_merges=30, max_sample=200)
    assert a == b and len(a) == 30


def test_token_count_matches_local_replay(spark, sf_small):
    from vtb_datafusion_2023_spark.sources.readers import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {
        r.doc_id: r.n
        for r in bpe_token_count(docs, out_col="n").collect()
    }
    for r in docs.select("doc_id", "text").limit(50).collect():
        want = sum(
            len(bpe_apply_word(w, SEED_MERGES))
            for w in (r.text or "").lower().split(" ")
            if w
        )
        assert got[r.doc_id] == want
