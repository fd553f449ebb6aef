"""In-engine BPE merge training (text/bpe.py): pure-python reference
replay on a random corpus, the planted analytic sequence, the greedy
left-to-right overlap rule, and the non-increasing-count property."""

from __future__ import annotations

import random
import re

import pytest

from meerkat_spark.text.bpe import train_bpe

SF = "/root/testdata/sf0.001"


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference implementation: dict-based BPE with the same
    deterministic tie-break (count desc, left asc, right asc)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, f in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        new_vocab: dict[tuple, int] = {}
        for toks, f in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def test_matches_python_reference_on_random_corpus(spark):
    rng = random.Random(13)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 7)))
        for _ in range(60)
    ]
    rows = [(" ".join(rng.sample(words, rng.randrange(1, 8))),) for _ in range(40)]
    df = spark.createDataFrame(rows, "text string")
    got = train_bpe(df, n_merges=8)

    freqs: dict[str, int] = {}
    for (s,) in rows:
        for w in re.split(r"\W+", s.lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    want = _py_bpe(freqs, 8)
    assert got == want


def test_greedy_left_overlap_rule(spark):
    """'aaa' with merge (a,a): greedy-left fuses the FIRST pair only ->
    [aa, a]; so the second merge must be (aa, a), not (a, aa)."""
    df = spark.createDataFrame([("aaa",)] * 3, "text string")
    merges = train_bpe(df, n_merges=2)
    assert merges[0][1:3] == ("a", "a")
    assert merges[1][1:3] == ("aa", "a")


def test_counts_nonincreasing_on_real_corpus(spark):
    """Merge-pair counts never increase along the sequence: a pair
    created by merge k occurs at most count(merge k) times, and all
    other counts are unchanged or reduced by the rewrite."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    merges = train_bpe(docs.select("text"), n_merges=6)
    assert len(merges) == 6
    counts = [c for _, _, _, c in merges]
    assert counts == sorted(counts, reverse=True)
    ranks = [r for r, _, _, _ in merges]
    assert ranks == [1, 2, 3, 4, 5, 6]


def test_early_stop_when_saturated(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    merges = train_bpe(df, n_merges=10)
    # one merge fuses the whole vocab into single tokens -> no pairs left
    assert [m[1:3] for m in merges] == [("a", "b")]


@pytest.mark.parametrize("word,freq,first", [("xyxy", 5, ("x", "y"))])
def test_single_word_first_merge(spark, word, freq, first):
    df = spark.createDataFrame([(word,)] * freq, "text string")
    merges = train_bpe(df, n_merges=1)
    assert merges[0][1:3] == first and merges[0][3] == 2 * freq


def test_apply_bpe_matches_reference_encode(spark):
    """Encode with trained merges == the reference greedy rank-order
    encode, including unseen words."""
    from meerkat_spark.text.bpe import apply_bpe

    corpus = spark.createDataFrame(
        [("abab",)] * 8 + [("abc",)] * 4 + [("bc",)] * 2, "text string"
    )
    merges = train_bpe(corpus, n_merges=4)
    assert [(m[1], m[2]) for m in merges] == [
        ("a", "b"), ("ab", "ab"), ("ab", "c"), ("b", "c")
    ]
    words = spark.createDataFrame(
        [("abab abcb",), ("bab",), ("cab",)], "text string"
    )
    got = {r.text: list(r.bpe_tokens) for r in apply_bpe(words, merges).collect()}
    assert got == {
        "abab abcb": ["abab", "abc", "b"],  # multi-word rows flatten in order
        "bab": ["b", "ab"],
        "cab": ["c", "ab"],
    }
