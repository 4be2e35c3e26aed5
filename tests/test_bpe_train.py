"""BPE merge learning (operators/bpe.py bpe_train) vs a pure-Python
Sennrich et al. (2016) reference implementation."""

import collections

import pytest

from navigator_document_parser_spark.operators.bpe import bpe_train


def _py_bpe(texts, num_merges):
    """Reference trainer: dict-of-tuples vocab, greedy merge."""
    import re

    vocab = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            vocab[tuple(w)] += 1
    merges = []
    for r in range(num_merges):
        pairs = collections.Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, rr), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, l, rr, l + rr, c))
        new_vocab = collections.Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == rr
                ):
                    out.append(l + rr)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest wide wide new",
    "lowest newest wider lower low low newest",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["merge_round"], r["lsym"], r["rsym"], r["merged"],
         r["pair_count"])
        for r in bpe_train(df, num_merges=6)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == _py_bpe(CORPUS, 6)


def test_bpe_train_overlapping_runs_greedy_left(spark):
    # "aaaa" must merge to (aa)(aa), not (aa)a a — greedy left-to-right
    df = spark.createDataFrame(
        [("aaaa aaaa aaa",)], "text string"
    )
    got = [
        (r["merge_round"], r["lsym"], r["rsym"], r["merged"],
         r["pair_count"])
        for r in bpe_train(df, num_merges=2)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == _py_bpe(["aaaa aaaa aaa"], 2)
    # round 1 must be (aa, aa) -> aaaa: only greedy-left application of
    # round 0 yields adjacent (aa)(aa) inside "aaaa"
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_bpe_train_exhausts_small_corpus(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    rows = bpe_train(df, num_merges=10).collect()
    # only one merge is learnable: (a,b); trainer stops early
    assert len(rows) == 1
    assert (rows[0]["lsym"], rows[0]["rsym"]) == ("a", "b")


def test_bpe_train_rejects_bad_params(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=0)
