"""Round-5 session-10 operators: LSH-blocked bitext mining.

The exact bitext_margin_mine is the recall yardstick for the blocked
variant (the knn_ivf <-> knn_ivf_fullprobe pattern): near-identical
translation pairs share every hyperplane sign bucket with probability
~1, so the blocked miner must recover essentially all of the exact
miner's clear pairs; it may additionally accept pairs whose true
runner-up fell outside the block (documented approximation).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.similarity import (
    bitext_margin_mine,
    bitext_margin_mine_lsh,
)


def _det_unit(seed: str, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish vector from md5 (no RNG)."""
    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) % 2001 - 1000) / 1000.0)
    n = sum(v * v for v in vals) ** 0.5
    return [v / n for v in vals]


def _perturb(vec: list[float], seed: str, eps: float) -> list[float]:
    noise = _det_unit(seed, len(vec))
    return [v + eps * n for v, n in zip(vec, noise)]


@pytest.fixture(scope="module")
def bitext_corpus(spark):
    """40 src vectors, each with one near-identical target 'translation'
    (eps=0.05 noise) plus 40 unrelated targets."""
    dim = 16
    src_rows, tgt_rows = [], []
    for i in range(40):
        base = _det_unit(f"pair:{i}", dim)
        src_rows.append((100 + i, base))
        tgt_rows.append((i, _perturb(base, f"noise:{i}", 0.05)))
    for i in range(40, 80):
        tgt_rows.append((i, _det_unit(f"bg:{i}", dim)))
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    return dim, src, tgt


def test_bitext_lsh_recall_vs_exact(bitext_corpus):
    dim, src, tgt = bitext_corpus
    exact = {(r.src_id, r.tgt_id)
             for r in bitext_margin_mine(
                 src, tgt, min_sim=0.5, min_margin=0.05).collect()}
    lsh = {(r.src_id, r.tgt_id)
           for r in bitext_margin_mine_lsh(
               src, tgt, dim=dim, min_sim=0.5, min_margin=0.05,
               n_planes=4, n_tables=4).collect()}
    # the planted translations are clear pairs: exact finds them all
    assert len(exact) == 40
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"recall {recall} (exact={len(exact)} lsh={len(lsh)})"


def test_bitext_lsh_sims_match_exact_on_shared_pairs(bitext_corpus):
    """Accepted (src, tgt) pairs common to both paths must carry the
    identical 4dp sim — blocking changes the candidate set, never the
    scoring math."""
    dim, src, tgt = bitext_corpus
    exact = {(r.src_id, r.tgt_id): r.sim
             for r in bitext_margin_mine(
                 src, tgt, min_sim=0.5, min_margin=0.05).collect()}
    lsh = {(r.src_id, r.tgt_id): r.sim
           for r in bitext_margin_mine_lsh(
               src, tgt, dim=dim, min_sim=0.5, min_margin=0.05,
               n_planes=4, n_tables=4).collect()}
    for pair in set(exact) & set(lsh):
        assert exact[pair] == lsh[pair]


def test_bitext_lsh_multi_table_collision_dedup(spark):
    """A pair colliding in all n_tables tables must appear once, with
    margin computed over DISTINCT targets (runner-up is the second
    target, not the same pair again)."""
    dim = 8
    base = _det_unit("solo", dim)
    src = spark.createDataFrame([(100, base)], ["vec_id", "embedding"])
    tgt = spark.createDataFrame(
        [(0, base), (1, _perturb(base, "off", 0.6))],
        ["vec_id", "embedding"],
    )
    out = bitext_margin_mine_lsh(
        src, tgt, dim=dim, min_sim=0.5, min_margin=0.01,
        n_planes=2, n_tables=4,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src_id, r.tgt_id, r.sim) == (100, 0, 1.0)
    # margin must reflect target 1 as runner-up IF it shares a bucket;
    # either way it is < the single-candidate margin of sim - (-1)
    assert r.margin <= 2.0


def test_bitext_lsh_empty_sides(spark):
    dim = 8
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    one = spark.createDataFrame(
        [(0, _det_unit("x", dim))], ["vec_id", "embedding"]
    )
    assert bitext_margin_mine_lsh(empty, one, dim=dim).count() == 0
    assert bitext_margin_mine_lsh(one, empty, dim=dim).count() == 0
