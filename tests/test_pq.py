"""Product quantization (operators/similarity.py pq_encode)."""

import math
import random

import pytest

from navigator_document_parser_spark.operators.similarity import (
    _hyperplane,
    _unit,
    pq_encode,
)


def _vectors(spark, n=40, dim=16, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _py_pq(rows, dim, m, k, seed=11):
    sub = dim // m
    books = [
        [_unit(_hyperplane(sub, s * k + c, seed)) for c in range(k)]
        for s in range(m)
    ]
    out = {}
    for vid, v in rows:
        codes = []
        err = 0.0
        for s in range(m):
            xs = v[s * sub : (s + 1) * sub]
            dots = [
                sum(x * c for x, c in zip(xs, cent))
                for cent in books[s]
            ]
            best = max(range(k), key=lambda c: (dots[c], -c))
            codes.append(best + 1)
            err += sum(
                (x - c) ** 2 for x, c in zip(xs, books[s][best])
            )
        out[vid] = (tuple(codes), err)
    return out


@pytest.mark.parametrize("recon", ["sql", "fused"])
def test_pq_matches_python_reference(spark, recon):
    rows, df = _vectors(spark)
    got = {
        r["vec_id"]: r
        for r in pq_encode(
            df, dim=16, n_subspaces=4, n_centroids=4, recon=recon
        ).collect()
    }
    want = _py_pq(rows, 16, 4, 4)
    for vid, (codes, err) in want.items():
        r = got[vid]
        assert tuple(
            r[f"code_{s + 1}"] for s in range(4)
        ) == codes, vid
        assert math.isclose(r["recon_err"], round(err, 6), abs_tol=2e-6)


def test_pq_paths_agree(spark):
    _, df = _vectors(spark, n=60, dim=32, seed=9)
    a = {
        r["vec_id"]: (r["code_1"], r["code_2"], r["recon_err"])
        for r in pq_encode(
            df, dim=32, n_subspaces=2, n_centroids=8, recon="sql"
        ).collect()
    }
    b = {
        r["vec_id"]: (r["code_1"], r["code_2"], r["recon_err"])
        for r in pq_encode(
            df, dim=32, n_subspaces=2, n_centroids=8, recon="fused"
        ).collect()
    }
    assert set(a) == set(b)
    for vid in a:
        assert a[vid][:2] == b[vid][:2]
        assert math.isclose(a[vid][2], b[vid][2], abs_tol=2e-6)


def test_pq_rejects_bad_params(spark):
    _, df = _vectors(spark, n=3, dim=16)
    with pytest.raises(ValueError):
        pq_encode(df, dim=16, n_subspaces=3)
    with pytest.raises(ValueError):
        pq_encode(df, dim=16, n_centroids=1)
    with pytest.raises(ValueError):
        pq_encode(df, dim=16, recon="nope")
