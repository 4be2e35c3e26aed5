"""Z-order layout (operators/layout.py zorder_layout)."""

import pytest

from navigator_document_parser_spark.operators.layout import zorder_layout


def _py_interleave(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    rows = [(i, i * 13 % 100, i * 7 % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, x bigint, y bigint")
    out = {r["id"]: r for r in
           zorder_layout(df, "x", "y", bits=8, n_buckets=4).collect()}
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    mna, mxa, mnb, mxb = min(xs), max(xs), min(ys), max(ys)
    wa = (mxa - mna) // 256 + 1
    wb = (mxb - mnb) // 256 + 1
    for i, x, y in rows:
        za = (x - mna) // wa
        zb = (y - mnb) // wb
        z = _py_interleave(za, zb, 8)
        r = out[i]
        assert (r["za"], r["zb"], r["zvalue"]) == (za, zb, z)
        assert r["bucket"] == z * 4 // (1 << 16)


def test_locality_beats_single_sort(spark):
    # points on a grid: range of the curve touches few cells in BOTH
    # dims — check the bounding box of each bucket is narrow in both
    rows = [(y * 32 + x, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "doc_id bigint, x bigint, y bigint")
    out = zorder_layout(df, "x", "y", bits=5, n_buckets=16).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append((r["za"], r["zb"]))
    for pts in by_bucket.values():
        xs = [p for p, _ in pts]
        ys = [q for _, q in pts]
        # a 1/16 slice of the curve spans at most half of each axis —
        # a single-column sort would span the FULL other axis instead
        assert max(xs) - min(xs) <= 16
        assert max(ys) - min(ys) <= 16


def test_degenerate_dimension_maps_to_zero(spark):
    df = spark.createDataFrame(
        [(1, 5, 9), (2, 5, 11)], "doc_id bigint, x bigint, y bigint"
    )
    out = {r["id"]: r for r in
           zorder_layout(df, "x", "y", bits=8).collect()}
    assert out[1]["za"] == out[2]["za"] == 0  # max==min guard
    assert out[1]["zb"] != out[2]["zb"]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2, 3)], "doc_id bigint, x bigint, y bigint")
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", bits=0)
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", bits=40)
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", n_buckets=0)


def test_wide_range_dimension_no_overflow(spark):
    # epoch-microsecond-scale ranges overflowed the old multiply-first
    # scaling (review finding); divide-first must stay exact
    rows = [(i, 1_700_000_000_000_000 + i * 141_410_000_000, i)
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, x bigint, y bigint")
    out = zorder_layout(df, "x", "y", bits=16, n_buckets=8).collect()
    zas = [r["za"] for r in out]
    assert all(0 <= z < (1 << 16) for z in zas)
    assert len(set(zas)) > 1  # still discriminates
    assert all(r["zvalue"] >= 0 for r in out)
