"""Perceptual image dedup (dHash + pigeonhole banding) — VERDICT r5 #4.

The operator is exact within max_dist (4x16-bit bands pigeonhole any
pair at Hamming distance <= 3), so every test pins against a pure-
Python brute force over the same pixel grids.
"""

from __future__ import annotations

import hashlib

import pytest

from navigator_document_parser_spark.operators.dedup import dedup_phash

W, H = 9, 8


def _dhash_bits(pixels: list[int]) -> list[int]:
    """Reference dHash: bit b = 1 iff p[y*W + x + 1] > p[y*W + x],
    b = y*(W-1) + x — must mirror _dhash_band_terms' index math."""
    bits = []
    for b in range(64):
        y, x = divmod(b, W - 1)
        i = y * W + x
        bits.append(1 if pixels[i + 1] > pixels[i] else 0)
    return bits


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(
        x != y for x, y in zip(_dhash_bits(a), _dhash_bits(b))
    )


def _grid(seed: str) -> list[int]:
    out = []
    for j in range(W * H):
        h = hashlib.md5(f"{seed}:{j}".encode()).digest()
        out.append(h[0])
    return out


def test_planted_near_duplicate_image_found(spark):
    base = _grid("img:0")
    near = list(base)
    near[17] = (near[17] + 128) % 256  # one pixel -> <= 2 dHash bits
    far = _grid("img:other")
    assert _hamming(base, near) <= 2
    assert _hamming(base, far) > 3  # md5 grids: ~32 expected
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], ["media_id", "pixels"]
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup_phash(df, max_dist=3).collect()}
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == _hamming(base, near)


@pytest.mark.parametrize("max_dist", [0, 2, 3])
def test_phash_exact_vs_bruteforce(spark, max_dist):
    """60 images in 15 groups of 4 (base + three 1-pixel perturbations,
    the contract synth's shape) — the banded operator must equal the
    all-pairs brute force exactly."""
    rows = []
    grids = {}
    for g in range(15):
        base = _grid(f"g:{g}")
        for m in range(4):
            px = list(base)
            if m:
                j = (g * 7 + m * 13) % 72
                px[j] = (px[j] + 128) % 256
            mid = g * 4 + m
            grids[mid] = px
            rows.append((mid, px))
    expect = {
        (a, b): _hamming(grids[a], grids[b])
        for a in grids for b in grids
        if a < b and _hamming(grids[a], grids[b]) <= max_dist
    }
    df = spark.createDataFrame(rows, ["media_id", "pixels"])
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup_phash(df, max_dist=max_dist).collect()}
    assert got == expect
    if max_dist >= 2:
        assert expect  # the synth must actually plant pairs


def test_phash_validates_params(spark):
    df = spark.createDataFrame([(0, list(range(72)))],
                               ["media_id", "pixels"])
    with pytest.raises(ValueError):
        dedup_phash(df, max_dist=4)
    with pytest.raises(ValueError):
        dedup_phash(df, width=8, height=8)


def test_phash_single_join_plan(spark):
    """Lesson 12: the banded candidates are ONE equi-join on the folded
    band key — no BNLJ, no cartesian, no union of per-band joins."""
    df = spark.createDataFrame(
        [(0, _grid("a")), (1, _grid("b"))], ["media_id", "pixels"]
    )
    plan = dedup_phash(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Union") == 0


# ---------------------------------------------------------------------------
# video_neardup — frame-hash rollup to video pairs
# ---------------------------------------------------------------------------

from navigator_document_parser_spark.operators.dedup import video_neardup


def _frames(vid, seeds, perturb=None):
    """Rows (vid, fi, pixels) for one video; perturb = {fi: pixel_idx}."""
    rows = []
    for fi, seed in enumerate(seeds):
        px = _grid(seed)
        if perturb and fi in perturb:
            j = perturb[fi]
            px[j] = (px[j] + 128) % 256
        rows.append((vid, fi, px))
    return rows


def test_video_neardup_planted_copy_found(spark):
    base_seeds = [f"v:base:{fi}" for fi in range(4)]
    rows = (
        _frames(0, base_seeds)
        # re-encode: every frame off by one pixel -> matches all 4
        + _frames(1, base_seeds, perturb={0: 3, 1: 9, 2: 40, 3: 65})
        # unrelated video
        + _frames(2, [f"v:other:{fi}" for fi in range(4)])
        # partial overlap: shares only frame 0 with base -> below min 2
        + _frames(3, [base_seeds[0], "v:x:1", "v:x:2", "v:x:3"])
    )
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "pixels"])
    got = {(r.vid_a, r.vid_b): r.n_matched
           for r in video_neardup(df, max_dist=3, min_frames=2).collect()}
    assert got == {(0, 1): 4}
    # with min_frames=1 the partial-overlap video appears too
    got1 = {(r.vid_a, r.vid_b): r.n_matched
            for r in video_neardup(df, max_dist=3, min_frames=1).collect()}
    assert got1[(0, 3)] == 1 and got1[(1, 3)] == 1 and got1[(0, 1)] == 4
    assert (0, 2) not in got1 and (1, 2) not in got1


def test_video_neardup_vs_bruteforce(spark):
    """12 videos in 3 groups of 4 (contract synth shape) — rollup must
    equal the all-pairs frame brute force."""
    rows, vids = [], {}
    for g in range(3):
        seeds = [f"g{g}:f{fi}" for fi in range(4)]
        for m in range(4):
            vid = g * 4 + m
            pert = ({fi: (g * 7 + m * 13 + fi * 5) % 72 for fi in range(4)}
                    if m else None)
            vrows = _frames(vid, seeds, perturb=pert)
            vids[vid] = [r[2] for r in vrows]
            rows.extend(vrows)
    expect = {}
    for a in vids:
        for b in vids:
            if a >= b:
                continue
            n = sum(
                1 for fa in vids[a]
                if any(_hamming(fa, fb) <= 3 for fb in vids[b])
            )
            if n >= 2:
                expect[(a, b)] = n
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "pixels"])
    got = {(r.vid_a, r.vid_b): r.n_matched
           for r in video_neardup(df, max_dist=3, min_frames=2).collect()}
    assert got == expect
    assert expect  # the synth must actually plant video pairs


def test_video_neardup_never_self_matches(spark):
    """A video whose own frames are identical must not pair with
    itself."""
    px = _grid("self")
    rows = [(7, fi, px) for fi in range(4)]
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "pixels"])
    assert video_neardup(df, min_frames=1).count() == 0


def test_video_neardup_validates_params(spark):
    df = spark.createDataFrame([(0, 0, list(range(72)))],
                               ["media_id", "frame_idx", "pixels"])
    with pytest.raises(ValueError):
        video_neardup(df, max_dist=4)
    with pytest.raises(ValueError):
        video_neardup(df, min_frames=0)


# ---------------------------------------------------------------------------
# audio_neardup — Haitsma-Kalker fingerprint rollup to track pairs
# ---------------------------------------------------------------------------

from navigator_document_parser_spark.operators.dedup import audio_neardup


def _energies(seed):
    return [hashlib.md5(f"{seed}:{j}".encode()).digest()[0]
            for j in range(33)]


def _hk_bits(cur, prev):
    return [
        1 if (cur[b] - cur[b + 1]) - (prev[b] - prev[b + 1]) > 0 else 0
        for b in range(32)
    ]


def _hk_ham(a_cur, a_prev, b_cur, b_prev):
    return sum(x != y for x, y in
               zip(_hk_bits(a_cur, a_prev), _hk_bits(b_cur, b_prev)))


def _track(trk, seeds, perturb=None):
    rows = []
    for fi, seed in enumerate(seeds):
        e = _energies(seed)
        if perturb and fi in perturb:
            j = perturb[fi]
            e[j] = (e[j] + 128) % 256
        rows.append((trk, fi, e))
    return rows


def test_audio_neardup_planted_copy_found(spark):
    seeds = [f"a:base:{fi}" for fi in range(4)]
    rows = (
        _track(0, seeds)
        + _track(1, seeds, perturb={1: 10})   # re-encode wobble
        + _track(2, [f"a:other:{fi}" for fi in range(4)])
    )
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "energies"])
    got = {(r.trk_a, r.trk_b): r.n_matched
           for r in audio_neardup(df, max_dist=3, min_frames=2).collect()}
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == 3  # fingerprint frames 1..3 all match


def test_audio_neardup_vs_bruteforce(spark):
    rows, tracks = [], {}
    for g in range(3):
        seeds = [f"ag{g}:f{fi}" for fi in range(4)]
        for m in range(4):
            trk = g * 4 + m
            pert = ({m - 1: (g * 7 + m * 13) % 33} if m else None)
            trows = _track(trk, seeds, perturb=pert)
            tracks[trk] = [r[2] for r in trows]
            rows.extend(trows)
    expect = {}
    for a in tracks:
        for b in tracks:
            if a >= b:
                continue
            n = sum(
                1 for fa in range(1, 4)
                if any(
                    _hk_ham(tracks[a][fa], tracks[a][fa - 1],
                            tracks[b][fb], tracks[b][fb - 1]) <= 3
                    for fb in range(1, 4)
                )
            )
            if n >= 2:
                expect[(a, b)] = n
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "energies"])
    got = {(r.trk_a, r.trk_b): r.n_matched
           for r in audio_neardup(df, max_dist=3, min_frames=2).collect()}
    assert got == expect
    assert expect


def test_audio_neardup_multiprobe_boundary_vs_bruteforce(spark):
    """r7 optimization pin: candidates now come from two 16-bit halves
    with a ham<=1 multiprobe. Multi-position perturbations produce
    fingerprint pairs at Hamming 2-6 with errors split ACROSS halves
    (the 2+1 split is the recall boundary: one half carries 2 errors
    and only the other half's single-flip probe can find the pair);
    brute force must agree exactly."""
    rows, tracks = [], {}
    for g in range(3):
        seeds = [f"mb{g}:f{fi}" for fi in range(4)]
        for m in range(4):
            trk = g * 4 + m
            pert = None
            if m:
                # 1-3 perturbed band positions spread over the 33 bands
                pert = {
                    (m * 11 + j * 13 + g * 5) % 33: (g * 7 + m + j) % 33
                    for j in range(m)
                }
            trows = _track(trk, seeds, perturb=pert)
            tracks[trk] = [r[2] for r in trows]
            rows.extend(trows)
    expect = {}
    for a in tracks:
        for b in tracks:
            if a >= b:
                continue
            n = sum(
                1 for fa in range(1, 4)
                if any(
                    _hk_ham(tracks[a][fa], tracks[a][fa - 1],
                            tracks[b][fb], tracks[b][fb - 1]) <= 3
                    for fb in range(1, 4)
                )
            )
            if n >= 2:
                expect[(a, b)] = n
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "energies"])
    got = {(r.trk_a, r.trk_b): r.n_matched
           for r in audio_neardup(df, max_dist=3, min_frames=2).collect()}
    assert got == expect
    assert expect


def test_audio_neardup_single_frame_track_never_pairs(spark):
    """Frame 0 has no predecessor -> a 1-frame track has no fingerprint
    at all and can never match."""
    rows = [(0, 0, _energies("solo"))] + _track(1, ["solo"] * 4)
    df = spark.createDataFrame(rows, ["media_id", "frame_idx", "energies"])
    assert audio_neardup(df, min_frames=1).count() == 0


def test_audio_neardup_validates_params(spark):
    df = spark.createDataFrame([(0, 0, list(range(33)))],
                               ["media_id", "frame_idx", "energies"])
    with pytest.raises(ValueError):
        audio_neardup(df, max_dist=4)
    with pytest.raises(ValueError):
        audio_neardup(df, min_frames=0)


def test_malformed_grids_dropped_not_crashed(spark):
    """ANSI element_at would throw on a short array; malformed rows are
    dropped on BOTH engine sides instead (oracle-parity guard)."""
    base = _grid("m:base")
    near = list(base)
    near[5] = (near[5] + 128) % 256
    rows = [(0, base), (1, near), (2, base[:10]), (3, [])]
    df = spark.createDataFrame(rows, "media_id long, pixels array<int>")
    got = {(r.id_a, r.id_b) for r in dedup_phash(df).collect()}
    assert got == {(0, 1)}
    arows = (_track(0, [f"am:{i}" for i in range(4)])
             + _track(1, [f"am:{i}" for i in range(4)])
             + [(2, 0, [1, 2, 3])])
    adf = spark.createDataFrame(
        arows, "media_id long, frame_idx long, energies array<int>")
    got = {(r.trk_a, r.trk_b)
           for r in audio_neardup(adf, min_frames=2).collect()}
    assert got == {(0, 1)}


# ---------------------------------------------------------------------------
# mirror-invariant dedup_phash
# ---------------------------------------------------------------------------


def _mirror(px):
    out = []
    for y in range(H):
        row = px[y * W:(y + 1) * W]
        out.extend(reversed(row))
    return out


def test_mirrored_copy_found_only_with_mirror_invariant(spark):
    base = _grid("mi:base")
    flipped = _mirror(base)
    far = _grid("mi:far")
    assert _hamming(base, flipped) > 3  # invisible to plain dHash
    df = spark.createDataFrame(
        [(0, base), (1, flipped), (2, far)], ["media_id", "pixels"]
    )
    plain = {(r.id_a, r.id_b) for r in dedup_phash(df).collect()}
    assert plain == set()
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup_phash(df, mirror_invariant=True).collect()}
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == _hamming(base, _mirror(flipped))


def test_mirror_invariant_vs_bruteforce(spark):
    """min(direct, mirror-of-id_b) over 24 images (incl. planted flips
    and 1-pixel perturbations) must equal the all-pairs brute force."""
    rows, grids = [], {}
    for g in range(6):
        base = _grid(f"mg:{g}")
        for m in range(4):
            if m == 3:
                px = _mirror(base)
            elif m:
                px = list(base)
                j = (g * 7 + m * 13) % 72
                px[j] = (px[j] + 128) % 256
            else:
                px = list(base)
            mid = g * 4 + m
            grids[mid] = px
            rows.append((mid, px))
    expect = {}
    for a in grids:
        for b in grids:
            if a >= b:
                continue
            h = min(_hamming(grids[a], grids[b]),
                    _hamming(grids[a], _mirror(grids[b])))
            if h <= 3:
                expect[(a, b)] = h
    df = spark.createDataFrame(rows, ["media_id", "pixels"])
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup_phash(df, max_dist=3,
                                mirror_invariant=True).collect()}
    assert got == expect
    # flips must actually be part of the planted signal
    assert any(b % 4 == 3 for (_, b) in expect)


def test_video_audio_single_join_plans(spark):
    """Lesson 12 discipline for the whole perceptual family: one folded
    band-key equi-join, no BNLJ/cartesian/union-of-branches."""
    vdf = spark.createDataFrame(
        [(0, 0, _grid("pv:a")), (1, 0, _grid("pv:b"))],
        ["media_id", "frame_idx", "pixels"],
    )
    adf = spark.createDataFrame(
        [(0, 0, _energies("pa:a")), (0, 1, _energies("pa:b"))],
        ["media_id", "frame_idx", "energies"],
    )
    for df in (video_neardup(vdf), audio_neardup(adf),
               dedup_phash(vdf.drop("frame_idx"), mirror_invariant=True)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("Union") == 0


# ---------------------------------------------------------------------------
# phash_snapshot_dedup — incremental (new-vs-committed) image dedup
# ---------------------------------------------------------------------------

from navigator_document_parser_spark.operators.dedup import (
    phash_snapshot_dedup,
)


def test_phash_incremental_best_match_and_fresh(spark):
    base = _grid("inc:base")
    near = list(base)
    near[11] = (near[11] + 128) % 256
    old_rows = [(100, base), (101, base), (102, _grid("inc:other"))]
    new_rows = [(0, near), (1, _grid("inc:fresh")), (2, base)]
    old = spark.createDataFrame(old_rows, ["media_id", "pixels"])
    new = spark.createDataFrame(new_rows, ["media_id", "pixels"])
    got = {r.media_id: (r.dup_of, r.hamming)
           for r in phash_snapshot_dedup(new, old).collect()}
    # exact copy -> ham 0, tie between old 100/101 breaks to smaller id
    assert got[2] == (100, 0)
    # near copy -> its best committed match
    assert got[0][0] == 100 and 0 < got[0][1] <= 3
    # fresh image -> no row
    assert 1 not in got
    # old x old pairs are never computed/emitted (100 vs 101 identical)
    assert set(got) == {0, 2}


def test_phash_incremental_vs_bruteforce(spark):
    olds = {100 + i: _grid(f"io:{i}") for i in range(8)}
    news = {}
    for i in range(12):
        if i % 3 == 0:
            px = list(olds[100 + (i % 8)])
            px[(7 * i) % 72] = (px[(7 * i) % 72] + 128) % 256
        else:
            px = _grid(f"in:{i}")
        news[i] = px
    expect = {}
    for n, np_ in news.items():
        best = None
        for o, op in olds.items():
            h = _hamming(np_, op)
            if h <= 3 and (best is None or (h, o) < best):
                best = (h, o)
        if best:
            expect[n] = (best[1], best[0])
    old = spark.createDataFrame(list(olds.items()), ["media_id", "pixels"])
    new = spark.createDataFrame(list(news.items()), ["media_id", "pixels"])
    got = {r.media_id: (r.dup_of, r.hamming)
           for r in phash_snapshot_dedup(new, old).collect()}
    assert got == expect
    assert expect
