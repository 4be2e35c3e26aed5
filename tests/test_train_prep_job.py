"""End-to-end training-prep job: curate -> temperature mix -> token
budget -> sequence packing, through the CLI surface (jobs/train_prep.py).
"""

import shutil
import tempfile

import jobs.train_prep as T
from tests.test_curate_job import _doc


def _docs(spark, n=40):
    # 3/4 english, 1/4 'xx' low-resource; one exact dup; one junk doc
    rows = []
    for i in range(n):
        lang = "en" if i % 4 else "xx"
        rows.append((i, _doc(f"d{i}"), lang))
    rows.append((n, _doc("d1"), "en"))      # exact dup of doc 1
    rows.append((n + 1, "too short", "en"))  # fails the Gopher gate
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_prep_stages_and_packing_invariants(spark):
    docs = _docs(spark)
    out, counts = T.prep(spark, docs, alpha=0.3, budget_frac=0.8,
                         token_budget=600, max_tokens=128, n_shards=4)
    rows = out.collect()
    out.unpersist()

    assert counts["input"] == 42
    assert counts["after_exact_dedup"] == 41
    assert counts["after_quality_gate"] == 40
    assert counts["after_temperature_mix"] <= 40
    assert counts["after_budget_select"] <= counts["after_temperature_mix"]
    assert counts["packed_docs"] == len(rows)
    assert counts["n_packs"] >= 1

    langs = {}
    for r in rows:
        assert 0 <= r.shard < 4
        assert r.pack_id >= 0
        assert r.n_tokens > 0
        langs.setdefault(r.lang, 0)
        langs[r.lang] += r.n_tokens
    # the per-language budget bounds kept tokens: every language's kept
    # mass is < budget + one overrunning document (budget_select's
    # fill-to-~B contract); docs here are ~60 tokens
    for lang, tok in langs.items():
        assert tok < 600 + 200, (lang, tok)


def test_prep_is_deterministic(spark):
    docs = _docs(spark, n=24)
    a, _ = T.prep(spark, docs, alpha=0.5, token_budget=400,
                  max_tokens=64, n_shards=2)
    akeys = sorted((r.doc_id, r.shard, r.pack_id) for r in a.collect())
    a.unpersist()
    b, _ = T.prep(spark, docs, alpha=0.5, token_budget=400,
                  max_tokens=64, n_shards=2)
    bkeys = sorted((r.doc_id, r.shard, r.pack_id) for r in b.collect())
    b.unpersist()
    assert akeys == bkeys


def test_train_prep_cli_end_to_end(spark):
    base = tempfile.mkdtemp(prefix="ndps-trainprep-")
    try:
        _docs(spark, n=20).write.parquet(base + "/in")
        T.main([
            "--input", base + "/in",
            "--output", base + "/out",
            "--alpha", "0.3",
            "--max-tokens", "128",
            "--n-shards", "2",
        ])
        out = spark.read.parquet(base + "/out")
        assert out.count() >= 1
        assert {"doc_id", "text", "lang", "n_tokens", "shard",
                "pack_id"} <= set(out.columns)
        # partitioned layout: shard is a partition column
        shards = {r.shard for r in out.select("shard").distinct().collect()}
        assert shards <= {0, 1}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_prep_curriculum_packs_are_phase_homogeneous(spark):
    docs = _docs(spark, n=16)
    out, _ = T.prep(spark, docs, curriculum_phases=3, max_tokens=128,
                    n_shards=2)
    rows = out.collect()
    out.unpersist()
    assert rows and all(0 <= r.phase < 3 for r in rows)
    packs = {}
    for r in rows:
        packs.setdefault((r.phase, r.shard, r.pack_id), set()).add(r.phase)
    # a pack never mixes phases: the loader streams phase 0 first
    # without splitting any pack
    assert all(len(ph) == 1 for ph in packs.values())


def test_prep_curriculum_lazy_mode(spark):
    docs = _docs(spark, n=12)
    out, counts = T.prep(spark, docs, curriculum_phases=2,
                         max_tokens=64, n_shards=2, with_counts=False)
    assert counts == {}
    assert out.count() > 0
