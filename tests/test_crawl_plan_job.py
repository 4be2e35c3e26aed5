"""End-to-end crawl planning job: sitemap discovery -> blocklist ->
robots -> committed anti-join -> politeness schedule."""

import os

from jobs.crawl_plan import build_plan


def _write_sitemap(path, site, urls):
    body = "\n".join(
        f"<url><loc>{u}</loc></url>" for u in urls
    )
    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0"?>\n<urlset>\n' + body + "\n</urlset>"
        )


def test_crawl_plan_end_to_end(spark, tmp_path):
    sm_dir = tmp_path / "sitemaps"
    os.makedirs(sm_dir)
    _write_sitemap(
        sm_dir / "a.xml",
        "a.example",
        [
            "https://a.example/keep1",
            "https://a.example/keep2",
            "https://a.example/private/secret",   # robots-blocked
            "https://a.example/keep1#frag",       # canonical dup of keep1
            "https://a.example/old",              # already committed
        ],
    )
    _write_sitemap(
        sm_dir / "b.xml",
        "ads.example",
        ["https://ads.example/x", "https://ads.example/y"],  # blocklisted
    )

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        ["host", "robots_txt"],
    )
    robots_path = str(tmp_path / "robots.parquet")
    robots.write.parquet(robots_path)

    committed = spark.createDataFrame(
        [("https://a.example/old",)], ["url"]
    )
    committed_path = str(tmp_path / "committed.parquet")
    committed.write.parquet(committed_path)

    plan, stats = build_plan(
        spark,
        str(sm_dir / "*.xml"),
        robots_path,
        committed_path,
        blocklist=["ads.example"],
        workers=4,
    )
    rows = plan.collect()
    urls = sorted(r.url for r in rows)
    assert urls == [
        "https://a.example/keep1",
        "https://a.example/keep2",
    ]
    assert stats["discovered"] == 7
    # blocklist removes the 2 ads urls; the #frag dup canonicalizes away
    assert stats["after_blocklist"] == 4
    assert stats["robots_allowed"] == 3
    assert stats["new_urls"] == 2
    # one worker owns a host entirely; slots are 1..n within a worker
    by_worker = {}
    for r in rows:
        by_worker.setdefault(r.worker, []).append(r)
    for w, rs in by_worker.items():
        assert sorted(r.slot for r in rs) == list(range(1, len(rs) + 1))
    hosts_workers = {(r.host, r.worker) for r in rows}
    assert len({h for h, _ in hosts_workers}) == len(hosts_workers)
