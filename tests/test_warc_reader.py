"""WARC ingestion: CC-style gzip-member archives -> documents rows ->
the full extraction pipeline."""

import gzip
import os
import shutil
import tempfile

from navigator_document_parser_spark.sources.warc import (
    _iter_warc_records,
    _records_to_rows,
    read_warc,
    write_warc,
)


def _page(i: int) -> bytes:
    return (
        f"<html><head><title>Page {i}</title></head><body>"
        f'<div class="content"><p>Paragraph one of page {i} with words.</p>'
        f"<p>Second paragraph for page {i} follows here.</p></div>"
        f"</body></html>"
    ).encode()


def _archive(ids, gz=True) -> bytes:
    return write_warc(
        [
            (
                f"https://example.org/p/{i}",
                f"2024-02-0{1 + i % 9}T12:00:0{i % 10}Z",
                _page(i),
            )
            for i in ids
        ],
        gzip_members=gz,
    )


def test_record_parser_pure():
    raw = gzip.GzipFile(
        fileobj=__import__("io").BytesIO(_archive([1, 2, 3]))
    ).read()
    recs = list(_iter_warc_records(raw))
    assert len(recs) == 3
    assert recs[0][0]["warc-type"] == "response"
    rows = _records_to_rows(_archive([1, 2, 3]))
    assert [r["url"] for r in rows] == [
        f"https://example.org/p/{i}" for i in (1, 2, 3)
    ]
    assert rows[0]["html"] == _page(1)  # HTTP headers stripped
    assert rows[0]["warc_ts"].year == 2024


def test_negative_content_length_terminates():
    """ADVICE r2: a hostile 'Content-Length: -N' header must not move the
    cursor backward onto a prior record boundary and re-yield the same
    record forever — the parser stops cleanly instead."""
    good = _archive([1], gz=False)
    evil = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://example.org/evil\r\n"
        "WARC-Date: 2024-02-01T00:00:00Z\r\n"
        "Content-Length: -54\r\n\r\n"
    ).encode()
    recs = list(_iter_warc_records(good + evil))  # hung forever pre-fix
    assert len(recs) == 1
    rows = _records_to_rows(good + evil)
    assert [r["url"] for r in rows] == ["https://example.org/p/1"]


def test_malformed_records_dropped_never_raise():
    good = _archive([7], gz=False)
    cases = [
        b"",
        b"garbage not a warc",
        good[: len(good) // 2],        # truncated payload
        good + b"WARC/1.0\r\nbroken",  # good record + garbage tail
        gzip.compress(b"\x00\x01\x02"),
        b"\x1f\x8b truncated gzip",
    ]
    for blob in cases:
        rows = _records_to_rows(blob)
        assert isinstance(rows, list)
    assert len(_records_to_rows(good + b"WARC/1.0\r\nbroken")) == 1


def test_extract_cli_warc_format(spark):
    """jobs/extract.py --format warc drives shards through the whole
    extract+merge pipeline."""
    import jobs.extract as J

    base = tempfile.mkdtemp(prefix="ndps-warc-cli-")
    try:
        with open(os.path.join(base, "s.warc.gz"), "wb") as f:
            f.write(_archive(range(0, 12)))
        J.main([
            "--input", base + "/*.warc.gz",
            "--format", "warc",
            "--output", base + "/out",
            "--run-id", "warc-cli",
        ])
        out = spark.read.parquet(base + "/out")
        assert out.count() == 12
        assert out.filter("error is null").count() == 12
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_warc_to_extraction_end_to_end(spark):
    from navigator_document_parser_spark.plans.job import run_extraction

    base = tempfile.mkdtemp(prefix="ndps-warc-")
    try:
        # two CC-style shards + a non-response record mixed in
        extra = (
            "WARC/1.0\r\nWARC-Type: request\r\n"
            "WARC-Target-URI: https://example.org/skip\r\n"
            "WARC-Date: 2024-02-01T00:00:00Z\r\nContent-Length: 2\r\n"
            "\r\nhi\r\n\r\n"
        ).encode()
        with open(os.path.join(base, "a.warc.gz"), "wb") as f:
            f.write(_archive(range(0, 6)) + gzip.compress(extra))
        with open(os.path.join(base, "b.warc.gz"), "wb") as f:
            f.write(_archive(range(6, 10)))

        docs = read_warc(spark, base + "/*.warc.gz")
        assert docs.count() == 10  # request record excluded
        out = run_extraction(docs, run_id="warc")
        rows = {r["url"]: r for r in out.collect()}
        assert len(rows) == 10
        for i in range(10):
            r = rows[f"https://example.org/p/{i}"]
            assert r["error"] is None
            assert f"Paragraph one of page {i}" in r["text"]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_wet_reader_and_curate_e2e(spark):
    """WET (Common Crawl extracted-text) shards: conversion records land
    as text rows with html NULL; response records in the same archive
    are ignored; the curate CLI consumes WET shards end to end."""
    from navigator_document_parser_spark.sources.warc import (
        read_wet,
        write_wet,
    )

    base = tempfile.mkdtemp(prefix="ndps-wet-")
    try:
        texts = [
            (
                f"https://example.org/t/{i}",
                f"2024-03-0{1 + i % 9}T08:00:00Z",
                f"the quick document number {i} with plenty of words "
                * 12,
            )
            for i in range(8)
        ]
        wet = write_wet(texts)
        # a stray response record must be skipped by the WET reader
        wet += _archive([99])
        with open(os.path.join(base, "a.warc.wet.gz"), "wb") as f:
            f.write(wet)

        docs = read_wet(spark, base + "/*.warc.wet.gz")
        rows = {r["url"]: r for r in docs.collect()}
        assert len(rows) == 8
        for url, date, text in texts:
            assert rows[url]["text"] == text
            assert rows[url]["html"] is None

        # e2e: curate CLI straight off the WET shard
        from jobs.curate import main as curate_main

        curate_main([
            "--input", base + "/*.warc.wet.gz",
            "--format", "wet",
            "--output", base + "/out",
        ])
        out = spark.read.parquet(base + "/out")
        assert out.count() == 8  # distinct texts, all pass the gate
        assert set(out.columns) >= {"doc_id", "text"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_wat_reader_and_host_link_graph(spark):
    """WAT 'metadata' records parse into (url, ts, title, links) rows;
    malformed JSON degrades to an empty-link row; host_link_graph
    aggregates cross-host edges with counts."""
    from navigator_document_parser_spark.sources.warc import (
        host_link_graph,
        read_wat,
        write_wat,
    )

    base = tempfile.mkdtemp()
    try:
        wat = write_wat([
            ("https://a.example.org/x", "2024-03-01T00:00:00Z", "Page X",
             [("https://b.example.org/1", "best spark guide"),
              ("https://b.example.org/2", "spark guide"),
              "https://a.example.org/self", "/relative/skipped"]),
            ("https://a.example.org/y", "2024-03-01T00:00:01Z", None,
             ["https://c.example.org/"]),
        ])
        # a hostile record: valid WARC framing, garbage JSON payload
        body = b"{not json"
        head = (
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: https://bad.example.org/\r\n"
            "WARC-Date: 2024-03-01T00:00:02Z\r\n"
            f"Content-Length: {len(body)}\r\n"
        ).encode()
        wat += gzip.compress(head + b"\r\n" + body + b"\r\n\r\n")
        # and a stray response record the WAT reader must skip
        wat += _archive([99])
        with open(os.path.join(base, "a.warc.wat.gz"), "wb") as f:
            f.write(wat)

        rows = {r["url"]: r for r in
                read_wat(spark, base + "/*.warc.wat.gz").collect()}
        assert len(rows) == 3
        assert rows["https://a.example.org/x"]["title"] == "Page X"
        assert len(rows["https://a.example.org/x"]["links"]) == 4
        l0 = rows["https://a.example.org/x"]["links"][0]
        assert l0["url"] == "https://b.example.org/1"
        assert l0["text"] == "best spark guide"
        assert rows["https://a.example.org/x"]["links"][2]["text"] is None
        assert rows["https://a.example.org/y"]["title"] is None
        # hostile JSON: row survives with empty links, task never dies
        assert rows["https://bad.example.org/"]["links"] == []

        edges = {
            (r.src_host, r.dst_host): r.n_links
            for r in host_link_graph(
                read_wat(spark, base + "/*.warc.wat.gz")
            ).collect()
        }
        # self-host and relative (host-less) links are excluded
        assert edges == {
            ("a.example.org", "b.example.org"): 2,
            ("a.example.org", "c.example.org"): 1,
        }

        # anchor-term index: what other hosts call b.example.org
        from navigator_document_parser_spark.sources.warc import (
            anchor_terms,
        )

        at = {
            (r.dst_host, r.term): (r.n, r.rank)
            for r in anchor_terms(
                read_wat(spark, base + "/*.warc.wat.gz"), k=2
            ).collect()
        }
        # 'spark' and 'guide' appear twice; top-2 cut drops 'best';
        # ties break term-asc so guide ranks before spark
        assert at == {
            ("b.example.org", "guide"): (2, 1),
            ("b.example.org", "spark"): (2, 2),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_read_cdx(spark):
    """CDXJ index shards parse via pure built-ins: good lines fully
    typed, malformed lines degrade to null columns (never-throw under
    ANSI mode), gzip shards decode in the text source."""
    import gzip
    import os
    import shutil
    import tempfile

    from navigator_document_parser_spark.sources.warc import read_cdx

    base = tempfile.mkdtemp(prefix="ndps-cdx-")
    try:
        good = (
            'org,example)/x 20240101120000 {"url": '
            '"https://example.org/x", "mime": "text/html", "status": '
            '"200", "digest": "AAAA", "length": "1234", "offset": '
            '"56", "filename": "crawl/a.warc.gz"}'
        )
        nojson = "org,example)/y 20240202000000 not-json-at-all"
        short = "single-token-line"  # <3 tokens: must not kill the job
        badts = (
            'org,example)/z notadate {"url": "https://example.org/z", '
            '"status": "30x"}'
        )
        with gzip.open(os.path.join(base, "cdx-00000.gz"), "wt") as f:
            f.write(good + "\n\n" + nojson + "\n" + badts + "\n"
                    + short + "\n")

        rows = {r["urlkey"] or f"row{i}": r
                for i, r in enumerate(read_cdx(
                    spark, base + "/cdx-*.gz").collect())}
        assert len(rows) == 4  # blank line dropped, bad lines kept
        g = rows["org,example)/x"]
        assert g["url"] == "https://example.org/x"
        assert g["status"] == 200 and g["length"] == 1234
        assert g["offset"] == 56 and g["digest"] == "AAAA"
        assert g["warc_ts"].year == 2024
        assert rows["org,example)/y"]["url"] is None  # bad JSON -> nulls
        z = rows["org,example)/z"]
        assert z["warc_ts"] is None  # bad timestamp -> null, not throw
        assert z["status"] is None   # non-numeric status -> null
        assert z["url"] == "https://example.org/z"
        # truncated line: try_element_at degrades to nulls under ANSI
        # (element_at would abort the whole job — review finding)
        t = rows["single-token-line"]
        assert t["warc_ts"] is None and t["url"] is None
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cdx_fetch_plan(spark):
    """Digest dedup keeps the earliest capture, status/mime filters
    apply, and already-committed (url, warc_ts) pairs are pruned."""
    from pyspark.sql import functions as F

    from navigator_document_parser_spark.sources.warc import (
        cdx_fetch_plan,
    )

    cdx = spark.createDataFrame(
        [
            # digest D1 captured twice: the 0102 capture wins (earlier)
            ("k/a", "2024-01-02 00:00:00", "https://a/x", "text/html",
             200, "D1", 10, 0, "f1"),
            ("k/b", "2024-01-03 00:00:00", "https://b/x", "text/html",
             200, "D1", 10, 0, "f2"),
            # wrong status / wrong mime / null digest all drop
            ("k/c", "2024-01-01 00:00:00", "https://c/x", "text/html",
             404, "D2", 10, 0, "f3"),
            ("k/d", "2024-01-01 00:00:00", "https://d/x", "image/png",
             200, "D3", 10, 0, "f4"),
            ("k/e", "2024-01-01 00:00:00", "https://e/x", "text/html",
             200, None, 10, 0, "f5"),
            # D4 is new and survives; D5 is already committed
            ("k/f", "2024-01-05 00:00:00", "https://f/x", "text/html",
             200, "D4", 10, 0, "f6"),
            ("k/g", "2024-01-06 00:00:00", "https://g/x", "text/html",
             200, "D5", 10, 0, "f7"),
        ],
        "urlkey string, warc_ts string, url string, mime string, "
        "status int, digest string, length long, offset long, "
        "filename string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    committed = spark.createDataFrame(
        [("https://g/x", "2024-01-06 00:00:00")],
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    plan = {r["digest"]: r for r in
            cdx_fetch_plan(cdx, committed).collect()}
    assert set(plan) == {"D1", "D4"}
    assert plan["D1"]["url"] == "https://a/x"  # earliest capture won
    assert plan["D1"]["filename"] == "f1"
