"""S1 reader semantics: schema-pinned reads, drop-invalid-with-accounting."""

import shutil
import tempfile


def test_json_task_ingestion_drops_invalid_with_accounting(spark):
    from navigator_document_parser_spark.sources.readers import (
        read_parser_inputs_json,
    )

    d = tempfile.mkdtemp(prefix="ndps-readers-")
    try:
        lines = [
            '{"url": "https://a.example/1", "warc_ts": "2024-01-01T00:00:00Z", "html": "", "text": "", "lang": "en"}',
            '{"url": "https://a.example/2", "warc_ts": "2024-01-01T01:00:00Z", "html": "", "text": "", "lang": "fr"}',
            'this is not json at all',
            '{"url": null, "warc_ts": "2024-01-01T02:00:00Z"}',  # missing key
        ]
        with open(d + "/tasks.json", "w") as f:
            f.write("\n".join(lines))

        valid, invalid = read_parser_inputs_json(spark, d + "/tasks.json")
        assert valid.count() == 2
        assert {r["url"] for r in valid.collect()} == {
            "https://a.example/1",
            "https://a.example/2",
        }
        bad = [r["raw_record"] for r in invalid.collect()]
        assert len(bad) == 2
        assert any("not json" in b for b in bad)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_documents_schema_pinned(spark):
    import tempfile

    from navigator_document_parser_spark.sources.readers import read_documents
    from navigator_document_parser_spark.schema import DOCUMENTS_SCHEMA
    from navigator_document_parser_spark.sources.synth import synth_documents

    d = tempfile.mkdtemp(prefix="ndps-readers2-")
    try:
        synth_documents(spark, 10, 2).write.parquet(d + "/docs")
        df = read_documents(spark, d + "/docs")
        # nullability flags don't survive a parquet roundtrip; names and
        # types are the pinned contract
        assert [(f.name, f.dataType) for f in df.schema.fields] == [
            (f.name, f.dataType) for f in DOCUMENTS_SCHEMA.fields
        ]
        assert df.count() == 10
    finally:
        shutil.rmtree(d, ignore_errors=True)
