"""Operator library (dedup / similarity / text / selection / graph /
multimodal / urls / robots / search / joins).

Shared helper for the DuckDB oracle renderers: caller-supplied strings
(query terms, rule paths, blocklist words) are embedded as SQL literals,
so embedded single quotes must be doubled or the rendered oracle is
broken/altered SQL.
"""


def sql_quote(s: str) -> str:
    """Render ``s`` as a single-quoted ANSI SQL string literal."""
    return "'" + str(s).replace("'", "''") + "'"


def md5_u32_sql(inner: str, dialect: str) -> str:
    """The repo's ONE portable 32-bit hash: the first 8 hex chars of
    md5(<inner>) as a BIGINT in [0, 2^32). ``inner`` is a SQL string
    expression rendered verbatim (add seeds/casts in the caller).
    Spark spells the conversion conv(...,16,10); DuckDB casts a '0x'
    literal — everything downstream (Bloom positions, shard and worker
    assignment, sketch registers, samplers) derives from this single
    definition so the Spark/DuckDB parity contract lives in one place.
    """
    if dialect == "spark":
        return (
            f"cast(conv(substring(md5({inner}), 1, 8), 16, 10) as bigint)"
        )
    if dialect == "duckdb":
        return (
            f"CAST('0x' || substring(md5({inner}), 1, 8) AS BIGINT)"
        )
    raise ValueError(f"unknown dialect {dialect!r}")
