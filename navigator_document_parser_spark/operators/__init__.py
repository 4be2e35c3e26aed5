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
