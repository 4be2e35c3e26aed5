"""robots.txt parsing and Robots-Exclusion-Protocol URL filtering.

A crawl-scale corpus pipeline must honor per-host robots policies both
at fetch time and retroactively (hosts change their policy; a compliant
corpus rebuild re-filters committed pages). This module provides:

  - ``parse_robots_txt``: a from-scratch parser for the robots.txt
    format (user-agent groups, Allow/Disallow lines, comments, blank
    lines, case-insensitive field names) — no external library.
  - ``robots_rules``: Arrow-batched extraction of rule rows from a
    DataFrame of (host, robots_txt) blobs, one robots file per host —
    robots files are tiny and per-HOST, so this pandas stage touches
    ~10^7 rows for the whole web, not 10^12.
  - ``robots_filter``: apply the rules to a URL table with simplified
    Google REP semantics: among the group's rules whose path-prefix
    matches, the LONGEST prefix wins; on a length tie Allow wins; no
    matching rule (or no rules for the host) means allowed.

100 TB shape: rules join URLs on host — a plain equi-join (rule tables
are small but host-skewed, so no window over host; the winner is picked
per URL, where cardinality is bounded by rules-per-host). The rule
table is usually broadcastable; no hint is forced so AQE decides.

Omissions (documented): wildcard '*' and '$' in paths and Crawl-delay
are not implemented; '*' patterns appear in a minority of robots files
and need a regex translation layer that would put a per-row regex
compile in the hot path.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = Tuple[str, str, str]  # (agent, rule_type, path_prefix)


def parse_robots_txt(content: str) -> List[Rule]:
    """Parse robots.txt text into (agent, 'allow'|'disallow', path) rows.

    Grammar per the de-facto standard: records are groups of
    ``User-agent`` lines followed by rule lines; a rule line belongs to
    every agent of its group (a rule line before any ``User-agent`` is
    outside every group and ignored, per REP); ``#`` starts a comment;
    field names are case-insensitive; an empty Disallow value means
    "allow everything" and yields no rule row.
    """
    rules: List[Rule] = []
    agents: List[str] = []
    seen_rule_in_group = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if seen_rule_in_group:
                agents = []
                seen_rule_in_group = False
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            seen_rule_in_group = True
            if not agents:
                continue  # rule outside any User-agent group: ignored (REP)
            if not value:
                continue  # empty Disallow: == allow all: no rule row
            for a in agents:
                rules.append((a, field, value))
    return rules


def robots_rules(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> exploded rule rows
    (host, agent, rule_type, path_prefix) via one Arrow-batched stage."""
    out_schema = (
        f"{host_col} string, agent string, rule_type string, "
        "path_prefix string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, agents, types, paths = [], [], [], []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                for agent, rule_type, path in parse_robots_txt(txt or ""):
                    hosts.append(host)
                    agents.append(agent)
                    types.append(rule_type)
                    paths.append(path)
            yield pd.DataFrame(
                {
                    host_col: pd.Series(hosts, dtype="object"),
                    "agent": pd.Series(agents, dtype="object"),
                    "rule_type": pd.Series(types, dtype="object"),
                    "path_prefix": pd.Series(paths, dtype="object"),
                }
            )

    return df.select(host_col, txt_col).mapInPandas(gen, out_schema)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Flag each URL row allowed/blocked under ``agent``'s rules.

    REP group selection: for each HOST, the agent-specific group applies
    when one exists; otherwise the host's '*' group applies (a specific
    agent never mixes with the wildcard group).

    Returns (id_col, host, path, allowed, match_len) where match_len is
    the winning rule's prefix length (0 = no rule matched).
    """
    al = agent.lower()
    specific = rules.filter(F.col("agent") == al)
    if al == "*":
        effective = specific
    else:
        star = rules.filter(F.col("agent") == "*")
        hosts_specific = specific.select(host_col).dropDuplicates()
        effective = specific.unionByName(
            star.join(hosts_specific, host_col, "left_anti")
        )
    r = effective.select(
        F.col(host_col).alias("_rhost"),
        "rule_type",
        "path_prefix",
        F.length("path_prefix").alias("_plen"),
    )
    j = urls.join(
        r,
        (F.col(host_col) == F.col("_rhost"))
        & F.col(path_col).startswith(F.col("path_prefix")),
        "left",
    )
    # longest prefix wins; tie -> allow; encode as max(struct(len, allow))
    cand = j.withColumn(
        "_pick",
        F.when(
            F.col("path_prefix").isNotNull(),
            F.struct(
                F.col("_plen").alias("l"),
                (F.col("rule_type") == "allow").alias("a"),
            ),
        ),
    )
    best = cand.groupBy(id_col, host_col, path_col).agg(
        F.max("_pick").alias("_best")
    )
    return best.select(
        id_col,
        host_col,
        path_col,
        F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("_best.l"), F.lit(0))
        .cast("bigint")
        .alias("match_len"),
    )


def oracle_robots_filter(
    rules: List[Tuple[str, str, str, str]],
    url_rows_sql: str,
    agent: str = "*",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL computing exactly robots_filter() for a literal rule
    list [(host, agent, rule_type, path_prefix)] over ``url_rows_sql``
    (a query producing (doc_id, host, path))."""
    from navigator_document_parser_spark.operators import sql_quote

    vals = ", ".join(
        f"({sql_quote(h)}, {sql_quote(a)}, {sql_quote(t)}, {sql_quote(p)})"
        for h, a, t, p in rules
    )
    al = agent.lower()
    return f"""
        WITH rules(host, agent, rule_type, path_prefix) AS (
          VALUES {vals}
        ), spec AS (
          SELECT * FROM rules WHERE agent = '{al}'
        ), eff AS (
          SELECT * FROM spec
          UNION ALL
          SELECT * FROM rules r
          WHERE r.agent = '*' AND '{al}' <> '*'
            AND r.host NOT IN (SELECT host FROM spec)
        ), urls AS ({url_rows_sql}
        ), cand AS (
          SELECT u.{id_col}, u.host, u.path,
                 r.rule_type, length(r.path_prefix) AS plen
          FROM urls u
          LEFT JOIN eff r
            ON u.host = r.host
           AND prefix(u.path, r.path_prefix)
        ), ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY {id_col}, host, path
                   ORDER BY (rule_type IS NOT NULL) DESC, plen DESC,
                            (rule_type = 'allow') DESC) AS rn
          FROM cand
        )
        SELECT {id_col}, host, path,
               CASE WHEN rule_type IS NULL THEN TRUE
                    ELSE rule_type = 'allow' END AS allowed,
               CAST(coalesce(plen, 0) AS BIGINT) AS match_len
        FROM ranked WHERE rn = 1
    """


def robots_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap discovery from robots.txt — the ``Sitemap:`` directive
    (RFC 9309 §2.3: location-independent, outside user-agent groups,
    repeatable) is how crawlers find a host's sitemaps without
    guessing; the output feeds sources/sitemap.parse_sitemap and the
    crawl_plan funnel.

    Pure built-ins over exploded lines (no pandas stage — unlike the
    rule grammar, this directive has no group state): strip the
    comment tail, split on the FIRST colon, case-insensitive field
    match, non-empty value. Map-only, zero shuffle.

    Returns (host, sitemap_url).
    """
    # split on \r?\n: CRLF robots.txt is the common real-world case
    # and trim() strips spaces only, so a surviving \r would corrupt
    # every discovered url (review finding; parse_robots_txt's
    # splitlines() already handles this on the rules side)
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(content_col), r"\r?\n")).alias("raw"),
    )
    l = F.trim(F.expr("split_part(raw, '#', 1)"))
    field = F.lower(F.trim(F.regexp_extract(l, "^([^:]*):", 1)))
    value = F.trim(F.regexp_extract(l, "^[^:]*:(.*)$", 1))
    return (
        lines.select("host", field.alias("f"), value.alias("sitemap_url"))
        .filter((F.col("f") == "sitemap") & (F.col("sitemap_url") != ""))
        .drop("f")
    )


def oracle_robots_sitemaps(robots_sql: str) -> str:
    """DuckDB replica of robots_sitemaps; ``robots_sql`` yields
    (host, robots_txt)."""
    return f"""
        WITH r AS ({robots_sql}),
        lines AS (
          SELECT host,
                 trim(split_part(unnest(string_split_regex(
                      robots_txt, '\r?\n')), '#', 1)) AS l
          FROM r
        ), fields AS (
          SELECT host,
                 lower(trim(regexp_extract(l, '^([^:]*):', 1))) AS f,
                 trim(regexp_extract(l, '^[^:]*:(.*)$', 1))
                   AS sitemap_url
          FROM lines
        )
        SELECT host, sitemap_url
        FROM fields
        WHERE f = 'sitemap' AND sitemap_url <> ''
    """
