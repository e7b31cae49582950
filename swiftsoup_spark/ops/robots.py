"""robots.txt parsing + URL filtering (REP, RFC 9309) — crawl-pipeline
governance: drop URLs a site's robots.txt disallows before spending
extraction compute on them.

Parsing is PURE SQL (posexplode + two window functions + one groupBy —
no Python): comment strip, user-agent group detection (a group is a
maximal run of consecutive ``User-agent`` lines plus the rules under
it, per RFC 9309 §2.1), ``*``-group selection, and BOTH rule kinds —
``Disallow`` and ``Allow`` — collected as (prefix, allow) structs.
Matching implements the spec's precedence: the LONGEST matching rule
wins and Allow wins length ties; no matching rule means allowed. The
same plan renders as DuckDB SQL for the oracle.

Scope (documented): ``*``/``$`` wildcards inside rule paths are not
evaluated (rules containing them match as literal prefixes);
specific-UA groups are ignored (pipelines crawl as ``*``).

Scale: robots bodies are a per-HOST table (~10^7 rows next to 10^12
pages); the exploded line count stays corpus-small, the rule rollup is
one host-keyed groupBy, and filtering broadcasts the (host, rules)
table so the page-side scan stays map-only — the host-blocklist
pattern with an in-expression longest-match fold instead of an
equality.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from swiftsoup_spark.ops.urlnorm import _HOST_RE


def robots_rules(robots_df, host_col: str = "host",
                 content_col: str = "robots_txt"):
    """(host, robots_txt) -> (host, rules array<struct<p,a>>): the
    non-empty Allow/Disallow prefixes of every ``User-agent: *``
    group (``a`` = True for Allow)."""
    lines = robots_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n"))
        .alias("i", "raw"))
    t = lines.select(
        "host", "i",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"))
    t = t.select(
        "host", "i", "line",
        F.lower("line").startswith("user-agent:").alias("is_ua"),
        F.trim(F.expr("substr(line, instr(line, ':') + 1)")).alias("val"))
    w = Window.partitionBy("host").orderBy("i")
    t = t.withColumn(
        "new_grp",
        (F.col("is_ua")
         & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)))
        .cast("int"))
    t = t.withColumn("grp", F.sum("new_grp").over(w))
    rule = (F.when(~F.col("is_ua")
                   & F.lower("line").startswith("disallow:")
                   & (F.col("val") != ""),
                   F.struct(F.col("val").alias("p"),
                            F.lit(False).alias("a")))
            .when(~F.col("is_ua")
                  & F.lower("line").startswith("allow:")
                  & (F.col("val") != ""),
                  F.struct(F.col("val").alias("p"),
                           F.lit(True).alias("a"))))
    rules = (t.groupBy("host", "grp")
             .agg(F.max(F.when(F.col("is_ua") & (F.col("val") == "*"),
                               True).otherwise(False)).alias("star"),
                  F.sort_array(F.collect_list(rule)).alias("rules"))
             .filter(F.col("star") & (F.size("rules") > 0))
             .groupBy("host")
             .agg(F.array_sort(F.flatten(F.collect_list("rules")))
                  .alias("rules")))
    return rules


def robots_rules_sql(robots_cte: str) -> str:
    """DuckDB replay of :func:`robots_rules`; ``robots_cte`` selects
    (host, robots_txt)."""
    return f"""
WITH robots_src AS ({robots_cte}),
ln AS (
  SELECT host, i,
         trim(regexp_replace(l[CAST(i AS INTEGER)], '#.*$', '')) AS line
  FROM (SELECT host, string_split(robots_txt, chr(10)) AS l
        FROM robots_src),
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
t AS (
  SELECT host, i, line,
         starts_with(lower(line), 'user-agent:') AS is_ua,
         trim(substr(line, instr(line, ':') + 1)) AS val
  FROM ln),
g0 AS (
  SELECT *, CASE WHEN is_ua AND NOT coalesce(
                lag(is_ua) OVER (PARTITION BY host ORDER BY i), false)
            THEN 1 ELSE 0 END AS new_grp
  FROM t),
g AS (
  SELECT *, SUM(new_grp) OVER (PARTITION BY host ORDER BY i) AS grp
  FROM g0),
r AS (
  SELECT host, grp,
         max(CASE WHEN is_ua AND val = '*' THEN 1 ELSE 0 END) AS star,
         list_sort(list_filter(list(
             CASE WHEN NOT is_ua AND starts_with(lower(line), 'disallow:')
                       AND val <> ''
                  THEN {{'p': val, 'a': false}}
                  WHEN NOT is_ua AND starts_with(lower(line), 'allow:')
                       AND val <> ''
                  THEN {{'p': val, 'a': true}} END),
             x -> x IS NOT NULL)) AS rules
  FROM g GROUP BY host, grp)
SELECT host, list_sort(flatten(list(rules))) AS rules
FROM r WHERE star = 1 AND len(rules) > 0 GROUP BY host
"""


_PATH_OF = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"


def filter_robots(urls_df, rules_df, url_col: str = "url"):
    """Drop rows whose URL the host's rules disallow under RFC 9309
    precedence (longest matching prefix wins, Allow wins ties, no
    match = allowed). ``rules_df`` is (host, rules) from
    :func:`robots_rules` — broadcast, so the corpus side stays a
    map-only scan with an in-expression fold."""
    host = F.lower(F.regexp_extract(F.trim(F.col(url_col)), _HOST_RE, 1))
    path = F.regexp_extract(F.trim(F.col(url_col)), _PATH_OF, 1)
    joined = (urls_df
              .withColumn("__h", host).withColumn("__p", path)
              .join(F.broadcast(rules_df.withColumnRenamed("host", "__h")),
                    "__h", "left"))
    init = F.struct(F.lit(-1).alias("l"), F.lit(True).alias("a"))
    decision = F.aggregate(
        F.filter("rules", lambda r: F.col("__p").startswith(r["p"])),
        init,
        lambda acc, r: F.when(
            (F.length(r["p"]) > acc["l"])
            | ((F.length(r["p"]) == acc["l"]) & r["a"]),
            F.struct(F.length(r["p"]).alias("l"), r["a"].alias("a")))
        .otherwise(acc))
    blocked = F.col("rules").isNotNull() & ~decision["a"]
    return joined.filter(~blocked).drop("__h", "__p", "rules")


def robots_decision_sql(path_expr: str, rules_expr: str = "rules") -> str:
    """SQL boolean: is ``path_expr`` ALLOWED under ``rules_expr`` (a
    list<struct<p,a>> column) — DuckDB side of :func:`filter_robots`'s
    longest-match fold (arg_max over [length, allow] implements
    longest-wins with Allow on ties)."""
    # ordering packed into one scalar (DuckDB 1.0 arg_max takes no
    # composite key): longer prefix dominates, allow breaks ties
    return f"""coalesce((
  SELECT arg_max(_r.a,
                 length(_r.p) * 2 + CASE WHEN _r.a THEN 1 ELSE 0 END)
  FROM (SELECT unnest({rules_expr}) AS _r)
  WHERE starts_with({path_expr}, _r.p)), true)"""
