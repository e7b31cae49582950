"""URL canonicalization + canonical-URL dedup for web-crawl pipelines.

Common-Crawl-scale corpora reach ~10^12 rows keyed by url; the first
dedup pass is *canonical-URL* collapse (the same page crawled as
``HTTP://Example.com:80/a/../b?utm_source=x&id=1#frag`` and
``http://example.com/b?id=1``). Canonicalization here is a pure per-row
string expression — scheme/host lowercasing, default-port strip,
userinfo-preserving host extraction, bounded dot-segment resolution,
tracking-parameter removal, query-parameter sort, fragment drop — built
ONCE as a step table and rendered twice: as a Spark ``Column`` (JVM
codegen, zero Python, zero shuffle) and as the byte-identical DuckDB SQL
replay, so the whole operator is oracle-gated.

Dialect constraints honored on both sides: no lookaround and no
backreference replacements (DuckDB is RE2), explicit ``'g'`` flag in
DuckDB where Spark's ``regexp_replace`` is always-global, and the
"segment that is not ``.`` or ``..``" class written out as an
alternation (1-char not-dot | 2-char not-dot-dot | any 3+).

Deviations from RFC 3986, documented: dot segments resolve through a
fixed number of rewrite passes (``DOT_PASSES``; paths nested deeper than
~2^passes unresolved ``..`` levels keep their residue — crawl URLs in
practice resolve in 2-3), and percent-encoding is left untouched (no
%41→A decode; case-sensitive compare of encodings is the safe default
for dedup keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# query parameters that never affect page identity (tracking/attribution)
TRACKING_EXACT = ["gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
                  "igshid", "ref", "ref_src", "spm"]
TRACKING_PREFIX = ["utm_"]

# a path segment that is neither "." nor "..": 1 char not '.', 2 chars
# not both '.', or any 3+ chars (no lookahead — RE2-safe)
_SEG = r"(?:[^/.]|\.[^/.]|[^/.][^/]|[^/][^/][^/]+)"
DOT_PASSES = 6

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _is_tracking_cond(key_col):
    cond = key_col.isin(TRACKING_EXACT)
    for p in TRACKING_PREFIX:
        cond = cond | key_col.startswith(p)
    return cond


def canonical_url(col):
    """Spark Column: canonical form of an absolute http(s)/ftp URL;
    inputs without a ``scheme://`` prefix pass through trimmed."""
    url = F.trim(col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", "")).otherwise(
        F.when((scheme == "https") & host.endswith(":443"),
               F.regexp_replace(host, ":443$", "")).otherwise(host))
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    for _ in range(DOT_PASSES):
        path = F.replace(path, F.lit("/./"), F.lit("/"))
        path = F.regexp_replace(path, r"/\.$", "/")
        path = F.regexp_replace(path, "/" + _SEG + r"/\.\./", "/")
        path = F.regexp_replace(path, "/" + _SEG + r"/\.\.$", "/")
        path = F.regexp_replace(path, r"^/\.\./", "/")
        path = F.regexp_replace(path, r"^/\.\.$", "/")
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~_is_tracking_cond(
            F.regexp_extract(x, "^([^=]*)", 1)))
    qjoin = F.array_join(F.array_sort(params), "&")
    qpart = F.when(qjoin == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                              qjoin))
    return (F.when(scheme == "", url)
            .otherwise(F.concat(scheme, F.lit("://"), host, path, qpart)))


def canonical_url_sql(expr: str) -> str:
    """The DuckDB replay of :func:`canonical_url` over SQL ``expr`` —
    generated from the same regex/step constants."""
    url = f"trim({expr})"
    # DuckDB regexp_extract is NULL on no-match where Spark returns '' —
    # every extract is coalesced so the two dialects agree
    scheme = f"lower(coalesce(regexp_extract({url}, '{_SCHEME_RE}', 1), ''))"
    host0 = (f"regexp_replace(lower(coalesce("
             f"regexp_extract({url}, '{_HOST_RE}', 1), '')),"
             f" '\\.$', '')")
    host = (f"CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
            f"THEN regexp_replace({host0}, ':80$', '') "
            f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
            f"THEN regexp_replace({host0}, ':443$', '') "
            f"ELSE {host0} END")
    path0 = f"coalesce(regexp_extract({url}, '{_PATH_RE}', 1), '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    seg = _SEG
    for _ in range(DOT_PASSES):
        path = f"replace({path}, '/./', '/')"
        path = f"regexp_replace({path}, '/\\.$', '/', 'g')"
        path = f"regexp_replace({path}, '/{seg}/\\.\\./', '/', 'g')"
        path = f"regexp_replace({path}, '/{seg}/\\.\\.$', '/', 'g')"
        path = f"regexp_replace({path}, '^/\\.\\./', '/', 'g')"
        path = f"regexp_replace({path}, '^/\\.\\.$', '/', 'g')"
    query = f"coalesce(regexp_extract({url}, '{_QUERY_RE}', 1), '')"
    track = " OR ".join(
        [f"regexp_extract(x, '^([^=]*)', 1) = '{k}'" for k in TRACKING_EXACT]
        + [f"starts_with(regexp_extract(x, '^([^=]*)', 1), '{p}')"
           for p in TRACKING_PREFIX])
    params = (f"list_filter(string_split({query}, '&'), "
              f"x -> x <> '' AND NOT ({track}))")
    # array_to_string([]) is NULL in DuckDB, '' in Spark's array_join
    qjoin = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    qpart = f"CASE WHEN {qjoin} = '' THEN '' ELSE '?' || {qjoin} END"
    return (f"CASE WHEN {scheme} = '' THEN {url} "
            f"ELSE {scheme} || '://' || {host} || {path} || {qpart} END")


def url_dedup(df, url_col: str = "url"):
    """Canonical-URL collapse: (canon_url, rep_url, n_variants) — one
    representative (lexicographically smallest raw url) per canonical
    group. One hash-partitioned groupBy on the canonical string; the
    canonicalization itself is map-side codegen, so this is exactly the
    exact-dedup shuffle shape with a smarter key."""
    return (df.select(canonical_url(F.col(url_col)).alias("canon_url"),
                      F.col(url_col).alias("u"))
            .groupBy("canon_url")
            .agg(F.min("u").alias("rep_url"),
                 F.count("*").alias("n_variants")))


def host_of(col):
    """Lowercased host (port kept, userinfo stripped) of an absolute
    URL; '' when there is no ``scheme://``."""
    return F.lower(F.regexp_extract(F.trim(col), _HOST_RE, 1))


_LAST2_RE = r"([^.]+\.[^.]+)$"
_LAST3_RE = r"([^.]+\.[^.]+\.[^.]+)$"
_LAST4_RE = r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$"


def registered_domain(col):
    """eTLD+1 of the URL's host — the per-site grouping key. Ports are
    stripped; the Public Suffix List (curated subset, ``psl_data.py``,
    regenerable via ``scripts/gen_psl.py``) decides how many labels the
    public suffix takes: a host ending in a listed 3-label suffix keeps
    4 labels, a listed 2-label suffix (``co.uk``/``com.au``/...) keeps
    3, anything else keeps 2 (the PSL default ``*`` rule: every bare
    TLD is a public suffix). A host that IS a public suffix yields ''.
    Pure codegen — the tuples render as IN-lists (Catalyst InSet), so
    this stays a zero-shuffle map-side expression at 10^12 rows."""
    from swiftsoup_spark.ops.psl_data import PSL2, PSL3
    host = F.regexp_replace(host_of(col), r":\d+$", "")
    last2 = F.regexp_extract(host, _LAST2_RE, 1)
    last3 = F.regexp_extract(host, _LAST3_RE, 1)
    last4 = F.regexp_extract(host, _LAST4_RE, 1)
    return (F.when(last3.isin(list(PSL3)), last4)
            .when(last2.isin(list(PSL2)), last3)
            .otherwise(last2))


def registered_domain_sql(expr: str) -> str:
    """DuckDB replay of :func:`registered_domain` over SQL ``expr`` —
    rendered from the same PSL tables and regexes."""
    from swiftsoup_spark.ops.psl_data import PSL2, PSL3
    host = (f"regexp_replace(lower(coalesce(regexp_extract("
            f"trim({expr}), '{_HOST_RE}', 1), '')), ':[0-9]+$', '')")
    last2 = f"coalesce(regexp_extract({host}, '{_LAST2_RE}', 1), '')"
    last3 = f"coalesce(regexp_extract({host}, '{_LAST3_RE}', 1), '')"
    last4 = f"coalesce(regexp_extract({host}, '{_LAST4_RE}', 1), '')"
    in3 = ", ".join(f"'{s}'" for s in PSL3)
    in2 = ", ".join(f"'{s}'" for s in PSL2)
    return (f"CASE WHEN {last3} IN ({in3}) THEN {last4} "
            f"WHEN {last2} IN ({in2}) THEN {last3} "
            f"ELSE {last2} END")


def filter_host_blocklist(df, blocked_df, url_col: str = "url"):
    """Drop rows whose URL host is on the blocklist. The blocklist is a
    curated table (thousands of rows at most) — broadcast it and
    anti-join, so the 10^12-row corpus side stays a map-only scan."""
    blocked = F.broadcast(blocked_df.select(F.lower("host").alias("__bh")))
    return (df.withColumn("__h", host_of(F.col(url_col)))
            .join(blocked, F.col("__h") == F.col("__bh"), "left_anti")
            .drop("__h"))


def url_path_templates(df, url_col: str = "url"):
    """Crawler-trap / URL-space mining: collapse numeric path runs to
    '{n}' and count urls per (host, template). Hosts whose url count
    concentrates in one unbounded template (calendar pages, session
    ids, pagination) are the classic infinite-crawl traps; the
    template table is also the input for per-site sampling caps.
    Map-side codegen (two regexes) + ONE groupBy of short strings —
    text never rides the shuffle."""
    path = F.regexp_extract(F.trim(F.col(url_col)), _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tmpl = F.regexp_replace(path, "[0-9]+", "{n}")
    return (df.select(host_of(F.col(url_col)).alias("host"),
                      tmpl.alias("template"))
            .groupBy("host", "template")
            .agg(F.count("*").alias("n_urls")))


def url_path_templates_sql(url_expr: str, table: str = "documents") -> str:
    """DuckDB replay of :func:`url_path_templates`."""
    url = f"trim({url_expr})"
    path0 = f"coalesce(regexp_extract({url}, '{_PATH_RE}', 1), '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    tmpl = f"regexp_replace({path}, '[0-9]+', '{{n}}', 'g')"
    host = f"lower(coalesce(regexp_extract({url}, '{_HOST_RE}', 1), ''))"
    return f"""
SELECT {host} AS host, {tmpl} AS template,
       CAST(count(*) AS BIGINT) AS n_urls
FROM {table} GROUP BY 1, 2
"""
