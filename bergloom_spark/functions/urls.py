"""URL analysis functions (scan-side, whole-stage codegen) — the
column battery a crawl pipeline runs right after WARC record
extraction: scheme/host/path split, registrable-domain grouping for
per-site dedup and quotas, and tracking-parameter-stripping
normalization so near-identical URLs dedup exactly.

Every function is a pure ``pyspark.sql.functions`` expression chain
with a DuckDB ``_sql`` twin built from the SAME pattern constants —
the engine-portability rules from ``functions/text.py`` apply (no
``\\s``, no lookaround, no backreferences: Java regex and RE2 must
agree byte-for-byte).

Scope honesty: ``url_registrable_domain`` is the last-N-labels
approximation, NOT a Public Suffix List lookup (the PSL is a
9,000-rule moving dataset; shipping a stale copy silently mis-groups
``*.co.uk`` — so the multi-label suffixes a deployment cares about
are an explicit argument instead)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_scheme",
    "url_scheme_sql",
    "url_host",
    "url_host_sql",
    "url_path",
    "url_path_sql",
    "url_query",
    "url_query_sql",
    "url_registrable_domain",
    "url_registrable_domain_sql",
    "url_normalize",
    "url_normalize_sql",
    "url_resolve",
]

# RFC 3986 shapes, engine-portable (shared by both engines verbatim)
_SCHEME_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# authority: optional userinfo@; host is a bracketed IPv6 literal
# (kept whole, brackets included) or stops at :/?# (review r10: the
# colon-terminated class alone truncated '[2001:db8::1]' to '[2001')
_HOST_PAT = (
    r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?"
    r"(\[[^\]/?#]*\]|[^/?#:]+)"
)
# path: everything between the authority and ?/#
_PATH_PAT = (
    r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
)
# query must PRECEDE any '#': anchor through the non-'#' prefix so a
# '?' inside the fragment can never fake a query (review r10)
_QUERY_PAT = r"^[^#]*?\?([^#]*)"
# one tracking param (utm_*, gclid, fbclid) with its leading & —
# applied to the EXTRACTED query prefixed with '&', never to the
# whole URL (a literal '&' in a path must not look like a separator)
_TRACKING_PAT = r"&(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme (``https``), NULL-safe: non-URL strings
    yield an empty string (regexp_extract's no-match value)."""
    return F.lower(F.regexp_extract(_c(col), _SCHEME_PAT, 1))


def url_scheme_sql(expr: str) -> str:
    return f"lower(coalesce(regexp_extract({expr}, '{_SCHEME_PAT}', 1), ''))"


def url_host(col: Column | str) -> Column:
    """Lower-cased host from the authority (userinfo and port
    stripped; a trailing root-dot FQDN form is normalized away —
    ``example.com.`` and ``example.com`` are the same DNS name)."""
    h = F.lower(F.regexp_extract(_c(col), _HOST_PAT, 1))
    return F.regexp_replace(h, r"\.$", "")


def url_host_sql(expr: str) -> str:
    h = f"lower(coalesce(regexp_extract({expr}, '{_HOST_PAT}', 1), ''))"
    return f"regexp_replace({h}, '\\.$', '')"


def url_path(col: Column | str) -> Column:
    """Path component (leading ``/`` kept; empty when absent)."""
    return F.regexp_extract(_c(col), _PATH_PAT, 1)


def url_path_sql(expr: str) -> str:
    return f"coalesce(regexp_extract({expr}, '{_PATH_PAT}', 1), '')"


def url_query(col: Column | str) -> Column:
    """Query string without the ``?`` (empty when absent)."""
    return F.regexp_extract(_c(col), _QUERY_PAT, 1)


def url_query_sql(expr: str) -> str:
    return f"coalesce(regexp_extract({expr}, '{_QUERY_PAT}', 1), '')"


def url_registrable_domain(
    col: Column | str, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Last-two-labels site key (``sub.news.example.com`` →
    ``example.com``) for per-site grouping; hosts matching an entry
    of ``extra_suffixes`` (e.g. ``("co.uk", "com.au")``) keep three
    labels. Dotless hosts (``localhost``), IPv4 literals, and
    bracketed IPv6 literals pass through whole (review r10: the
    last-2-labels rule reduced ``192.168.0.1`` to ``0.1``, merging
    unrelated IP-hosted sites). The per-site quota/dedup operators
    group on this key, so it must shuffle as a short string — it
    does (≤ the host length)."""
    host = url_host(col)
    out = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    for suf in extra_suffixes:
        pat = r"([^.]+\." + suf.replace(".", r"\.") + r")$"
        out = F.when(
            host.rlike(r"\." + suf.replace(".", r"\.") + r"$"),
            F.regexp_extract(host, pat, 1),
        ).otherwise(out)
    literal = host.rlike(r"^(\d+\.\d+\.\d+\.\d+|\[[^\]]*\])$")
    return F.when(literal | (out == ""), host).otherwise(out)


def url_registrable_domain_sql(
    expr: str, extra_suffixes: tuple[str, ...] = ()
) -> str:
    host = url_host_sql(expr)
    out = f"coalesce(regexp_extract({host}, '([^.]+\\.[^.]+)$', 1), '')"
    for suf in extra_suffixes:
        esc = suf.replace(".", "\\.")
        out = (
            f"CASE WHEN regexp_matches({host}, '\\.{esc}$') "
            f"THEN regexp_extract({host}, '([^.]+\\.{esc})$', 1) "
            f"ELSE {out} END"
        )
    literal = (
        f"regexp_matches({host}, "
        "'^(\\d+\\.\\d+\\.\\d+\\.\\d+|\\[[^\\]]*\\])$')"
    )
    return (
        f"CASE WHEN {literal} OR {out} = '' THEN {host} "
        f"ELSE {out} END"
    )


def url_resolve(base: Column | str, ref: Column | str) -> Column:
    """Resolve a (possibly relative) reference against a base URL —
    RFC 3986 §5 merge via the stdlib resolver, as an Arrow-batched
    pandas UDF (the dot-segment/authority case analysis is genuinely
    conditional logic, not a regexp). This is the step between
    :func:`bergloom_spark.functions.html.html_links` output and any
    link-graph aggregation: hrefs in the wild are mostly relative.
    NULL base or ref yields NULL. No SQL twin (DuckDB has no
    resolver) — queries built on it register rows-only, or pin
    absolute-URL recipes."""
    from urllib.parse import urljoin

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # no annotations: `from __future__ import annotations` turns
    # them into strings pandas_udf cannot resolve against the local
    # scope; the explicit returnType carries the contract
    @pandas_udf(StringType())
    def _resolve(b, r):
        return pd.Series(
            [
                None if bb is None or rr is None else urljoin(bb, rr)
                for bb, rr in zip(b, r)
            ]
        )

    return _resolve(_c(base), _c(ref))


def url_normalize(col: Column | str) -> Column:
    """Dedup-grade normalization, applied in a fixed order each side
    replays exactly:

    1. lower-case the scheme and host (path case is significant);
    2. drop the fragment;
    3. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``)
       INSIDE the extracted query component only — a literal ``&``
       in the path can never be mistaken for a separator (review
       r10: the whole-URL formulation corrupted ``/a&b`` paths);
    4. drop a now-empty ``?`` and a default port (``:80``/``:443``);
    5. drop a bare trailing ``/`` on an empty path.

    Pure regexp_replace chain — zero shuffle, zero Python."""
    out = _c(col)
    # 1: lowercase scheme://host (userinfo/port included — ports are
    # digits and userinfo is conventionally case-sensitive, but for
    # dedup the lowercase key wins; concat the lowered prefix with
    # the untouched remainder)
    prefix = F.regexp_extract(out, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(out, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # trailing root-dot FQDN normalization, same rule as url_host
    # (review r10 pass 3: the dedup key and the site key must agree
    # on 'example.com.' vs 'example.com'); the dot may sit before a
    # port
    prefix = F.regexp_replace(F.lower(prefix), r"\.(:\d+)?$", r"$1")
    out = F.concat(prefix, rest)
    out = F.regexp_replace(out, r"#.*$", "")  # 2
    # 3: split at the FIRST '?', clean the query in isolation with
    # every param uniformly '&'-prefixed, and reassemble
    pre_q = F.regexp_replace(out, r"\?.*$", "")
    qs = F.regexp_extract(out, r"\?(.*)$", 1)
    cleaned = F.regexp_replace(F.concat(F.lit("&"), qs),
                               _TRACKING_PAT, "")
    out = F.when(
        ~out.rlike(r"\?"), out  # no query at all: untouched
    ).when(
        # query fully stripped ('' ) or was empty to begin with ('&')
        (cleaned == "") | (cleaned == "&"), pre_q
    ).otherwise(
        F.concat(pre_q, F.lit("?"),
                 cleaned.substr(F.lit(2), F.length(cleaned)))
    )
    out = F.regexp_replace(
        out, r"^(https://[^/?#]*):443(/|\?|$)", r"$1$2"
    )
    out = F.regexp_replace(
        out, r"^(http://[^/?#]*):80(/|\?|$)", r"$1$2"
    )
    # 5: bare trailing slash on an EMPTY path only — /x/ and /x are
    # distinct resources, but host/ and host are the same URL
    out = F.regexp_replace(
        out, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)/$", r"$1"
    )
    return out


def url_normalize_sql(expr: str) -> str:
    """DuckDB twin — same steps, same order. DuckDB regexp_replace
    uses ``\\1`` backreferences and needs the 'g' flag only where
    Spark's regexp_replace (always-global) relies on it."""
    prefix = (
        f"lower(coalesce(regexp_extract({expr}, "
        f"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1), ''))"
    )
    rest = (
        f"regexp_replace({expr}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    )
    prefix = f"regexp_replace({prefix}, '\\.(:\\d+)?$', '\\1')"
    out = f"({prefix} || {rest})"
    out = f"regexp_replace({out}, '#.*$', '')"
    pre_q = f"regexp_replace({out}, '\\?.*$', '')"
    qs = f"coalesce(regexp_extract({out}, '\\?(.*)$', 1), '')"
    cleaned = (
        f"regexp_replace('&' || {qs}, '{_TRACKING_PAT}', '', 'g')"
    )
    out = (
        f"CASE WHEN NOT regexp_matches({out}, '\\?') THEN {out} "
        f"WHEN {cleaned} IN ('', '&') THEN {pre_q} "
        f"ELSE {pre_q} || '?' || ({cleaned})[2:] END"
    )
    out = (
        f"regexp_replace({out}, "
        f"'^(https://[^/?#]*):443(/|\\?|$)', '\\1\\2')"
    )
    out = (
        f"regexp_replace({out}, "
        f"'^(http://[^/?#]*):80(/|\\?|$)', '\\1\\2')"
    )
    out = (
        f"regexp_replace({out}, "
        f"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)/$', '\\1')"
    )
    return out
