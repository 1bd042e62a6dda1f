"""HTML structure-extraction functions (scan-side, whole-stage
codegen) — what a crawl pipeline pulls from a page BESIDES the clean
text that :func:`bergloom_spark.functions.text.strip_markup`
produces: the <title>, outbound links, meta description/robots, and
canonical URL. Link extraction feeds the per-site graphs and
crawl-frontier statistics; canonical URLs feed dedup.

Same engine-portability contract as ``text.py`` / ``urls.py``: every
pattern runs byte-identically under Java regex (Spark) and RE2
(DuckDB) — no ``\\s``, no lookaround, no backreferences — and every
function ships a ``_sql`` twin built from the SAME constants.

Scope honesty: these are regex extractors for the well-formed-enough
HTML a crawl actually contains, not an HTML5 tree builder —
attribute order variations and quote styles are handled, CDATA
tricks and comments-inside-tags are not (a page that defeats the
regex yields empty string / empty array, never a wrong crash)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "html_title",
    "html_title_sql",
    "html_links",
    "html_links_sql",
    "html_meta_content",
    "html_meta_content_sql",
    "html_canonical",
    "html_canonical_sql",
]

# (?is) — dot-all + case-insensitive, supported by both engines
_TITLE_PAT = r"(?is)<title[^>]*>(.*?)</title>"
_HREF_PAT = (
    r"(?i)<a[^>]*[ \t\n\r]href[ \t\n\r]*=[ \t\n\r]*"
    r"(\"[^\"]*\"|'[^']*')"
)
_CANON_PAT = (
    r"(?is)<link[^>]*rel[ \t\n\r]*=[ \t\n\r]*"
    r"[\"']?canonical[\"']?[^>]*href[ \t\n\r]*=[ \t\n\r]*"
    r"[\"']([^\"']*)[\"']"
)
# href-before-rel attribute order (review r10: as common in the
# wild as the rel-first form)
_CANON_PAT_REV = (
    r"(?is)<link[^>]*href[ \t\n\r]*=[ \t\n\r]*"
    r"[\"']([^\"']*)[\"'][^>]*rel[ \t\n\r]*=[ \t\n\r]*"
    r"[\"']?canonical[\"']?"
)


def _meta_pat(name: str) -> str:
    # <meta name="NAME" ... content="..."> (name-first ordering; the
    # content-first variant is matched by the second alternative)
    return (
        r"(?is)<meta[^>]*name[ \t\n\r]*=[ \t\n\r]*[\"']" + name
        + r"[\"'][^>]*content[ \t\n\r]*=[ \t\n\r]*[\"']([^\"']*)[\"']"
    )


def _meta_pat_rev(name: str) -> str:
    return (
        r"(?is)<meta[^>]*content[ \t\n\r]*=[ \t\n\r]*"
        r"[\"']([^\"']*)[\"'][^>]*name[ \t\n\r]*=[ \t\n\r]*[\"']"
        + name + r"[\"']"
    )


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _q(pat: str) -> str:
    """Escape a pattern for embedding in a single-quoted SQL string
    literal (the href/canonical patterns contain quote characters)."""
    return pat.replace("'", "''")


def html_title(col: Column | str) -> Column:
    """First <title> text, inner whitespace collapsed and trimmed;
    empty string when absent."""
    t = F.regexp_extract(_c(col), _TITLE_PAT, 1)
    return F.trim(F.regexp_replace(t, r"[ \t\n\r\f]+", " "))


def html_title_sql(expr: str) -> str:
    t = f"coalesce(regexp_extract({expr}, '{_q(_TITLE_PAT)}', 1), '')"
    return (
        f"trim(regexp_replace({t}, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    )


def html_links(col: Column | str) -> Column:
    """All <a href> targets in document order as ``array<string>``
    (quotes stripped). ``regexp_extract_all`` keeps this scan-side —
    the array explodes AFTER the scan, so page bytes never shuffle
    to find links."""
    quoted = F.regexp_extract_all(_c(col), F.lit(_HREF_PAT), F.lit(1))
    return F.transform(
        quoted, lambda s: s.substr(F.lit(2), F.length(s) - 2)
    )


def html_links_sql(expr: str) -> str:
    return (
        f"list_transform(regexp_extract_all({expr}, "
        f"'{_q(_HREF_PAT)}', 1), s -> s[2:-2])"
    )


def _first_nonempty(col: Column, fwd_pat: str, rev_pat: str) -> Column:
    """Shared both-attribute-orders combinator: the forward-order
    extract wins, the reverse-order form is the fallback."""
    fwd = F.regexp_extract(col, fwd_pat, 1)
    rev = F.regexp_extract(col, rev_pat, 1)
    return F.when(fwd != "", fwd).otherwise(rev)


def _first_nonempty_sql(expr: str, fwd_pat: str, rev_pat: str) -> str:
    fwd = f"coalesce(regexp_extract({expr}, '{_q(fwd_pat)}', 1), '')"
    rev = f"coalesce(regexp_extract({expr}, '{_q(rev_pat)}', 1), '')"
    return f"CASE WHEN {fwd} <> '' THEN {fwd} ELSE {rev} END"


def html_meta_content(col: Column | str, name: str) -> Column:
    """content= of ``<meta name="...">`` (description, robots,
    keywords…); handles both attribute orders; empty when absent."""
    return _first_nonempty(_c(col), _meta_pat(name),
                           _meta_pat_rev(name))


def html_meta_content_sql(expr: str, name: str) -> str:
    return _first_nonempty_sql(expr, _meta_pat(name),
                               _meta_pat_rev(name))


def html_canonical(col: Column | str) -> Column:
    """href of ``<link rel="canonical">`` — the dedup key the page
    itself declares; both attribute orders; empty when absent."""
    return _first_nonempty(_c(col), _CANON_PAT, _CANON_PAT_REV)


def html_canonical_sql(expr: str) -> str:
    return _first_nonempty_sql(expr, _CANON_PAT, _CANON_PAT_REV)
