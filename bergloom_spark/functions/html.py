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


# ---------------------------------------------------------------------------
# Main-content extraction (round 11, verdict r10 stretch #9): a
# jusText/Arria-style block classifier — strip_markup de-tags a page;
# this keeps only the blocks that READ like article text. Public
# heuristics (Pomikálek's jusText thesis, boilerpipe paper): segment
# at block-level tags, score each block by text length and LINK
# DENSITY (boilerplate nav/footer blocks are mostly anchor text),
# keep the good blocks. Implemented entirely with higher-order
# functions (split → transform → filter → array_join) so the whole
# pass is one JVM stage — no shuffle, no Python, and the DuckDB twin
# mirrors it with list_transform/list_filter.
# ---------------------------------------------------------------------------
_BLOCK_SPLIT_PAT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|td|th|tr|table|blockquote|pre|"
    r"section|article|header|footer|nav|aside|main|figure|br)"
    r"[^>]*>"
)
# Tag name must be anchored: bare `<a[^>]*>` also matched <abbr>,
# <address>, <audio>, <area>, whose spans swallowed genuine prose into
# the link-density numerator (ADVICE r11). `(?:\s[^>]*)?` means "end of
# tag name or attributes", never "more name letters".
_ANCHOR_INNER_PAT = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
_PRE_STRIP_STEPS = [
    # <head> first: its text content (title, inline meta noise) is
    # never article text, and <title>/<head> are not block-level
    # split points — without this pre-strip every real page leaked
    # its title as a leading "content" block (r11 self-review)
    (r"(?is)<head[^>]*>.*?</head>", " "),
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
]
_TAG_PAT = r"<[^>]*>"
_WS_RUN = r"[ \t\n\r\f]+"


def _block_text(b: Column) -> Column:
    """De-tagged, whitespace-collapsed text of one block."""
    t = F.regexp_replace(b, _TAG_PAT, " ")
    return F.trim(F.regexp_replace(t, _WS_RUN, " "))


def _block_text_sql(expr: str) -> str:
    t = f"regexp_replace({expr}, '{_TAG_PAT}', ' ', 'g')"
    return f"trim(regexp_replace({t}, '{_WS_RUN}', ' ', 'g'))"


def extract_main_content(
    col: Column | str,
    min_chars: int = 25,
    max_link_density_milli: int = 330,
) -> Column:
    """Article text of a page: blocks with at least ``min_chars`` of
    de-tagged text whose anchor-text share is at most
    ``max_link_density_milli`` per mille, joined by newlines. The
    link-density rule is the load-bearing one — navigation, footers,
    tag clouds, and related-article boxes are mostly link text and
    drop out; body paragraphs keep their inline links because the
    density stays low. Integer per-mille arithmetic so both engines
    agree exactly."""
    raw = _c(col)
    for pat, repl in _PRE_STRIP_STEPS:
        raw = F.regexp_replace(raw, pat, repl)
    blocks = F.split(raw, _BLOCK_SPLIT_PAT)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _block_text(b).alias("txt"),
            F.length(
                _block_text(
                    F.array_join(
                        F.regexp_extract_all(
                            b, F.lit(_ANCHOR_INNER_PAT), F.lit(1)
                        ),
                        " ",
                    )
                )
            ).alias("link_len"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["txt"]) >= F.lit(min_chars))
        & (
            s["link_len"] * F.lit(1000)
            <= F.lit(max_link_density_milli) * F.length(s["txt"])
        ),
    )
    return F.array_join(
        F.transform(kept, lambda s: s["txt"]), "\n"
    )


def extract_main_content_sql(
    expr: str,
    min_chars: int = 25,
    max_link_density_milli: int = 330,
) -> str:
    """DuckDB twin — same split pattern, same per-block arithmetic,
    same keep rule, via list higher-order functions."""
    raw = expr
    for pat, repl in _PRE_STRIP_STEPS:
        raw = f"regexp_replace({raw}, '{pat}', '{repl}', 'g')"
    blocks = f"string_split_regex({raw}, '{_q(_BLOCK_SPLIT_PAT)}')"
    anchor_join = (
        f"array_to_string(regexp_extract_all(b, "
        f"'{_q(_ANCHOR_INNER_PAT)}', 1), ' ')"
    )
    # coalesce: regexp_extract_all inside a list lambda yields NULL
    # (not []) for anchor-free blocks in DuckDB; Spark yields []
    scored = (
        f"list_transform({blocks}, b -> struct_pack("
        f"txt := {_block_text_sql('b')}, "
        f"link_len := coalesce("
        f"length({_block_text_sql(anchor_join)}), 0)))"
    )
    kept = (
        f"list_filter({scored}, s -> length(s.txt) >= {min_chars} "
        f"AND s.link_len * 1000 <= "
        f"{max_link_density_milli} * length(s.txt))"
    )
    # DuckDB's array_to_string([]) is NULL while Spark's
    # array_join([]) is '' — coalesce the EMPTY-list case only: a
    # NULL input page must stay NULL on both sides (r11 self-review:
    # an unconditional coalesce broke NULL-row twin parity)
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"coalesce(array_to_string("
        f"list_transform({kept}, s -> s.txt), chr(10)), '') END"
    )
