"""Robots Exclusion Protocol (RFC 9309) + sitemaps.org parsing —
the policy layer of a crawl corpus: which of the 100 TB of fetched
URLs were actually allowed, which sitemap-declared pages are
missing, and what per-host crawl delays the fetcher honored.

``robots_rules`` parses the group structure (consecutive
``User-agent`` lines share the rule block that follows);
``robots_allowed`` evaluates a URL path with RFC 9309 semantics:
the most-specific matching group (longest agent token, ``*``
fallback), longest-match rule wins, allow wins length ties, ``*``
wildcards and ``$`` end anchors. ``sitemap_urls`` walks
``<urlset>``/``<sitemapindex>`` documents.

Corpus contract throughout: bytes → result or ValueError, cursor
strictly advances, entry caps bound allocation. Rule matching is
pure Python because it is driver/test-side policy evaluation; the
bulk per-URL check runs as a broadcast of the compiled rule list
into an Arrow-batched kernel (rules are tiny; URLs are the big
side and never shuffle)."""

from __future__ import annotations

import functools
import re

__all__ = [
    "robots_rules",
    "robots_allowed",
    "robots_group",
    "make_robots",
    "sitemap_urls",
    "make_sitemap",
]

_MAX_LINES = 100_000
_MAX_PAYLOAD = 1 << 20  # RFC 9309 §2.5 requires parsing ≥500 KiB;
# beyond 1 MiB is degenerate and gets the contract ValueError
_MAX_RULE_LEN = 4096  # bounds the compiled-pattern cache: 4096
# entries × ≤4 KiB rules stays in the tens of MB (review r10 pass 3
# — unbounded rule strings pinned by lru_cache are executor-lifetime
# memory)
_MAX_URLS = 1 << 20


# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------
def robots_rules(payload: bytes) -> dict:
    """robots.txt bytes → ``{groups: [{agents, allow, disallow,
    crawl_delay}], sitemaps: [...]}``. Lines are ``field: value``
    with ``#`` comments; unknown fields are ignored (RFC 9309 §2.2.4
    — forward compatibility); a rule line before any User-agent is
    an error. Bytes must be UTF-8 (the spec's charset)."""
    if len(payload) > _MAX_PAYLOAD:
        raise ValueError("robots.txt exceeds the payload cap")
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"robots.txt is not UTF-8: {exc}") from exc
    lines = text.splitlines()
    if len(lines) > _MAX_LINES:
        raise ValueError("robots.txt exceeds the line cap")
    groups: list[dict] = []
    sitemaps: list[str] = []
    # a User-agent line OPENS a group only when the previous group
    # already has rules; consecutive UA lines stack onto one group
    open_group = None
    last_was_agent = False
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, colon, value = line.partition(":")
        if not colon:
            raise ValueError(f"malformed robots.txt line: {raw!r}")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not value:
                raise ValueError("empty User-agent value")
            if open_group is None or not last_was_agent:
                open_group = {
                    "agents": [], "allow": [], "disallow": [],
                    "crawl_delay": None,
                }
                groups.append(open_group)
            open_group["agents"].append(value.lower())
            last_was_agent = True
            continue
        if field == "sitemap":
            sitemaps.append(value)  # global, group-independent
            continue
        last_was_agent = False
        if field in ("allow", "disallow"):
            if open_group is None:
                raise ValueError(
                    f"{field} rule before any User-agent line"
                )
            if len(value) > _MAX_RULE_LEN:
                raise ValueError(
                    f"{field} rule exceeds the {_MAX_RULE_LEN}-char "
                    "cap"
                )
            if value:  # an empty Disallow means "allow all": no rule
                open_group[field].append(value)
        elif field == "crawl-delay":
            if open_group is None:
                raise ValueError(
                    "crawl-delay before any User-agent line"
                )
            try:
                open_group["crawl_delay"] = float(value)
            except ValueError as exc:
                raise ValueError(
                    f"bad crawl-delay {value!r}"
                ) from exc
        # unknown fields: ignored
    return {"groups": groups, "sitemaps": sitemaps}


@functools.lru_cache(maxsize=4096)
def _rule_parts(rule: str) -> tuple[bool, tuple[str, ...]]:
    """RFC 9309 §2.2.3 path pattern, pre-split for the linear glob
    matcher: ``*`` matches any run, ``$`` at the very end anchors,
    everything else is literal. ADVICE r10 (high): the previous
    regex translation ('*' → '.*') backtracked exponentially on
    rules like ``/a*a*a*…b`` — within the 4096-char rule cap an
    adversarial robots.txt could hang the per-URL hot path >10 s.
    Splitting on '*' and greedy-scanning literal segments with
    ``str.find`` is O(len(rule)·len(path)) worst case with C-level
    inner loops — sub-ms even on the adversarial corpus the fuzz
    campaign now replays. lru-cached: the per-URL hot loop must not
    re-split (rule strings are capped at _MAX_RULE_LEN, so cached
    entries are bounded)."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    # str.split('*') keeps empty segments for '**' runs; empty
    # middle segments cost one no-op find and preserve positions.
    return anchored, tuple(body.split("*"))


def _rule_match(rule: str, path: str) -> bool:
    """Linear-time RFC 9309 pattern match (no regex, no
    backtracking): the path must start with the first literal
    segment; each middle segment is located greedily left-to-right
    (greedy leftmost placement is complete for pure-'*' wildcards);
    an anchored pattern additionally requires the final segment to
    sit flush at the end of the path."""
    anchored, segs = _rule_parts(rule)
    if len(segs) == 1:  # no '*' at all
        return path == segs[0] if anchored else path.startswith(segs[0])
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    for seg in segs[1:-1]:
        idx = path.find(seg, pos)
        if idx < 0:
            return False
        pos = idx + len(seg)
    last = segs[-1]
    if anchored:
        return len(path) - len(last) >= pos and path.endswith(last)
    return path.find(last, pos) >= 0


def _winning_token(groups: list[dict], agent: str) -> str | None:
    """The agent token that selects rules: the longest token that is
    a substring of ``agent`` (case-insensitive); ``*`` fallback;
    None when nothing matches. Allocation-free (review r10 pass 3:
    this runs once per URL in the Arrow kernel)."""
    agent = agent.lower()
    best_tok = None
    star_seen = False
    for g in groups:
        for tok in g["agents"]:
            if tok == "*":
                star_seen = True
            elif tok in agent and (
                best_tok is None or len(tok) > len(best_tok)
            ):
                best_tok = tok
    if best_tok is not None:
        return best_tok
    return "*" if star_seen else None


def robots_group(rules: dict, agent: str) -> dict | None:
    """Merged rule view for the selected agent — RFC 9309 §2.2.1:
    ALL groups carrying the winning token combine (review r10 — a
    wild-world robots.txt frequently lists the same agent in
    several groups). The prepared-view API: use it once per host for
    crawl_delay and rule inspection; the per-URL hot path
    (:func:`robots_allowed`) iterates the groups directly and never
    allocates."""
    groups = rules["groups"]
    want = _winning_token(groups, agent)
    if want is None:
        return None
    merged = {"agents": [want], "allow": [], "disallow": [],
              "crawl_delay": None}
    for g in groups:
        if want in g["agents"]:
            merged["allow"].extend(g["allow"])
            merged["disallow"].extend(g["disallow"])
            if merged["crawl_delay"] is None:
                merged["crawl_delay"] = g["crawl_delay"]
    return merged


def robots_allowed(rules: dict, agent: str, path: str) -> bool:
    """RFC 9309 §2.2.2 evaluation over the combined matching groups:
    the longest rule that matches ``path`` decides; on equal lengths
    allow wins; no match → allowed. No group for the agent →
    allowed. Allocation-free per call — group lists are iterated in
    place, never merged/copied (review r10 pass 3)."""
    groups = rules["groups"]
    want = _winning_token(groups, agent)
    if want is None:
        return True
    best_len, best_allow = -1, True
    for g in groups:
        if want not in g["agents"]:
            continue
        for allow_flag, rule_list in ((True, g["allow"]),
                                      (False, g["disallow"])):
            for rule in rule_list:
                if _rule_match(rule, path):
                    ln = len(rule)
                    if ln > best_len or (
                        ln == best_len and allow_flag
                    ):
                        best_len, best_allow = ln, allow_flag
    return best_allow


def make_robots(
    groups: list[dict], sitemaps: tuple[str, ...] = ()
) -> bytes:
    """robots.txt bytes from group specs (``{agents, allow,
    disallow, crawl_delay}``) — the writer the tests/oracles build
    fixtures with."""
    out = []
    for g in groups:
        for a in g.get("agents", ["*"]):
            out.append(f"User-agent: {a}")
        for r in g.get("disallow", []):
            out.append(f"Disallow: {r}")
        for r in g.get("allow", []):
            out.append(f"Allow: {r}")
        if g.get("crawl_delay") is not None:
            out.append(f"Crawl-delay: {g['crawl_delay']}")
        out.append("")
    for s in sitemaps:
        out.append(f"Sitemap: {s}")
    return ("\n".join(out) + "\n").encode("utf-8")


# ---------------------------------------------------------------------------
# sitemaps.org
# ---------------------------------------------------------------------------
_URL_BLOCK = re.compile(rb"<url>(.*?)</url>", re.S)
_SM_BLOCK = re.compile(rb"<sitemap>(.*?)</sitemap>", re.S)
_XML_ESCAPES = (
    (b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
    (b"&apos;", b"'"), (b"&amp;", b"&"),  # &amp; last
)


def _tag(block: bytes, name: str) -> str | None:
    m = re.search(
        rb"<" + name.encode() + rb">(.*?)</" + name.encode() + rb">",
        block, re.S,
    )
    if m is None:
        return None
    v = m.group(1).strip()
    for ent, ch in _XML_ESCAPES:
        v = v.replace(ent, ch)
    try:
        return v.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"sitemap <{name}> not UTF-8: {exc}") from exc


def sitemap_urls(payload: bytes) -> dict:
    """Sitemap bytes → ``{kind: "urlset"|"index", entries: [{loc,
    lastmod, changefreq, priority}]}``. Handles both document kinds
    of the sitemaps.org protocol; ``<loc>`` is mandatory per entry.
    This is the protocol's fixed shape, not a general XML parser —
    namespaced wrappers are tolerated because matching is by local
    tag name."""
    d = payload
    if b"<urlset" in d[:4096]:
        kind, blocks = "urlset", _URL_BLOCK.findall(d)
    elif b"<sitemapindex" in d[:4096]:
        kind, blocks = "index", _SM_BLOCK.findall(d)
    else:
        raise ValueError(
            "payload has neither <urlset> nor <sitemapindex>"
        )
    if len(blocks) > _MAX_URLS:
        raise ValueError("sitemap exceeds the entry cap")
    entries = []
    for b in blocks:
        loc = _tag(b, "loc")
        if loc is None:
            raise ValueError("sitemap entry lacks <loc>")
        prio = _tag(b, "priority")
        if prio is not None:
            try:
                prio = float(prio)
            except ValueError as exc:
                raise ValueError(f"bad <priority> {prio!r}") from exc
        entries.append(
            {
                "loc": loc,
                "lastmod": _tag(b, "lastmod"),
                "changefreq": _tag(b, "changefreq"),
                "priority": prio,
            }
        )
    return {"kind": kind, "entries": entries}


def make_sitemap(
    entries: list[dict], index: bool = False
) -> bytes:
    """sitemaps.org XML from entry dicts (``{loc, lastmod,
    changefreq, priority}``; only ``loc`` required)."""
    root = "sitemapindex" if index else "urlset"
    item = "sitemap" if index else "url"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for e in entries:
        loc = e["loc"]
        for ch, ent in ((u"&", "&amp;"), ("<", "&lt;"),
                        (">", "&gt;")):
            loc = loc.replace(ch, ent)
        out.append(f"  <{item}>")
        out.append(f"    <loc>{loc}</loc>")
        for k in ("lastmod", "changefreq"):
            if e.get(k) is not None:
                out.append(f"    <{k}>{e[k]}</{k}>")
        if e.get("priority") is not None:
            out.append(f"    <priority>{e['priority']}</priority>")
        out.append(f"  </{item}>")
    out.append(f"</{root}>")
    return ("\n".join(out) + "\n").encode("utf-8")
