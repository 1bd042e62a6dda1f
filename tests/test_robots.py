"""robots.txt (RFC 9309) + sitemap tests (round 10). The stdlib
``urllib.robotparser`` serves as an interop oracle where the specs
agree (it predates RFC 9309's longest-match rule, so precedence
cases are pinned against the RFC examples instead)."""

from __future__ import annotations

import urllib.robotparser

import pytest

from bergloom_spark.operators.robots import (
    make_robots,
    make_sitemap,
    robots_allowed,
    robots_rules,
    sitemap_urls,
)


def _rules(*groups, sitemaps=()):
    return robots_rules(make_robots(list(groups), sitemaps=sitemaps))


def test_group_structure_and_sitemaps():
    r = _rules(
        {"agents": ["googlebot", "bingbot"], "disallow": ["/private/"]},
        {"agents": ["*"], "disallow": ["/tmp/"], "crawl_delay": 2.5},
        sitemaps=("https://e.org/sitemap.xml",),
    )
    assert len(r["groups"]) == 2
    assert r["groups"][0]["agents"] == ["googlebot", "bingbot"]
    assert r["groups"][1]["crawl_delay"] == 2.5
    assert r["sitemaps"] == ["https://e.org/sitemap.xml"]


def test_longest_match_wins_allow_ties():
    r = _rules(
        {"agents": ["*"],
         "disallow": ["/docs/"],
         "allow": ["/docs/public/"]},
    )
    assert robots_allowed(r, "anybot", "/docs/secret.html") is False
    assert robots_allowed(r, "anybot", "/docs/public/x.html") is True
    assert robots_allowed(r, "anybot", "/other") is True
    # equal length: allow wins (RFC 9309 §2.2.2)
    r2 = _rules(
        {"agents": ["*"], "disallow": ["/p"], "allow": ["/p"]}
    )
    assert robots_allowed(r2, "anybot", "/page") is True


def test_wildcards_and_anchors():
    r = _rules(
        {"agents": ["*"],
         "disallow": ["/*.pdf$", "/search*results"]},
    )
    assert robots_allowed(r, "b", "/doc/file.pdf") is False
    assert robots_allowed(r, "b", "/doc/file.pdf?x=1") is True  # $ anchor
    assert robots_allowed(r, "b", "/search/q/results") is False
    assert robots_allowed(r, "b", "/searching") is True


def test_adversarial_star_rules_are_linear_time():
    """ADVICE r10 (high): '*'→'.*' under backtracking ``re`` hung
    >10 s on ``/a*a*…*b`` vs a ~300-char path. The iterative glob
    matcher must stay sub-millisecond on the same corpus — and
    still produce RFC-correct verdicts."""
    import time

    from bergloom_spark.operators.robots import _rule_match

    adversarial = [
        "/" + "a*" * 200 + "b",          # the reported hang
        "/" + "*a" * 500,                 # star-led repetition
        "/" + "a*" * 1000 + "$",          # anchored variant (as /a*…a*
        "*" * 2000 + "x",                 # star run collapse
    ]
    path_hit = "/" + "a" * 300
    path_miss = "/" + "c" * 300
    t0 = time.perf_counter()
    for rule in adversarial:
        r = _rules({"agents": ["*"], "disallow": [rule]})
        for path in (path_hit, path_miss):
            robots_allowed(r, "anybot", path)
    assert time.perf_counter() - t0 < 0.5
    # verdict correctness on the same shapes
    assert _rule_match("/" + "a*" * 3 + "b", "/aaab") is True
    assert _rule_match("/" + "a*" * 3 + "b", "/aab") is False  # needs 3 a's
    assert _rule_match("/*a" * 1, "/xxa") is True
    assert _rule_match("/a*" * 1 + "$", "/axxx") is True
    assert _rule_match("/a*b$", "/a--b-") is False


def test_glob_matcher_matches_regex_reference():
    """Property pin: the linear matcher agrees with a (safe,
    bounded) regex translation on a randomized rule/path grid."""
    import random
    import re as _re

    rng = random.Random(911)
    alphabet = "ab/."
    for _ in range(4000):
        rule = "".join(
            rng.choice(alphabet + "*") for _ in range(rng.randint(0, 10))
        )
        if rng.random() < 0.3:
            rule += "$"
        path = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 12))
        )
        anchored = rule.endswith("$")
        body = rule[:-1] if anchored else rule
        pat = "".join(".*" if c == "*" else _re.escape(c) for c in body)
        want = bool(
            _re.match("^" + pat + ("$" if anchored else ""), path)
        )
        from bergloom_spark.operators.robots import _rule_match

        assert _rule_match(rule, path) == want, (rule, path)


def test_agent_specificity():
    r = _rules(
        {"agents": ["*"], "disallow": ["/all/"]},
        {"agents": ["bot"], "disallow": ["/bot/"]},
        {"agents": ["botlong"], "disallow": ["/botlong/"]},
    )
    # longest matching token wins: "botlong/1.0" matches both
    assert robots_allowed(r, "botlong/1.0", "/botlong/x") is False
    assert robots_allowed(r, "botlong/1.0", "/bot/x") is True
    assert robots_allowed(r, "bot/2.0", "/bot/x") is False
    assert robots_allowed(r, "unknown", "/all/x") is False
    assert robots_allowed(r, "unknown", "/bot/x") is True


def test_empty_disallow_allows_all():
    raw = b"User-agent: *\nDisallow:\n"
    r = robots_rules(raw)
    assert r["groups"][0]["disallow"] == []
    assert robots_allowed(r, "any", "/everything") is True


def test_rule_before_agent_rejected():
    with pytest.raises(ValueError, match="before any User-agent"):
        robots_rules(b"Disallow: /x\n")


def test_comments_and_unknown_fields_ignored():
    raw = (b"# top comment\nUser-agent: * # inline\n"
           b"Noindex: /x\nDisallow: /y/ # trailing\n")
    r = robots_rules(raw)
    assert r["groups"][0]["disallow"] == ["/y/"]


def test_stdlib_interop_on_simple_rules():
    """Where pre-RFC and RFC semantics agree (disjoint literal
    prefixes), our verdicts match urllib.robotparser."""
    raw = make_robots(
        [{"agents": ["*"], "disallow": ["/private/", "/tmp/"]},
         {"agents": ["specialbot"], "disallow": ["/special/"]}]
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(raw.decode().splitlines())
    ours = robots_rules(raw)
    for agent in ("randombot", "specialbot"):
        for path in ("/private/a", "/tmp/b", "/special/c", "/ok",
                     "/priv", "/"):
            assert robots_allowed(ours, agent, path) == rp.can_fetch(
                agent, f"https://e.org{path}"
            ), (agent, path)


def test_sitemap_urlset_roundtrip():
    entries = [
        {"loc": "https://e.org/a?x=1&y=2", "lastmod": "2025-01-01",
         "changefreq": "daily", "priority": 0.8},
        {"loc": "https://e.org/b"},
    ]
    got = sitemap_urls(make_sitemap(entries))
    assert got["kind"] == "urlset"
    assert got["entries"][0]["loc"] == "https://e.org/a?x=1&y=2"
    assert got["entries"][0]["priority"] == 0.8
    assert got["entries"][1] == {
        "loc": "https://e.org/b", "lastmod": None,
        "changefreq": None, "priority": None,
    }


def test_sitemap_index_roundtrip():
    got = sitemap_urls(
        make_sitemap([{"loc": "https://e.org/s1.xml"},
                      {"loc": "https://e.org/s2.xml"}], index=True)
    )
    assert got["kind"] == "index"
    assert [e["loc"] for e in got["entries"]] == [
        "https://e.org/s1.xml", "https://e.org/s2.xml",
    ]


def test_sitemap_missing_loc_rejected():
    p = make_sitemap([{"loc": "https://e.org/a"}]).replace(
        b"<loc>https://e.org/a</loc>", b"<lastmod>2025</lastmod>"
    )
    with pytest.raises(ValueError, match="loc"):
        sitemap_urls(p)


def test_sitemap_not_xml_rejected():
    with pytest.raises(ValueError, match="urlset"):
        sitemap_urls(b"plain text")


def test_robots_spark_seam(spark, sf_dir):
    """Broadcast-compiled rules applied per URL in an Arrow-batched
    kernel — rules are the tiny side, URLs the big side (never
    shuffled)."""
    import pandas as pd

    raw = make_robots(
        [{"agents": ["*"], "disallow": ["/private/", "/*.pdf$"],
          "allow": ["/private/ok/"]}]
    )
    rules = robots_rules(raw)
    b_rules = spark.sparkContext.broadcast(rules)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(200).repartition(8)
    )

    def kernel(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                path = (
                    "/private/ok/x", "/private/no", "/a.pdf",
                    "/a.pdf?v=1", "/public",
                )[i % 5]
                rows.append(
                    (i, robots_allowed(b_rules.value, "bot", path))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "allowed"])

    rows = d.mapInPandas(kernel, "doc_id long, allowed boolean").collect()
    assert rows
    want = (True, False, False, True, True)
    for r in rows:
        assert r.allowed == want[r.doc_id % 5], r.doc_id


def test_duplicate_agent_groups_combine():
    """Review r10 (RFC 9309 §2.2.1): all groups matching the same
    agent token merge — later duplicate-agent groups must count."""
    raw = (b"User-agent: *\nDisallow: /a\n\n"
           b"User-agent: *\nDisallow: /b\n")
    r = robots_rules(raw)
    assert robots_allowed(r, "anybot", "/a") is False
    assert robots_allowed(r, "anybot", "/b") is False
    assert robots_allowed(r, "anybot", "/c") is True
    # named groups merge independently of the * groups
    raw2 = (b"User-agent: bot\nDisallow: /x\n\n"
            b"User-agent: *\nDisallow: /y\n\n"
            b"User-agent: bot\nDisallow: /z\n")
    r2 = robots_rules(raw2)
    assert robots_allowed(r2, "bot/1.0", "/x") is False
    assert robots_allowed(r2, "bot/1.0", "/z") is False
    assert robots_allowed(r2, "bot/1.0", "/y") is True


def test_rule_and_payload_caps():
    """Review r10 pass 3: caps bound the compiled-pattern cache."""
    with pytest.raises(ValueError, match="rule exceeds"):
        robots_rules(
            b"User-agent: *\nDisallow: /" + b"x" * 5000 + b"\n"
        )
    with pytest.raises(ValueError, match="payload cap"):
        robots_rules(b"#" + b"c" * (1 << 21))


def test_robots_group_merged_view():
    """Review r10 pass 4: the prepared merged view is the public
    per-host API (crawl_delay lookup + rule inspection)."""
    from bergloom_spark.operators.robots import robots_group

    raw = (b"User-agent: bot\nDisallow: /x\nCrawl-delay: 2.5\n\n"
           b"User-agent: bot\nDisallow: /z\nAllow: /z/ok\n")
    g = robots_group(robots_rules(raw), "bot/1.0")
    assert g["disallow"] == ["/x", "/z"]
    assert g["allow"] == ["/z/ok"]
    assert g["crawl_delay"] == 2.5
    assert robots_group(robots_rules(raw), "other") is None
