"""robots.txt evaluation (operators/robots.py): RFC 9309 semantics —
group formation, longest-prefix agent selection, longest-match rules
with allow ties, * wildcards and $ anchors — plus the Spark audit
join."""

from __future__ import annotations

import pytest

from apache_pinot_spark.operators import robots as R

_BODY = """
# comment-only prologue
Disallow: /ignored-before-any-group
User-agent: examplebot
Disallow: /private/
Allow: /private/public/

User-agent: examplebot-images
Disallow: /

User-agent: *
Disallow: /tmp/
Allow: /tmp/ok$
Disallow: /*.json$
Sitemap: https://e.com/sitemap.xml
"""


def _m(agent):
    return R.RobotsMatcher(_BODY, agent)


def test_agent_group_selection_longest_prefix():
    # examplebot-images/1.0 matches BOTH tokens; the longer one wins
    assert _m("ExampleBot/2.1").allowed("/private/x") is False
    assert _m("examplebot-images/1.0").allowed("/anything") is False
    assert _m("otherbot").allowed("/private/x") is True   # falls to *
    assert _m("otherbot").allowed("/tmp/x") is False


def test_longest_match_and_allow_tie():
    m = _m("examplebot")
    assert m.allowed("/private/public/page") is True   # longer Allow wins
    assert m.allowed("/private/secret") is False
    assert m.allowed("/") is True                      # no rule -> allow
    # rules before any user-agent line are ignored per spec
    assert m.allowed("/ignored-before-any-group") is True


def test_wildcards_and_anchor():
    m = _m("randombot")
    assert m.allowed("/tmp/ok") is True        # $-anchored Allow
    assert m.allowed("/tmp/ok2") is False      # anchor does not extend
    assert m.allowed("/data/file.json") is False   # /*.json$
    assert m.allowed("/data/file.json.txt") is True
    assert m.allowed("/sitemap.xml") is True
    assert R.parse_robots(_BODY)[1] == ["https://e.com/sitemap.xml"]


def test_no_robots_or_empty_allows():
    assert R.RobotsMatcher("", "any").allowed("/x") is True
    # empty Disallow value disallows nothing
    m = R.RobotsMatcher("User-agent: *\nDisallow:\n", "any")
    assert m.allowed("/anything") is True


def test_spark_robots_audit(spark):
    pages = spark.createDataFrame(
        [(1, "http://a.example.com/private/x", "a.example.com"),
         (2, "http://a.example.com/open", "a.example.com"),
         (3, "http://b.example.com/anything", "b.example.com")],
        "doc_id bigint, url string, source string")
    robots = spark.createDataFrame(
        [("a.example.com",
          "User-agent: *\nDisallow: /private/\n")],
        "host string, body string")
    got = {r.doc_id: r.robots_allowed
           for r in R.robots_audit(pages, robots, "corpusbot").collect()}
    assert got == {1: False, 2: True, 3: True}  # no robots -> allowed


def test_parse_sitemap_urlset_index_and_gzip():
    import gzip

    from apache_pinot_spark.operators.robots import parse_sitemap

    urlset = (b'<?xml version="1.0"?><urlset xmlns="http://x">'
              b"<url><loc>https://e.com/a</loc>"
              b"<lastmod>2024-01-01</lastmod></url>"
              b"<url><loc> https://e.com/b?x=1&amp;y=2 </loc></url>"
              b"</urlset>")
    kind, entries = parse_sitemap(urlset)
    assert kind == "urlset"
    assert entries == [("https://e.com/a", "2024-01-01"),
                       ("https://e.com/b?x=1&y=2", None)]
    idx = (b"<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
           b"</sitemap><sitemap><loc>https://e.com/s2.xml.gz</loc>"
           b"<lastmod>2024-06-01</lastmod></sitemap></sitemapindex>")
    kind, entries = parse_sitemap(idx)
    assert kind == "index" and len(entries) == 2
    assert entries[1] == ("https://e.com/s2.xml.gz", "2024-06-01")
    # gzipped sitemap inflates transparently
    kind, entries = parse_sitemap(gzip.compress(urlset))
    assert kind == "urlset" and len(entries) == 2
    with pytest.raises(ValueError, match="urlset"):
        parse_sitemap(b"<html>not a sitemap</html>")
