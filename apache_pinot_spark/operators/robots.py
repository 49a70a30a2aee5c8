"""robots.txt parsing and evaluation (RFC 9309, public spec) — the
compliance-audit tier of a crawl corpus: given the robots.txt bodies a
crawl archived (Common Crawl stores them as ordinary records) and the
page URLs the corpus kept, report which pages the named agent was
allowed to fetch. A curation pipeline runs this as an AUDIT (flag or
drop disallowed pages), which is why it lives beside the noindex gate.

RFC 9309 semantics implemented exactly:
  * groups: consecutive ``User-agent`` lines share the rule block that
    follows; rules before any user-agent line are ignored per spec
  * agent selection: the group(s) whose product token is the LONGEST
    case-insensitive prefix of the agent name win; absent any match,
    the ``*`` group applies; absent that, everything is allowed
  * rule matching: ``Allow``/``Disallow`` paths with ``*`` wildcards
    and the ``$`` end anchor; the LONGEST matching pattern wins and a
    tie goes to allow; an empty Disallow value disallows nothing
  * unknown directives ignored; ``Sitemap`` lines collected

Evaluation compiles each pattern to an anchored regex once per robots
body (memoized per host inside the Arrow batch) — per-row map-side
work after one host-keyed join of pages to their robots body.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(body: str):
    """(groups, sitemaps): groups = [(agent_tokens_lower, rules)] with
    rules = [(is_allow, raw_pattern)] in file order."""
    groups: list = []
    sitemaps: list = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if last_was_agent and groups:
                groups[-1][0].append(val.lower())
            else:
                groups.append(([val.lower()], []))
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            sitemaps.append(val)
        elif key in ("allow", "disallow") and groups:
            groups[-1][1].append((key == "allow", val))
    return groups, sitemaps


def _pattern_re(pattern: str):
    parts = []
    i = 0
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for ch in body:
        parts.append(".*" if ch == "*" else re.escape(ch))
    return re.compile("^" + "".join(parts) + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled evaluator for one robots body + one agent name."""

    def __init__(self, body: str, agent: str):
        groups, self.sitemaps = parse_robots(body or "")
        agent_l = agent.lower()
        best_len = -1
        chosen: list = []
        for agents, rules in groups:
            for tok in agents:
                if tok == "*":
                    continue
                if agent_l.startswith(tok) and len(tok) > best_len:
                    best_len = len(tok)
        for agents, rules in groups:
            if best_len >= 0:
                if any(tok != "*" and agent_l.startswith(tok)
                       and len(tok) == best_len for tok in agents):
                    chosen.extend(rules)
            elif "*" in agents:
                chosen.extend(rules)
        self.rules = [
            (is_allow, len(pat), _pattern_re(pat))
            for is_allow, pat in chosen if pat != ""
        ]

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        best = None  # (pattern_len, is_allow)
        for is_allow, plen, rx in self.rules:
            if rx.match(path):
                if best is None or plen > best[0] \
                        or (plen == best[0] and is_allow and not best[1]):
                    best = (plen, is_allow)
        return True if best is None else best[1]


def robots_audit(
    pages: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "url",
    host_col: str = "source",
    robots_host_col: str = "host",
    robots_body_col: str = "body",
) -> DataFrame:
    """pages + (robots_allowed BOOLEAN) for ``agent`` — hosts with no
    archived robots body allow everything (the RFC default). One
    host-keyed left join, then a per-row Arrow pass with the matcher
    memoized per host."""
    rb = robots.select(
        F.lower(F.col(robots_host_col)).alias("__rhost"),
        F.col(robots_body_col).alias("__rbody"))
    joined = pages.join(
        rb, F.lower(F.col(host_col)) == F.col("__rhost"), "left")
    cols = pages.columns
    agent_name = agent

    def run(batches):
        # worker imports THIS package: executors need it importable
        # (pip-installed or shipped via --py-files) — the normal library
        # deployment
        import pandas as _pd

        from apache_pinot_spark.operators.robots import RobotsMatcher

        memo: dict = {}
        for pdf in batches:
            allowed = []
            for url, body in zip(pdf[url_col], pdf["__rbody"]):
                if body is None:
                    allowed.append(True)
                    continue
                key = id(body) if not isinstance(body, str) else body
                m = memo.get(key)
                if m is None:
                    m = RobotsMatcher(str(body), agent_name)
                    memo[key] = m
                path = "/"
                if url:
                    u = str(url)
                    scheme_end = u.find("://")
                    rest = u[scheme_end + 3 :] if scheme_end >= 0 else u
                    slash = rest.find("/")
                    path = rest[slash:] if slash >= 0 else "/"
                allowed.append(m.allowed(path.split("#")[0]))
            out = pdf[cols].copy()
            out["robots_allowed"] = _pd.Series(allowed, dtype="bool")
            yield out

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in pages.schema.fields) \
        + ", robots_allowed boolean"
    return joined.mapInPandas(run, schema=schema)


_LOC_RE = re.compile(rb"<loc>\s*(.*?)\s*</loc>", re.S)
_URLBLOCK_RE = re.compile(rb"<url>(.*?)</url>", re.S)
_SITEMAPBLOCK_RE = re.compile(rb"<sitemap>(.*?)</sitemap>", re.S)


def parse_sitemap(body: bytes, max_urls: int = 100_000):
    """(kind, entries) of one sitemap document (sitemaps.org protocol —
    the discovery tier robots.txt's Sitemap lines point at): kind is
    'urlset' (entries = [(url, lastmod|None)]) or 'index' (entries =
    [(child_sitemap_url, lastmod|None)]). Gzip bodies inflate bounded;
    entity-decoded; caps bound attacker-controlled growth."""
    from html import unescape

    if body[:2] == b"\x1f\x8b":
        import zlib

        d = zlib.decompressobj(wbits=31)
        out = bytearray()
        pos = 0
        while pos < len(body):
            chunk = body[pos : pos + (1 << 20)]
            pos += len(chunk)
            out += d.decompress(chunk, (64 << 20) + 1 - len(out))
            if len(out) > (64 << 20):
                raise ValueError("sitemap inflates past bound")
            if d.eof:
                break
        body = bytes(out)

    def block_entries(block_re):
        entries = []
        for block in block_re.findall(body):
            locm = _LOC_RE.search(block)
            if not locm:
                continue
            url = unescape(locm.group(1).decode("utf-8", "replace"))
            lm = re.search(rb"<lastmod>\s*(.*?)\s*</lastmod>", block)
            entries.append((url, lm.group(1).decode("ascii", "replace")
                            if lm else None))
            if len(entries) >= max_urls:
                break
        return entries

    if b"<sitemapindex" in body:
        return "index", block_entries(_SITEMAPBLOCK_RE)
    if b"<urlset" in body:
        return "urlset", block_entries(_URLBLOCK_RE)
    raise ValueError("neither <urlset> nor <sitemapindex> present")
