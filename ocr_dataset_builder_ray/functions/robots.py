"""robots.txt compliance gate (RFC 9309, the Robots Exclusion Protocol).

A crawl-derived corpus pipeline is expected to honor the origin's
robots policy — CC's own crawler does, but policies change after the
crawl, and takedown/compliance passes re-apply CURRENT robots rules to
an already-collected corpus. That re-application is a pure
data-parallel gate: a (domain → rules) table joined against every
page url. The reference has no analogue (its inputs are local video
files); the semantic anchor is the same per-record input gating as M1
/ ``url_filter``, lifted to the published exclusion standard.

Parsing and matching follow RFC 9309's normative core:

* groups: consecutive ``User-agent`` lines share the rule block that
  follows; a crawler obeys the group(s) whose product token equals its
  own (ASCII case-insensitive), falling back to the ``*`` group(s)
  when none match exactly. (Longest-prefix agent matching is a vendor
  extension, deliberately not implemented.)
* rules: ``Allow`` / ``Disallow`` path patterns with ``*`` (any
  octet sequence) and a final ``$`` (end anchor); matched against
  ``path[?query]``. The MOST SPECIFIC match wins — longest pattern in
  octets — and on a length tie ``Allow`` wins. An empty ``Disallow:``
  value is a no-op (everything allowed). Unknown fields (Sitemap,
  Crawl-delay, ...) are ignored.
* no matching rule → allowed; no robots.txt for the domain → the
  caller's ``default_allow`` decides (RFC: unreachable robots.txt on
  4xx means allow-all; 5xx is crawler's choice).

Everything is stdlib-only; per-rule patterns compile to anchored
regexes once per robots file.
"""

from __future__ import annotations

import re

# product tokens are letters/digits/_/- per RFC 9309
_FIELD_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")


def _compile_rule(path_pattern: str) -> "re.Pattern[str]":
    """Rule pattern → anchored regex: ``*`` is any sequence, a FINAL
    ``$`` anchors the end; everything else matches literally from the
    start of ``path[?query]``."""
    anchored = path_pattern.endswith("$")
    body = path_pattern[:-1] if anchored else path_pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


class RobotsRules:
    """Parsed rule set for ONE user agent from one robots.txt.

    ``rules`` is a list of ``(priority, is_allow, regex)`` sorted by
    priority (pattern octet length) descending, allow-first on ties —
    so the first matching entry decides, implementing RFC 9309's
    most-specific-match + allow-wins-ties in one scan.
    """

    __slots__ = ("rules",)

    def __init__(self, raw_rules: list[tuple[bool, str]]):
        entries = []
        for is_allow, pattern in raw_rules:
            if pattern == "":
                continue  # empty Disallow/Allow value: no rule
            entries.append((len(pattern), is_allow, _compile_rule(pattern)))
        # stable sort: longest first; on equal length allow (True)
        # before disallow
        entries.sort(key=lambda e: (-e[0], not e[1]))
        self.rules = entries

    def allowed(self, path_query: str) -> bool:
        if not path_query.startswith("/"):
            path_query = "/" + path_query
        for _prio, is_allow, rx in self.rules:
            if rx.match(path_query):
                return is_allow
        return True  # no rule matches -> allowed


def parse_robots(
    payload: bytes | str | None, user_agent: str = "*"
) -> RobotsRules:
    """Parse a robots.txt payload into the rule set governing
    ``user_agent`` (exact product-token match, else the ``*`` groups).
    Never raises; undecodable bytes are replaced, garbage lines are
    skipped (RFC: parsers must be tolerant)."""
    if payload is None:
        return RobotsRules([])
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    ua = user_agent.strip().lower()

    # group accumulation: agents of the current group + its rules;
    # a User-agent line AFTER rules starts a new group
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_rules = False
    for line in payload.splitlines():
        line = line.split("#", 1)[0]
        m = _FIELD_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(value.strip().lower())
        elif field in ("allow", "disallow"):
            if cur_agents:  # rules before any User-agent line: ignored
                cur_rules.append((field == "allow", value))
                in_rules = True
        # all other fields (sitemap, crawl-delay, ...) ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    exact = [r for agents, rules in groups if ua in agents for r in rules]
    if any(ua in agents for agents, _ in groups):
        return RobotsRules(exact)
    star = [r for agents, rules in groups if "*" in agents for r in rules]
    return RobotsRules(star)


def _path_query(url: str) -> str:
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    pq = parts.path or "/"
    if parts.query:
        pq += "?" + parts.query
    return pq


def robots_filter(
    ds,
    robots_ds,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
    payload_col: str = "robots_txt",
    user_agent: str = "*",
    default_allow: bool = True,
):
    """Drop rows whose url the domain's robots.txt disallows for
    ``user_agent`` — the compliance / takedown re-application pass.

    ``robots_ds`` is a Dataset (or pandas DataFrame) of
    ``(domain, robots_txt)`` — one row per registrable domain, payload
    bytes or text (None = no reachable robots.txt → ``default_allow``).

    Scale shape: rules are DOMAIN-BOUNDED state — parsed once on the
    driver into per-domain ``RobotsRules`` and broadcast via
    ``ray.put`` (the same bounded-broadcast convention as the NB
    model / boilerplate hot set; a robots file is ~KBs and only
    domains present in the corpus matter, so the broadcast is MBs per
    million domains). Each batch resolves registrable domains
    (vectorized canonicalization) and applies the compiled rule scan
    per url — the per-row Python is a handful of anchored-regex
    matches, the same cost class as ``url_filter``'s gate.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from .urltools import canonicalize_urls, registrable_domains

    if not isinstance(robots_ds, pd.DataFrame):
        robots_ds = robots_ds.to_pandas()  # domain-bounded
    # a None payload means "no reachable robots.txt for this domain" —
    # same as no row at all: governed by default_allow
    table = {
        str(d).lower(): parse_robots(p, user_agent)
        for d, p in zip(robots_ds[domain_col], robots_ds[payload_col])
        if p is not None
    }
    ref = ray.put((table, bool(default_allow)))

    def _gate(batch: pa.Table) -> pa.Table:
        rules_by_dom, dfl = ray.get(ref)
        urls = batch[url_col].to_pylist()
        # canonical form ONLY for the domain lookup; rules match the
        # RAW path+query — canonicalization strips trailing slashes and
        # tracking params and re-sorts queries, any of which silently
        # un-matches directory disallows ("Disallow: /private/") and
        # query-pattern rules, under-blocking a compliance pass
        doms = registrable_domains(canonicalize_urls(urls))
        keep = np.empty(len(urls), dtype=bool)
        for i, (u, d) in enumerate(zip(urls, doms)):
            rules = rules_by_dom.get(d)
            keep[i] = dfl if rules is None else rules.allowed(_path_query(u))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_gate, batch_format="pyarrow")
