"""URL canonicalization, domain extraction and href harvesting.

Web-corpus hygiene kernels the crawl-side pipelines need before any
url-keyed operator is trustworthy: the reference keys everything on the
raw path string (`tesseract/pipeline.py` walks directories; frame paths
ARE the key), which is fine for a filesystem but wrong for the web —
`http://A.example/x?utm_source=t#frag` and `http://a.example/x` are the
same resource. Everything here is deterministic, pure-stdlib and
per-row-cheap; the batch wrappers are the only entry points the Ray
stages use.

Used by: ``stages/graph.py`` (link extraction + PageRank node keys) and
the ``canonical_url_dedup`` / ``domain_cap`` curation compositions.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np

__all__ = [
    "canonicalize_url",
    "canonicalize_urls",
    "registrable_domain",
    "registrable_domains",
    "extract_hrefs",
    "extract_hrefs_with_text",
]

# Tracking parameters stripped during canonicalization — the standard
# analytics/click-id families; dropping them merges urls that differ
# only in campaign attribution.
_TRACKING_PARAM = re.compile(
    r"^(?:utm_[a-z]+|fbclid|gclid|dclid|msclkid|mc_[a-z]+|igshid|ref_src)$"
)

_DEFAULT_PORT = {"http": "80", "https": "443"}

# Multi-label public suffixes (second level). A full Public Suffix List
# is a 200 KB moving target; this embedded subset covers the dominant
# ccTLD second-level registries so `registrable_domain` groups
# `news.bbc.co.uk` under `bbc.co.uk`, not `co.uk`. Unknown suffixes
# fall back to eTLD+1 over the last single label, which is correct for
# all gTLDs.
_SECOND_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
        "ltd.uk", "plc.uk", "nhs.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
        "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
        "com.br", "net.br", "org.br", "gov.br", "edu.br",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
        "co.in", "net.in", "org.in", "gov.in", "ac.in", "edu.in",
        "com.mx", "org.mx", "gob.mx", "edu.mx",
        "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
        "co.za", "org.za", "net.za", "gov.za", "ac.za",
        "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
        "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr",
        "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw",
        "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk",
        "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
        "co.id", "net.id", "or.id", "go.id", "ac.id",
        "com.my", "net.my", "org.my", "gov.my", "edu.my",
        "co.th", "net.th", "or.th", "go.th", "ac.th",
        "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
        "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
        "co.il", "net.il", "org.il", "gov.il", "ac.il",
        "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
        "com.pl", "net.pl", "org.pl", "gov.pl", "edu.pl",
        "com.ru", "net.ru", "org.ru",
        "com.eg", "com.sa", "com.ae", "com.ng", "co.ke",
        "com.pk", "com.bd", "com.np", "com.lk",
        "co.ve", "com.co", "com.pe", "com.ec", "com.uy", "cl.cl",
        "com.do", "com.gt", "com.py", "com.bo", "com.ni", "com.sv",
        "gov.it", "edu.it",
        "co.at", "or.at", "ac.at", "gv.at",
        "com.es", "org.es", "nom.es", "gob.es", "edu.es",
        "com.pt", "org.pt", "edu.pt", "gov.pt",
        "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    }
)


def canonicalize_url(url: str | None) -> str:
    """Deterministic canonical form of a web url.

    Lower-cases scheme and host, strips the default port, the fragment
    and known tracking query params, sorts the surviving query params,
    collapses an empty path to ``/`` and removes a trailing slash from
    non-root paths. Non-http(s) or unparseable input canonicalizes to
    ``""`` (callers treat that as "not a web url").
    """
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return ""
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return ""
    port = parts.port
    netloc = host
    try:
        if port is not None and str(port) != _DEFAULT_PORT[scheme]:
            netloc = f"{host}:{port}"
    except ValueError:
        return ""
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    query = ""
    if parts.query:
        kept = [
            kv
            for kv in parts.query.split("&")
            if kv and not _TRACKING_PARAM.match(kv.split("=", 1)[0].lower())
        ]
        query = "&".join(sorted(kept))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_urls(urls) -> list[str]:
    """Batch form of :func:`canonicalize_url` (list[str|None] in/out)."""
    return [canonicalize_url(u) for u in urls]


def registrable_domain(host_or_url: str | None) -> str:
    """eTLD+1 of a host or url — the per-site grouping key.

    ``news.bbc.co.uk`` → ``bbc.co.uk``; ``a.b.example.com`` →
    ``example.com``; bare hosts and IPs return themselves. Unknown
    multi-label suffixes fall back to the last two labels, which is
    exact for every gTLD and the embedded ccTLD registry subset above.
    """
    if not host_or_url:
        return ""
    host = host_or_url
    if "//" in host or host.startswith(("http:", "https:")):
        try:
            host = urlsplit(host_or_url).hostname or ""
        except ValueError:
            return ""
    host = host.lower().rstrip(".")
    if not host or host.replace(".", "").replace(":", "").isdigit():
        return host  # IPv4 / port-ish — group by the literal address
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _SECOND_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def registrable_domains(urls) -> list[str]:
    """Batch form of :func:`registrable_domain`."""
    return [registrable_domain(u) for u in urls]


# href harvesting — one compiled regex over raw html. A full parse
# (functions/html_extract.py) is the TEXT path; for the link graph the
# anchor attributes are enough and the regex is ~20× cheaper.
_HREF_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
# anchor inner markup: from the anchor's ">" to its closing tag
_ANCHOR_BODY_RE = re.compile(rb">(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_INNER_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_hrefs(
    html: bytes | None, base_url: str, *, max_links: int = 1000
) -> list[str]:
    """Canonicalized outgoing http(s) links of one page.

    Resolves relative hrefs against ``base_url``, drops fragments /
    mailto / javascript / data urls, canonicalizes, removes self-links
    and in-page duplicates, preserves first-occurrence order and caps
    at ``max_links`` (link farms exist; one page must not emit an
    unbounded edge list).
    """
    return [u for u, _ in extract_hrefs_with_text(html, base_url, max_links=max_links, with_text=False)]


def extract_hrefs_with_text(
    html: bytes | None,
    base_url: str,
    *,
    max_links: int = 1000,
    max_text_chars: int = 200,
    with_text: bool = True,
) -> list[tuple[str, str]]:
    """Like :func:`extract_hrefs` but pairs every link with its anchor
    text (inner markup stripped of tags, whitespace collapsed, capped
    at ``max_text_chars``). The FIRST occurrence of a target on the
    page wins, so its anchor text is the first anchor's."""
    if not html:
        return []
    base = canonicalize_url(base_url)
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html):
        raw = next(g for g in m.groups() if g is not None)
        href = raw.decode("utf-8", errors="replace").strip()
        if not href or href.startswith("#"):
            continue
        low = href[:11].lower()
        if low.startswith(("mailto:", "javascript:", "data:", "tel:")):
            continue
        try:
            resolved = urljoin(base_url, href)
        except ValueError:
            continue
        canon = canonicalize_url(resolved)
        if not canon or canon == base or canon in seen:
            continue
        text = ""
        if with_text:
            body = _ANCHOR_BODY_RE.search(html, m.end())
            if body is not None:
                inner = _INNER_TAG_RE.sub(b" ", body.group(1))
                text = _WS_RE.sub(
                    " ", inner.decode("utf-8", errors="replace")
                ).strip()[:max_text_chars]
        seen.add(canon)
        out.append((canon, text))
        if len(out) >= max_links:
            break
    return out


def hash_nodes_int64(values) -> np.ndarray:
    """Stable int64 node ids for url/node strings (blake2b-8 bits
    reinterpreted — bijective uint64→int64, safe through every Arrow /
    pandas aggregate; see hashing.stable_hash64_array)."""
    from .hashing import stable_hash64_array

    return stable_hash64_array(values).view(np.int64)


def url_filter(
    ds,
    *,
    url_col: str = "url",
    allow_domains: list | None = None,
    block_domains: list | None = None,
    block_url_patterns: list | None = None,
):
    """Crawl-policy URL filtering as a pure broadcast map — the
    allow/deny-list gate every web pipeline runs before spending
    extraction compute (semantic anchor: the reference's per-record
    input gating, M1, lifted to the URL layer; the rule set is the
    standard curation one: registrable-domain allow/deny lists plus
    RE2 URL patterns, as in C4's and RefinedWeb's source filtering).

    * ``allow_domains`` — keep ONLY these registrable domains (None =
      no allow restriction);
    * ``block_domains`` — drop these registrable domains;
    * ``block_url_patterns`` — drop urls matching ANY of these RE2
      patterns (matched against the canonicalized url, so tracking
      params and fragments can't dodge a pattern).

    Lists ship once via ``ray.put``; each batch canonicalizes,
    resolves registrable domains, and applies set membership + ONE
    combined alternation regex with Arrow's RE2 — no per-row Python
    beyond the (already vectorized-ish) domain resolution.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    allow = frozenset(d.lower() for d in allow_domains) if allow_domains else None
    block = frozenset(d.lower() for d in block_domains) if block_domains else frozenset()
    pattern = (
        "(" + "|".join(f"(?:{p})" for p in block_url_patterns) + ")"
        if block_url_patterns
        else None
    )
    ref = ray.put((allow, block, pattern))

    def _gate(batch: pa.Table) -> pa.Table:
        al, bl, pat = ray.get(ref)
        urls = batch[url_col].to_pylist()
        canon = canonicalize_urls(urls)
        doms = registrable_domains(canon)
        keep = []
        for d in doms:
            ok = (al is None or d in al) and d not in bl
            keep.append(ok)
        import numpy as np

        keep = np.array(keep, dtype=bool)
        if pat is not None and keep.any():
            hit = pc.match_substring_regex(
                pa.array(canon, pa.string()), pat
            ).to_numpy(zero_copy_only=False)
            keep &= ~hit
        return batch.filter(pa.array(keep))

    return ds.map_batches(_gate, batch_format="pyarrow")
