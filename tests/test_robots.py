"""RFC 9309 robots.txt parsing/matching + the compliance gate stage."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_dataset_builder_ray.functions.robots import (
    parse_robots,
    robots_filter,
)

BASIC = b"""
# comment line
User-agent: *
Disallow: /private/
Allow: /private/public-page
Disallow: /tmp
"""


def test_longest_match_wins_and_default_allow():
    r = parse_robots(BASIC)
    assert r.allowed("/")  # no rule matches
    assert not r.allowed("/private/secret.html")
    assert r.allowed("/private/public-page")  # longer Allow overrides
    assert not r.allowed("/tmp")
    assert not r.allowed("/tmpfile")  # prefix match, no anchor


def test_wildcard_and_end_anchor():
    r = parse_robots(b"User-agent: *\nDisallow: /*.gif$\nDisallow: /a*b/")
    assert not r.allowed("/images/cat.gif")
    assert r.allowed("/images/cat.gif?x=1")  # $ anchors the very end
    assert r.allowed("/images/cat.gifs")
    assert not r.allowed("/a-anything-b/child")
    assert r.allowed("/ab")  # pattern requires the trailing slash


def test_allow_wins_length_tie():
    r = parse_robots(b"User-agent: *\nDisallow: /page\nAllow: /page")
    assert r.allowed("/page")


def test_empty_disallow_is_noop():
    r = parse_robots(b"User-agent: *\nDisallow:")
    assert r.allowed("/anything")


def test_agent_group_selection():
    txt = b"""
User-agent: *
Disallow: /

User-agent: goodbot
User-agent: otherbot
Disallow: /nope/
"""
    star = parse_robots(txt, "unknownbot")
    assert not star.allowed("/anywhere")  # falls to the * group
    good = parse_robots(txt, "GoodBot")  # case-insensitive exact token
    assert good.allowed("/anywhere")  # exact group REPLACES *, not adds
    assert not good.allowed("/nope/deeper")
    other = parse_robots(txt, "otherbot")  # shared rule block
    assert not other.allowed("/nope/x") and other.allowed("/ok")


def test_hostile_inputs_never_raise():
    for payload in (None, b"", b"\xff\xfe garbage \x00", b"Disallow: /orphan",
                    b"User-agent: *\nNonsense-line-without-colon"):
        r = parse_robots(payload)
        assert r.allowed("/x")


def test_robots_filter_stage(ray_session):
    pages = pd.DataFrame(
        {
            "url": [
                "https://a.com/keep",
                "https://a.com/private/x",
                "https://a.com/private/public-page",
                "https://sub.a.com/private/y",  # registrable domain a.com
                "https://b.org/anything",  # robots row with None payload
                "https://c.net/whatever",  # no robots row at all
            ],
            "n": list(range(6)),
        }
    )
    robots = pd.DataFrame(
        {
            "domain": ["a.com", "b.org"],
            "robots_txt": [BASIC, None],
        }
    )
    outs = []
    for nparts in (1, 4):
        ds = ray.data.from_pandas(pages).repartition(nparts)
        got = robots_filter(ds, robots).to_pandas()
        outs.append(sorted(got["url"]))
    assert outs[0] == outs[1] == [
        "https://a.com/keep",
        "https://a.com/private/public-page",
        "https://b.org/anything",
        "https://c.net/whatever",
    ]
    # default_allow=False drops every url with no usable robots info:
    # the missing-row domain (c.net) AND the None-payload row (b.org —
    # "no reachable robots.txt" is the same state as no row)
    strict = robots_filter(
        ray.data.from_pandas(pages),
        ray.data.from_pandas(robots),
        default_allow=False,
    ).to_pandas()
    assert sorted(strict["url"]) == [
        "https://a.com/keep",
        "https://a.com/private/public-page",
    ]


def test_robots_filter_matches_raw_url_not_canonical(ray_session):
    """Directory disallows and query rules must match the RAW url:
    canonicalization strips trailing slashes and tracking params,
    which would silently un-match them (under-blocking)."""
    pages = pd.DataFrame(
        {
            "url": [
                "https://a.com/private/",       # dir disallow, bare
                "https://a.com/private",        # NOT under /private/
                "https://a.com/x?utm_source=nl" # query-pattern rule
            ]
        }
    )
    robots = pd.DataFrame(
        {
            "domain": ["a.com"],
            "robots_txt": [b"User-agent: *\nDisallow: /private/\nDisallow: /*utm_source="],
        }
    )
    got = robots_filter(ray.data.from_pandas(pages), robots).to_pandas()
    assert got["url"].tolist() == ["https://a.com/private"]
