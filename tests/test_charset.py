"""Charset sniffing + transcode stages (functions/charset.py,
stages/transcode.py): WHATWG sniffing order, label normalization,
lossless legacy-codec roundtrips, and extraction integration."""

from __future__ import annotations

import codecs

import pandas as pd
import pyarrow as pa
import pytest
import ray

from ocr_dataset_builder_ray.functions.charset import (
    decode_payload,
    detect_encoding,
    normalize_label,
)
from ocr_dataset_builder_ray.functions.html_extract import extract_document
from ocr_dataset_builder_ray.stages.transcode import (
    detect_encodings,
    transcode_to_utf8,
)

BODY = "Je bois un café; zażółć gęślą jaźń drops to ASCII here."
ASCII_BODY = "plain ascii body with enough words to matter"


def _page(body: str, decl: bytes, codec: str) -> bytes:
    # an XML declaration is only valid at byte 0; meta lives in <head>
    if decl.startswith(b"<?xml"):
        return decl + b"<html><body><p>" + body.encode(codec) + b"</p></body></html>"
    return (
        b"<html><head>" + decl + b"</head><body><p>"
        + body.encode(codec) + b"</p></body></html>"
    )


@pytest.mark.parametrize(
    "payload,expect_enc,expect_src",
    [
        # BOM precedence over a contradicting meta declaration
        (
            codecs.BOM_UTF16_LE
            + "<meta charset=gb2312><p>hi</p>".encode("utf-16-le"),
            "utf-16le",
            "bom",
        ),
        (codecs.BOM_UTF8 + b"<p>x</p>", "utf-8", "bom"),
        (codecs.BOM_UTF16_BE + "<p>x</p>".encode("utf-16-be"), "utf-16be", "bom"),
        # meta in both forms, label normalization
        (b'<meta charset="ISO-8859-1"><p>x</p>', "windows-1252", "meta"),
        (
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=Shift_JIS"><p>x</p>',
            "shift_jis",
            "meta",
        ),
        (b"<meta charset=GB2312>", "gbk", "meta"),
        # declared utf-16 is treated as utf-8 (spec quirk)
        (b"<meta charset=utf-16><p>x</p>", "utf-8", "meta"),
        # xml declaration
        (b'<?xml version="1.0" encoding="ISO-8859-2"?><x/>', "iso-8859-2", "xml-decl"),
        # undeclared valid utf-8 / pure ascii
        ("café".encode("utf-8"), "utf-8", "utf-8-valid"),
        (b"just ascii", "utf-8", "utf-8-valid"),
        # undeclared invalid utf-8 -> windows-1252 fallback
        (b"caf\xe9 legacy bytes", "windows-1252", "fallback"),
        (b"", "utf-8", "fallback"),
        (None, "utf-8", "fallback"),
        # unknown label falls through to validity check
        (b"<meta charset=klingon-8>caf\xe9", "windows-1252", "fallback"),
    ],
)
def test_detect_encoding(payload, expect_enc, expect_src):
    assert detect_encoding(payload) == (expect_enc, expect_src)


@pytest.mark.parametrize(
    "codec,decl",
    [
        ("windows-1252", b'<meta charset="windows-1252">'),
        ("shift_jis", b"<meta charset=shift_jis>"),
        ("iso-8859-2", b'<?xml version="1.0" encoding="iso-8859-2"?>'),
        ("gbk", b'<meta http-equiv=Content-Type content="text/html; charset=gbk">'),
        ("euc-kr", b"<meta charset=euc-kr>"),
        ("windows-1251", b"<meta charset=windows-1251>"),
    ],
)
def test_declared_roundtrip(codec, decl):
    body = BODY if codec in ("windows-1252",) else ASCII_BODY
    # pick a body each codec can encode strictly
    try:
        body = BODY
        body.encode(codec)
    except UnicodeEncodeError:
        body = ASCII_BODY
    text, enc, src = decode_payload(_page(body, decl, codec))
    assert enc == codec and src in ("meta", "xml-decl")
    assert body in text


def test_utf16_bom_roundtrip():
    payload = codecs.BOM_UTF16_LE + f"<p>{BODY}</p>".encode("utf-16-le")
    text, enc, src = decode_payload(payload)
    assert (enc, src) == ("utf-16le", "bom")
    assert BODY in text and "﻿" not in text


def test_decode_never_raises_on_hostile_bytes():
    for payload in (
        bytes(range(256)),
        b"\xff\xfe\xff\xfe\x00\x00",  # BOM then garbage for utf-16
        b"<meta charset=shift_jis>\x81\x39\xfc\xfc",  # invalid sjis seq
        b"\x80" * 64,
    ):
        text, enc, src = decode_payload(payload)
        assert isinstance(text, str)


def test_normalize_label_table():
    assert normalize_label("LATIN1") == "windows-1252"
    assert normalize_label(b" 'UTF8' ") == "utf-8"
    assert normalize_label("x-sjis") == "shift_jis"
    assert normalize_label("nonsense") is None


def test_extract_document_uses_sniffed_charset():
    page = _page("Un café très fort et du texte principal ici pour le bloc.",
                 b'<meta charset="windows-1252">', "windows-1252")
    res = extract_document(page)
    assert res["status"] == "ok"
    assert "café très" in res["extracted_text"]


def test_extract_document_utf8_path_unchanged():
    """Valid-UTF-8 undeclared payloads must extract byte-identically to
    the plain utf-8 decode (flagship checksum invariance)."""
    html = "<html><body><p>Un café html page with enough chars to keep.</p></body></html>".encode()
    res = extract_document(html)
    assert res["extracted_text"] == extract_document(html.decode())["extracted_text"]


def test_detect_encodings_stage(ray_session):
    rows = pd.DataFrame(
        {
            "url": ["a", "b", "c"],
            "html": [
                b"<p>plain</p>",
                b"<meta charset=gb2312>x",
                b"caf\xe9",
            ],
        }
    )
    got = (
        detect_encodings(ray.data.from_pandas(rows))
        .to_pandas()
        .set_index("url")
    )
    assert got.loc["a", "encoding"] == "utf-8"
    assert got.loc["b", "encoding"] == "gbk"
    assert got.loc["c", "encoding"] == "windows-1252"
    assert got.loc["c", "encoding_source"] == "fallback"


def test_transcode_stage_rewrites_to_utf8(ray_session):
    body = "café pressé"
    rows = pd.DataFrame(
        {
            "url": ["w1252", "u16", "null"],
            "html": pd.Series(
                [
                    _page(body, b"<meta charset=windows-1252>", "windows-1252"),
                    codecs.BOM_UTF16_LE + f"<p>{body}</p>".encode("utf-16-le"),
                    None,
                ],
                dtype=object,
            ),
        }
    )
    got = (
        transcode_to_utf8(ray.data.from_pandas(rows))
        .to_pandas()
        .set_index("url")
    )
    for key in ("w1252", "u16"):
        text = got.loc[key, "html"].decode("utf-8")
        assert body in text
    assert got.loc["null", "html"] is None
    assert got.loc["w1252", "encoding"] == "windows-1252"
    assert got.loc["u16", "encoding"] == "utf-16le"
    # re-sniffing transcoded payloads must find utf-8 EVERYWHERE: the
    # BOM'd page (BOM stripped) by validity, and the meta page because
    # the stale windows-1252 label was rewritten to utf-8 — otherwise a
    # downstream extract (which re-sniffs unconditionally) would
    # double-decode the UTF-8 bytes as the legacy code page
    resniffed = (
        detect_encodings(
            transcode_to_utf8(ray.data.from_pandas(rows)).drop_columns(
                ["encoding", "encoding_source"]
            )
        )
        .to_pandas()
        .set_index("url")
    )
    assert resniffed.loc["u16", "encoding"] == "utf-8"
    assert resniffed.loc["w1252", "encoding"] == "utf-8"
    assert resniffed.loc["w1252", "encoding_source"] == "meta"


def test_transcode_then_extract_no_mojibake(ray_session):
    """The composition the transcode flag exists for: a cp1251 page
    through transcode -> extract_document yields the Cyrillic text,
    not mojibake (the pre-fix behavior double-decoded it)."""
    from ocr_dataset_builder_ray.functions.charset import (
        rewrite_declared_utf8,
    )
    from ocr_dataset_builder_ray.functions.html_extract import (
        extract_document,
    )

    body = "Привет мир — тест"
    raw = (
        "<html><head><meta charset=windows-1251></head>"
        f"<body><p>{body} {body} {body}</p></body></html>"
    ).encode("windows-1251")
    got = (
        transcode_to_utf8(
            ray.data.from_pandas(
                pd.DataFrame({"url": ["p"], "html": pd.Series([raw], dtype=object)})
            )
        )
        .to_pandas()
        .iloc[0]
    )
    assert got["encoding"] == "windows-1251"
    doc = extract_document(got["html"])
    assert body in doc["extracted_text"] and "�" not in doc["extracted_text"]
    # an already-utf-8 declaration is left byte-identical
    ok = f'<meta charset="utf-8"><p>{body}</p>'
    assert rewrite_declared_utf8(ok) == ok
