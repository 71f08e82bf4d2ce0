"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Generates the engine's primary input table::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

entirely from a fixed seed — no wall clock, no unseeded RNG — so any
two generations of row *i* are byte-identical regardless of process or
parallelism (the determinism contract the whole extraction gate rests
on). Every row's content is a pure function of ``(seed, i)``.

Edge-case rows required by FIXTURES.md §1 sit at fixed small indices
(and oversized blobs recur periodically so they exist at bench scale):

    i=1  empty html                      i=7  duplicate url of i=6
    i=2  malformed/truncated html        i=8  append-only revision of i=6
    i=3  whitespace-only content         i=9  NFC-decomposed + Arabic RTL
    i=4  CRLF/tabs/blank-line noise      i=10 speaker-prefix lines
    i=5  oversized html blob             i=11 link-only page
    (plus every row with i % 1000 == 777 is oversized)

The ``text`` column is the clean article text degraded by a
url-hash-seeded profile from functions/augment.py — the analogue of raw
Tesseract OCR text (FIXTURES.md §1 "text").
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.augment import apply_profile, profile_for_key
from ..functions.hashing import stable_hash64
from ..functions.layout_extract import render_fake_pdf

SEED = 42
CORPUS_VERSION = 2  # bump when generation logic changes (cache key)
PDF_PERIOD = 13  # rows with i % 13 == 12 (i > 11) are FAKE-PDF payloads
EPOCH_US = 1_750_377_600_000_000  # 2025-06-20T00:00:00Z in microseconds
LANGS = ("en", "de", "fr", "es", "ar")
OVERSIZE_PERIOD = 1000
OVERSIZE_PHASE = 777

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_WORDS = {
    "en": (
        "the quick brown fox jumps over a lazy dog while data engines stream "
        "arrow batches across nodes with careful backpressure and spill "
        "handling content extraction keeps main text dropping navigation "
        "boilerplate from every page corpus quality matters at scale"
    ).split(),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während "
        "datenmaschinen pfeilstapel über knoten streamen mit sorgfältigem "
        "gegendruck inhalte extraktion behält haupttext und verwirft "
        "navigation aus jeder seite qualität zählt bei großem maßstab"
    ).split(),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux pendant "
        "que les moteurs de données diffusent des lots de flèches entre les "
        "nœuds extraction du contenu principal garde le texte et rejette la "
        "navigation de chaque page la qualité compte à grande échelle"
    ).split(),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso mientras los "
        "motores de datos transmiten lotes de flechas entre nodos la "
        "extracción de contenido conserva el texto principal y descarta la "
        "navegación de cada página la calidad importa a gran escala"
    ).split(),
    "ar": (
        "الثعلب البني السريع يقفز فوق الكلب الكسول بينما تقوم محركات "
        "البيانات ببث دفعات عبر العقد استخراج المحتوى يحتفظ بالنص الرئيسي "
        "ويتجاهل التنقل من كل صفحة الجودة مهمة على نطاق واسع"
    ).split(),
}

_NAV_LINKS = ["Home", "Products", "Pricing", "Blog", "Docs", "About", "Careers"]


def _sentence(rng: random.Random, words: list[str]) -> str:
    n = rng.randint(5, 14)
    toks = [words[rng.randrange(len(words))] for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str], n_sent: tuple[int, int] = (2, 6)) -> str:
    return " ".join(_sentence(rng, words) for _ in range(rng.randint(*n_sent)))


def _article(rng: random.Random, lang: str, n_paras: int) -> tuple[str, list[str]]:
    """(title, paragraphs) of clean article text."""
    words = _WORDS[lang]
    title = _sentence(rng, words)[:-1]
    return title, [_paragraph(rng, words) for _ in range(n_paras)]


def _boiler_header() -> str:
    items = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in _NAV_LINKS)
    return f"<header><nav><ul>{items}</ul></nav></header>"


def _boiler_footer() -> str:
    links = " | ".join(f'<a href="/{w.lower()}">{w}</a>' for w in _NAV_LINKS[:4])
    return f"<footer><p>{links}</p><p>© 2025 Example Corp</p></footer>"


def _render_html(
    rng: random.Random, lang: str, title: str, paras: list[str]
) -> str:
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="{lang}"><head><title>{title}</title>',
        "<style>body { margin: 0; } nav a { color: blue }</style>",
        '<script>var tracker = "do-not-extract"; function f(){return 1;}</script>',
        "</head><body>",
        _boiler_header(),
        "<main>",
        f"<h1>{title}</h1>",
    ]
    for j, para in enumerate(paras):
        parts.append(f"<p>{para}</p>")
        if j == 1 and rng.random() < 0.5:
            code = "def f(x):\n    return x * " + str(rng.randint(2, 9))
            parts.append(f"<pre><code>{code}</code></pre>")
        if j == 2 and rng.random() < 0.4:
            items = "".join(
                f"<li>{_sentence(rng, _WORDS[lang])}</li>" for _ in range(3)
            )
            parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.3:
        cells = "".join(
            f"<tr><td>{_sentence(rng, _WORDS[lang])}</td>"
            f"<td>{_sentence(rng, _WORDS[lang])}</td></tr>"
            for _ in range(2)
        )
        parts.append(f"<table>{cells}</table>")
    parts.append("</main>")
    parts.append('<aside><p><a href="/r1">Related one</a> <a href="/r2">Related two</a></p></aside>')
    parts.append(_boiler_footer())
    parts.append("</body></html>")
    return "".join(parts)


def _edge_case_html(i: int, rng: random.Random, lang: str) -> bytes | None:
    """Fixed-index edge-case payloads; None -> normal path."""
    words = _WORDS[lang]
    if i == 1:
        return b""
    if i == 2:
        return b"<html><body><p>Truncated paragraph with a stray < bracket <di"
    if i == 3:
        return "<html><body><p>   \t  \n   </p><div>  </div></body></html>".encode()
    if i == 4:
        body = (
            "Line one  with   runs.\r\nCarriage\rreturn mix.\t\tTabbed\tcells."
            "\n\n\n\nAfter many blanks."
        )
        return f"<html><body><p>{body}</p></body></html>".encode()
    if i == 9:
        decomposed = "Café résumé — déjà vu naïve"
        arabic = " ".join(_WORDS["ar"][:12])
        return (
            f"<html><body><p>{decomposed} and more latin text here.</p>"
            f"<p>{arabic}</p></body></html>"
        ).encode()
    if i == 10:
        lines = "<br>".join(
            f"Speaker{k}: {_sentence(rng, words)}" for k in range(1, 5)
        )
        return f"<html><body><p>{lines}</p></body></html>".encode()
    if i == 11:
        links = " ".join(f'<a href="/x{k}">link {k}</a>' for k in range(12))
        return (
            f"<html><body>{_boiler_header()}<p>{links}</p>{_boiler_footer()}"
            "</body></html>"
        ).encode()
    return None


def is_oversized_index(i: int) -> bool:
    return i == 5 or i % OVERSIZE_PERIOD == OVERSIZE_PHASE


def gen_row(i: int, seed: int = SEED) -> dict:
    """Generate row *i* — pure function of (seed, i)."""
    host = stable_hash64(f"{seed}:host:{i // 7}") % 500  # ~7 pages/host
    url = f"https://host{host:04d}.example.com/p/{i:06d}"
    lang = LANGS[i % len(LANGS)]
    rng = random.Random(stable_hash64(f"{seed}:{url}") ^ seed)
    ts = EPOCH_US + i * 1_000_000

    if i == 7:
        # duplicate url of row 6 at a later capture time (FIXTURES §1.6)
        row = gen_row(6, seed)
        return {**row, "warc_ts": ts}
    if i == 8:
        # append-only revision of row 6 (FIXTURES §1.7): same url,
        # content plus one appended paragraph
        base = gen_row(6, seed)
        extra = _paragraph(random.Random(stable_hash64(f"{seed}:rev:{i}")), _WORDS[LANGS[6 % 5]])
        html = base["html"].replace(
            b"</main>", f"<p>{extra}</p></main>".encode(), 1
        )
        return {**base, "warc_ts": ts, "html": html}

    edge = _edge_case_html(i, rng, lang)
    if edge is not None:
        clean = ""  # edge rows: degraded-text column is empty or trivial
        return {"url": url, "warc_ts": ts, "html": edge, "text": clean, "lang": lang}

    if i > 11 and i % PDF_PERIOD == PDF_PERIOD - 1:
        # PDF-embedded page: two-column positioned-text payload routed
        # through the layout extractor (north-star PDF path)
        title, paras = _article(rng, lang, rng.randint(3, 7))
        half = (len(paras) + 1) // 2
        payload = render_fake_pdf([[title] + paras[:half], paras[half:]])
        clean = "\n".join([title] + paras)
        noisy = apply_profile(profile_for_key(url), clean, url)
        return {"url": url, "warc_ts": ts, "html": payload, "text": noisy, "lang": lang}

    n_paras = 40 if is_oversized_index(i) else rng.randint(3, 8)
    title, paras = _article(rng, lang, n_paras)
    if is_oversized_index(i):
        # oversized blob: repeat paragraphs until ≥ ~400 KiB of html
        while sum(len(p) for p in paras) < 400_000:
            paras = paras + paras
    html = _render_html(rng, lang, title, paras).encode()
    clean = "\n".join([title] + paras)
    noisy = apply_profile(profile_for_key(url), clean, url)
    return {"url": url, "warc_ts": ts, "html": html, "text": noisy, "lang": lang}


def rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def gen_table(n_rows: int, seed: int = SEED, start: int = 0) -> pa.Table:
    return rows_to_table([gen_row(i, seed) for i in range(start, start + n_rows)])


def generate_pages_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = SEED,
    rows_per_file: int = 4096,
    use_ray: bool | None = None,
) -> str:
    """Write the corpus as a directory of Parquet files; idempotent.

    A ``_SUCCESS`` marker makes generation resumable/cacheable: if it
    exists the corpus is reused as-is. File *k* holds rows
    ``[k*rows_per_file, (k+1)*rows_per_file)`` — deterministic layout,
    independent of the writer's parallelism.
    """
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    shards = [
        (k, s, min(rows_per_file, n_rows - s))
        for k, s in enumerate(range(0, n_rows, rows_per_file))
    ]
    if use_ray is None:
        import ray

        use_ray = n_rows >= 20_000 and ray.is_initialized()
    if use_ray:
        import ray

        @ray.remote
        def _write(k: int, s: int, n: int) -> None:
            pq.write_table(
                gen_table(n, seed, start=s),
                os.path.join(out_dir, f"pages-{k:05d}.parquet"),
            )

        ray.get([_write.remote(k, s, n) for k, s, n in shards])
    else:
        for k, s, n in shards:
            pq.write_table(
                gen_table(n, seed, start=s),
                os.path.join(out_dir, f"pages-{k:05d}.parquet"),
            )
    with open(marker, "w") as f:
        f.write(f"n_rows={n_rows} seed={seed} rows_per_file={rows_per_file}\n")
    return out_dir


def default_corpus_dir(n_rows: int, seed: int = SEED) -> str:
    root = os.environ.get("GRAFT_PAGES_CACHE", "/tmp/graft_pages")
    return os.path.join(root, f"n{n_rows}_s{seed}_v{CORPUS_VERSION}")


def pages_parquet_files(corpus_dir: str) -> list[str]:
    return sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
