"""Deterministic synthetic Common-Crawl-style corpus (SURVEY §7.1 step 1).

Generates the input table ``(url, warc_ts, html, text, lang)`` from
BASELINE.json's ``input_hint``: ru/kk/en HTML pages with known main
content wrapped in boilerplate (nav link farms, header/footer, ad
sidebars) plus ~10% ``%PDF`` payloads with coordinate text blocks
(shuffled emission order, some uniformly skewed — exercising L2/L3).

Engineered rows (FIXTURES.md §1):
- oversized payloads (> salt threshold) — the skew-split path;
- Cyrillic/Latin homoglyph traps (R3 normalization);
- empty ``<body>`` (empty-extraction guard, R2 — whose reference twin
  silently DROPS such rows, easy_ocr.py:49-52; we keep them);
- malformed HTML (error-tolerance path);
- windows-1251 pages with a ``meta charset`` declaration (§1.4);
- null ``lang`` rows (R6 language-vote fill-in).

Everything is seeded per-row (``random.Random(f"{seed}:{i}")``) — no
wall clock, no global RNG state, stable across processes, so any
subset/partition of rows can be regenerated independently (this is also
how the bench generates its corpus inside executors without shipping
data).
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Any, Iterator

from . import pdf_extract

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

WORDS = {
    "en": (
        "the quick brown fox jumps over lazy dog stream table query spark "
        "window batch column data page crawl text block content reader "
        "value index shard merge token parse order filter score media "
        "signal output vector record branch cache"
    ).split(),
    "ru": (
        "быстрый рыжий лис прыгает через ленивую собаку поток таблица запрос "
        "окно пакет столбец данные страница текст блок содержимое читатель "
        "значение индекс сегмент слияние токен разбор порядок фильтр оценка "
        "сигнал вывод вектор запись ветка кэш число слово язык буква"
    ).split(),
    "kk": (
        "жылдам түлкі жалқау ит үстінен секіреді ағын кесте сұраныс терезе "
        "бума баған дерек бет мәтін блок мазмұн оқырман мән индекс сегмент "
        "біріктіру таңба талдау тәртіп сүзгі баға сигнал шығыс вектор жазба "
        "қазақша әліпби өзен ұлттық ғылым һәм іс"
    ).split(),
}

# Homoglyph traps: visually-identical mixed-script tokens (R3).
TRAPS = {
    "en": ["Тoken", "Сache", "Аpple", "Мodel"],  # Cyrillic first letters
    "ru": ["Tекст", "Cлово", "Mетка"],  # Latin first letters
    "kk": ["Tаңба", "Cөз"],
}
# Characters outside every alphabet — must be dropped by normalization.
NOISE = ["§", "€", "✓", "中"]

LANG_WEIGHTS = [("ru", 0.4), ("en", 0.4), ("kk", 0.2)]


def _pick_lang(rng: random.Random) -> str:
    x = rng.random()
    acc = 0.0
    for lang, w in LANG_WEIGHTS:
        acc += w
        if x < acc:
            return lang
    return "en"


def _words(rng: random.Random, lang: str, n: int, ascii_safe: bool = False) -> str:
    pool = WORDS[lang]
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.03 and not ascii_safe:
            out.append(rng.choice(TRAPS[lang]))
        elif r < 0.05 and not ascii_safe:
            out.append(rng.choice(NOISE))
        elif r < 0.12:
            out.append(str(rng.randint(0, 9999)))
        else:
            out.append(rng.choice(pool))
    return " ".join(out)


def _link_list(rng: random.Random, lang: str, n: int) -> str:
    items = "".join(
        f'<li><a href="/{i}">{rng.choice(WORDS[lang])}</a></li>' for i in range(n)
    )
    return f"<ul>{items}</ul>"


def _build_html(
    rng: random.Random,
    lang: str,
    n_paras: int,
    charset: str = "utf-8",
    malformed: bool = False,
    empty_body: bool = False,
    declare_charset: bool = True,
) -> bytes:
    meta = f'<meta charset="{charset}">' if declare_charset else ""
    head = f"<head>{meta}<title>{_words(rng, lang, 3)}</title></head>"
    if empty_body:
        doc = f"<!DOCTYPE html><html>{head}<body></body></html>"
        return doc.encode(charset, errors="replace")
    nav = f"<nav>{_link_list(rng, lang, rng.randint(4, 10))}</nav>"
    header = f'<div class="site-header">{_words(rng, lang, 4)}</div>'
    aside = (
        f'<aside class="sidebar ads">{_link_list(rng, lang, rng.randint(3, 8))}'
        f"<p><a href=\"/promo\">{_words(rng, lang, 2)}</a></p></aside>"
    )
    paras = []
    if rng.random() < 0.9:
        paras.append(f"<h1>{_words(rng, lang, rng.randint(2, 5))}</h1>")
    for p in range(n_paras):
        if p and rng.random() < 0.12:
            paras.append(f"<h2>{_words(rng, lang, rng.randint(2, 4))}</h2>")
        paras.append(f"<p>{_words(rng, lang, rng.randint(8, 40))}</p>")
    content = f'<div class="content">{"".join(paras)}</div>'
    footer = f"<footer>{_words(rng, lang, 6)} <a href='/x'>©</a></footer>"
    body = f"<body>{nav}{header}{content}{aside}{footer}</body>"
    if malformed:
        body = body.replace("</p>", "", 2).replace("</body>", "")
    doc = f"<!DOCTYPE html><html>{head}{body}"
    if not malformed:
        doc += "</html>"
    return doc.encode(charset, errors="replace")


def _build_pdf(rng: random.Random, lang: str) -> bytes:
    """Mini-PDF variants: ~40% multi-page (2-3 pages), ~60% FlateDecode
    compressed streams — the shapes real Common-Crawl PDFs carry."""
    n_pages = 1 if rng.random() < 0.6 else rng.randint(2, 3)
    compress = rng.random() < 0.6
    pages: list[list[tuple[float, float, str]]] = []
    for _ in range(n_pages):
        n_rows = rng.randint(3, 8)
        blocks: list[tuple[float, float, str]] = []
        for r in range(n_rows):
            y = 60.0 + r * 30.0 + rng.uniform(-3.0, 3.0)
            for c in range(rng.randint(1, 3)):
                x = 40.0 + c * 180.0 + rng.uniform(-5.0, 5.0)
                blocks.append((x, y, _words(rng, lang, rng.randint(2, 5))))
        rng.shuffle(blocks)
        pages.append(blocks)
    angle = rng.uniform(-0.15, 0.15) if rng.random() < 0.3 else 0.0
    return pdf_extract.build_pdf_pages(pages, angle=angle, compress=compress)


def gen_rows(n: int, seed: int = 42) -> Iterator[dict[str, Any]]:
    """Yield *n* deterministic page rows (row i == _gen_row(i, seed))."""
    for i in range(n):
        yield _gen_row(i, seed)


def pages_df(spark, n: int, seed: int = 42, parallelism: int | None = None):
    """Distributed corpus: rows generated INSIDE executors via
    mapInPandas over an index range (per-row seeding makes any row
    independently computable — no driver-side materialization, no data
    shipping; the generator scales with the cluster)."""
    import pandas as pd

    from .pipeline import PAGES_SCHEMA

    def gen_batches(batches):
        for pdf in batches:
            idx = pdf["id"].tolist()
            rows = [_gen_row(i, seed) for i in idx]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    par = parallelism or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n, 1, par)
    return rng.mapInPandas(gen_batches, schema=PAGES_SCHEMA)


def _gen_row(i: int, seed: int) -> dict[str, Any]:
    """Generate row *i* alone (same output as gen_rows(n)[i])."""
    rng = random.Random(f"{seed}:{i}")
    lang = _pick_lang(rng)
    url = f"https://{lang}.example.org/doc/{i:06d}"
    ts = BASE_TS + dt.timedelta(seconds=i)
    oversized = i % 97 == 13
    empty_body = i % 101 == 5 and not oversized
    malformed = i % 103 == 7 and not (oversized or empty_body)
    is_pdf = rng.random() < 0.10 and not (oversized or empty_body or malformed)
    cp1251 = (
        lang == "ru"
        and not (is_pdf or oversized or empty_body or malformed)
        and rng.random() < 0.15
    )
    if is_pdf:
        payload = _build_pdf(rng, lang)
    else:
        payload = _build_html(
            rng,
            lang,
            n_paras=400 if oversized else rng.randint(3, 12),
            charset="windows-1251" if cp1251 else "utf-8",
            malformed=malformed,
            empty_body=empty_body,
            # some legacy pages never declare their encoding: the
            # detect_legacy_encoding heuristic must recover them
            # (index-based condition — rng draw sequence untouched)
            declare_charset=not (cp1251 and i % 7 == 3),
        )
    stale = _words(rng, lang, 10) if rng.random() < 0.3 else None
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": stale,
        "lang": None if i % 50 == 7 else lang,
    }


def write_pages_parquet(
    path: str, n: int, seed: int = 42, start: int = 0
) -> None:
    """Materialize corpus rows [start, start+n) as one parquet file
    (pyarrow, no Spark).  ``start`` lets tests simulate incremental
    drops of later row ranges."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [_gen_row(i, seed) for i in range(start, start + n)]
    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
