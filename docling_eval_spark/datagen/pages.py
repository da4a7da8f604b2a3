"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
where ``text`` is the ground-truth main-content text the extraction
kernel must recover byte-identically.

Construction guarantees (so ground truth is defined *by construction*,
not by running the extractor — no circularity):

- content paragraphs always have ≥ 18 words → kept by the
  NumWordsRules tree regardless of context;
- headings are always immediately followed by a ≥ 18-word paragraph →
  kept via the next-block rule; list items / captions always follow a
  content block → kept via the prev-block rule;
- boilerplate lives under <nav>/<header>/<footer>/<aside> (ancestor
  rule) or is pure-link text (link density 1 > 1/3), placed only at
  the end of the article so it cannot perturb neighbors' context
  features;
- tables and <head> content are excluded from ``text`` by contract
  (tables come out as structured grids instead).

Every page is a pure function of (seed, row index): generation runs
distributed via ``spark.range(n).mapInPandas`` and reproduces exactly
at any parallelism.
"""

from __future__ import annotations

import html as _html
import random
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from docling_eval_spark.extraction.kernel import BLOCK_SEP, normalize_ws

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_WORDS = (
    "the of and to in a is that it for on with as by this from "
    "data spark shuffle page crawl index tokens vector column batch "
    "query engine parquet arrow schema filter join window rollup metric "
    "layout table cell span header footer anchor corpus document extract "
    "boiler content block density words link signal quality language "
    "partition bucket salt skew scale executor driver codegen plan "
    "pipeline stream state lineage resume commit snapshot manifest"
).split()
# tokens exercising HTML escaping round-trips
_SPICY = ["AT&T", "a<b", "x>y", '"quoted"', "it's"]

_N_HOSTS = 64
_HOST_WEIGHTS = [1.0 / (k + 1) for k in range(_N_HOSTS)]  # Zipf-ish skew
_LANGS = ["en", "de", "fr", "ja"]

_EPOCH = pd.Timestamp("2024-01-01 00:00:00")


def _words(rng: random.Random, n: int) -> str:
    out = []
    for _ in range(n):
        if rng.random() < 0.03:
            out.append(rng.choice(_SPICY))
        else:
            out.append(rng.choice(_WORDS))
    return " ".join(out)


def _nav_html(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 5)
    )
    return f'<header><div class="logo">SynthSite</div><nav>{links}</nav></header>'


def _table_lattice(
    rng: random.Random,
) -> tuple[list[list[tuple[str, int, int]]], dict[str, Any]]:
    """Shared synthetic-table shape: per row, the anchor cells as
    (text, row_span, col_span); rendered to HTML (_table_html) or the
    MiniPDF cell grammar (_table_grammar)."""
    nrows = rng.randint(2, 5)
    ncols = rng.randint(2, 4)
    merge = rng.random() < 0.5  # one rowspan/colspan merge → "complex" table
    rows: list[list[tuple[str, int, int]]] = []
    merged = False
    skip: set[tuple[int, int]] = set()
    for r in range(nrows):
        cells: list[tuple[str, int, int]] = []
        c = 0
        while c < ncols:
            if (r, c) in skip:
                c += 1
                continue
            if merge and r == 1 and c == 0 and nrows >= 3:
                cells.append((f"r{r}c{c}", 2, 1))
                skip.add((r + 1, c))
                merged = True
                c += 1
            elif merge and r == 0 and ncols >= 3 and c == ncols - 2:
                cells.append((f"r{r}c{c}", 1, 2))
                merged = True
                c += 2
            else:
                cells.append((f"r{r}c{c}", 1, 1))
                c += 1
        rows.append(cells)
    spec = {"num_rows": nrows, "num_cols": ncols, "complex": merged}
    return rows, spec


def _table_html(rng: random.Random) -> tuple[str, dict[str, Any]]:
    lattice, spec = _table_lattice(rng)
    rows = []
    for r, cells in enumerate(lattice):
        tag = "th" if r == 0 else "td"
        out = []
        for text, rs, cs in cells:
            attrs = (f' rowspan="{rs}"' if rs > 1 else "") + (
                f' colspan="{cs}"' if cs > 1 else ""
            )
            out.append(f"<{tag}{attrs}>{text}</{tag}>")
        rows.append("<tr>" + "".join(out) + "</tr>")
    return "<table>" + "".join(rows) + "</table>", spec


def _table_grammar(rng: random.Random) -> tuple[str, dict[str, Any]]:
    """Same lattice rendered as the MiniPDF cell grammar
    (extraction.tables.parse_cell_grammar)."""
    lattice, spec = _table_lattice(rng)
    rows = []
    for cells in lattice:
        rows.append(
            " | ".join(
                (f"{rs}x{cs}>{text}" if (rs, cs) != (1, 1) else text)
                for text, rs, cs in cells
            )
        )
    return "\n".join(rows), spec


def _gen_html_page(rng: random.Random, doc_id: int) -> tuple[bytes, str, list[dict]]:
    gt: list[str] = []
    body: list[str] = [_nav_html(rng)]
    tables: list[dict] = []
    body.append("<main><article>")

    h1 = _words(rng, rng.randint(4, 8))
    body.append(f"<h1>{_html.escape(h1)}</h1>")
    gt.append(h1)

    n_sections = rng.randint(1, 4)
    first = True
    for _ in range(n_sections):
        if not first and rng.random() < 0.7:
            h2 = _words(rng, rng.randint(4, 8))
            body.append(f"<h2>{_html.escape(h2)}</h2>")
            gt.append(h2)
        para = _words(rng, rng.randint(18, 40))
        body.append(f"<p>{_html.escape(para)}</p>")
        gt.append(para)
        first = False
        if rng.random() < 0.3:
            items = [_words(rng, rng.randint(5, 10)) for _ in range(rng.randint(2, 4))]
            body.append(
                "<ul>" + "".join(f"<li>{_html.escape(i)}</li>" for i in items) + "</ul>"
            )
            gt.extend(items)
        if rng.random() < 0.4:
            tbl, spec = _table_html(rng)
            body.append(tbl)
            tables.append(spec)
            # a table breaks prev-context, so re-anchor with a long paragraph
            para2 = _words(rng, rng.randint(18, 30))
            body.append(f"<p>{_html.escape(para2)}</p>")
            gt.append(para2)
        if rng.random() < 0.2:
            cap = _words(rng, rng.randint(3, 6))
            body.append(f"<figure><figcaption>{_html.escape(cap)}</figcaption></figure>")
            gt.append(cap)
    # link-farm div at article end only (cannot perturb later context)
    rel = "".join(f'<a href="/{w}">{w} {w}</a> ' for w in rng.sample(_WORDS, 4))
    body.append(f'<div class="related">{rel}</div>')
    body.append("</article></main>")
    body.append(
        f"<aside><p>{_words(rng, 12)}</p></aside>"
        f"<footer><p>© 2024 SynthSite {doc_id}</p></footer>"
    )
    title = _words(rng, 3)
    html_doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body{margin:0}</style>"
        '<script>var x = "<p>not text</p>";</script>'
        "</head><body>" + "".join(body) + "</body></html>"
    )
    text = BLOCK_SEP.join(normalize_ws(t) for t in gt)
    return html_doc.encode("utf-8"), text, tables


def _gen_minipdf_page(
    rng: random.Random, doc_id: int
) -> tuple[bytes, str, list[dict]]:
    """MiniPDF layout doc; blocks written in shuffled order, ground
    truth in geometric reading order (exercises the XY-cut path).
    ~60% of docs carry a table block (cell-grammar payload) below the
    body — excluded from text by contract, extracted as a grid."""
    two_col = rng.random() < 0.4
    width, height = 612.0, 792.0
    blocks: list[tuple[str, float, float, float, float, str]] = []
    y = 72.0
    title = _words(rng, rng.randint(3, 6))
    blocks.append(("title", 72.0, y, 540.0, y + 20, title))
    y += 36
    cols = (
        [(72.0, 296.0), (316.0, 540.0)] if two_col else [(72.0, 540.0)]
    )
    texts_by_col: list[list[str]] = []
    max_cy = y
    for (lx, rx) in cols:
        col_texts = []
        cy = y
        for _ in range(rng.randint(2, 4)):
            para = _words(rng, rng.randint(10, 25))
            h = 14.0 * (1 + len(para) // 60)
            blocks.append(("text", lx, cy, rx, cy + h, para))
            col_texts.append(para)
            cy += h + 10
        texts_by_col.append(col_texts)
        max_cy = max(max_cy, cy)
    tables: list[dict] = []
    if rng.random() < 0.6:
        grammar, spec = _table_grammar(rng)
        # full-width block strictly below every column so the XY-cut
        # reading order of the text blocks is unchanged
        blocks.append(
            ("table", 72.0, max_cy + 20, 540.0, max_cy + 80, grammar)
        )
        tables.append(spec)
    # ground truth: title first (spans mid-line → col 0, smallest top),
    # then left column top-down, then right column
    gt = [title] + [t for col in texts_by_col for t in col]
    order = list(range(len(blocks)))
    rng.shuffle(order)
    lines = ["%PDF-MINI 1.0", f"P 1 {width} {height}"]
    for i in order:
        label, l, t, r, b, txt = blocks[i]
        esc = txt.replace("\\", "\\\\").replace("\n", "\\n")
        lines.append(f"B {label} {l} {t} {r} {b} {esc}")
    data = "\n".join(lines).encode("utf-8")
    text = BLOCK_SEP.join(normalize_ws(t) for t in gt)
    return data, text, tables


def _gen_realpdf_page(rng: random.Random) -> tuple[bytes, str, list[dict]]:
    """Real PDF bytes (see extraction/pdf_write.py); GT = paragraphs in
    written (top-down) order, matching the content-stream parser +
    XY-cut linearization. ~50% of docs append a unit-cell table lattice
    on page 1 (recovered by pdf_real.recover_table_blocks; excluded
    from text by contract)."""
    from docling_eval_spark.extraction.pdf_write import simple_pdf

    n_pages = rng.randint(1, 2)
    pages = [
        [_words(rng, rng.randint(6, 14)) for _ in range(rng.randint(2, 5))]
        for _ in range(n_pages)
    ]
    tables: list[dict] = []
    table_pages: list[list[list[str | None]] | None] = [None] * n_pages
    if rng.random() < 0.5:
        nrows = rng.randint(2, 4)
        ncols = rng.randint(2, 3)
        grid: list[list[str | None]] = [
            [f"t{r}c{c}" for c in range(ncols)] for r in range(nrows)
        ]
        merged = False
        if ncols >= 3 and rng.random() < 0.5:
            # one colspan-2 cell in a body row; recovery infers the
            # span from the missing lattice slot
            grid[1][ncols - 1] = None
            merged = True
        tables.append({"num_rows": nrows, "num_cols": ncols, "complex": merged})
        table_pages[0] = grid
    data = simple_pdf(pages, compress=rng.random() < 0.5, table_pages=table_pages)
    text = BLOCK_SEP.join(normalize_ws(p) for pg in pages for p in pg)
    return data, text, tables


def gen_page(i: int, seed: int = 42) -> dict[str, Any]:
    """Pure function of (seed, i) → one pages-table row (+ table specs)."""
    rng = random.Random((seed << 32) ^ i)
    host = rng.choices(range(_N_HOSTS), weights=_HOST_WEIGHTS, k=1)[0]
    url = f"https://host{host}.example/{seed}/{i}"
    lang = _LANGS[host % len(_LANGS)]
    if i % 10 == 7:
        data, text, tables = _gen_minipdf_page(rng, i)
    elif i % 10 == 3:
        data, text, tables = _gen_realpdf_page(rng)
    else:
        data, text, tables = _gen_html_page(rng, i)
    return {
        "url": url,
        "warc_ts": _EPOCH + pd.Timedelta(seconds=(i * 137) % 31_536_000),
        "html": data,
        "text": text,
        "lang": lang,
        "_tables": tables,
    }


SENTINEL_TMPL = (
    "Synthetic corpus document {doc_id} rendered deterministically for "
    "extraction parity checking with exactly eighteen words in this "
    "closing sentinel paragraph here."
)


def render_page_for_text(doc_id: int, text: str, lang: str = "en") -> bytes:
    """Wrap arbitrary driver-provided text (documents.text) into a full
    page with boilerplate. Ground-truth recovery contract::

        extract_text(render_page_for_text(i, t)) ==
            normalize_ws(t) + BLOCK_SEP + SENTINEL_TMPL.format(doc_id=i)

    The ≥18-word sentinel paragraph guarantees the (possibly short)
    text paragraph is classified content via the next-block rule, and
    is itself kept via the prev-block rule — SQL-expressible, so the
    DuckDB oracle can reproduce the expected md5 (see __spark_entry__).
    """
    rng = random.Random((1 << 60) ^ doc_id)
    sentinel = SENTINEL_TMPL.format(doc_id=doc_id)
    body = (
        _nav_html(rng)
        + "<main><article>"
        + f"<p>{_html.escape(text)}</p>"
        + f"<p>{_html.escape(sentinel)}</p>"
        + "</article></main>"
        + f"<footer><p>© 2024 SynthSite {doc_id}</p></footer>"
    )
    doc = (
        "<!DOCTYPE html><html><head><title>doc</title></head><body>"
        + body
        + "</body></html>"
    )
    return doc.encode("utf-8")


def render_documents_stage(docs_df: DataFrame) -> DataFrame:
    """(doc_id, text, lang) → (doc_id, url, html, text, lang) pages by
    wrapping each driver-provided document text via
    ``render_page_for_text`` (Arrow-batched). The emitted ``text``
    column is the full extraction ground truth (normalized source text
    + sentinel paragraph), so the pages table satisfies the standard
    contract: extract_text(html) == text, byte-identical."""
    src = docs_df.select("doc_id", "text", "lang")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            texts = [t if t is not None else "" for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "url": [f"https://docs.example/{i}" for i in ids],
                    "html": [
                        render_page_for_text(i, t) for i, t in zip(ids, texts)
                    ],
                    "text": [
                        normalize_ws(t)
                        + BLOCK_SEP
                        + SENTINEL_TMPL.format(doc_id=i)
                        for i, t in zip(ids, texts)
                    ],
                    "lang": pdf["lang"].to_numpy(),
                }
            )

    return src.mapInPandas(
        kernel,
        schema="doc_id long, url string, html binary, text string, lang string",
    )


def _gen_batches(batches: Iterator[pd.DataFrame], seed: int) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [gen_page(int(i), seed) for i in pdf["id"]]
        yield pd.DataFrame(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": [r["warc_ts"] for r in rows],
                "html": [r["html"] for r in rows],
                "text": [r["text"] for r in rows],
                "lang": [r["lang"] for r in rows],
            }
        )


def pages_dataframe(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInPandas."""
    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(
        lambda it: _gen_batches(it, seed), schema=PAGES_SCHEMA
    )


def write_pages_parquet(
    spark: SparkSession, path: str, n: int, seed: int = 42, partitions: int | None = None
) -> None:
    pages_dataframe(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
