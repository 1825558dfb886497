"""HTML → text extraction: the FIRST stage of every web-crawl training
corpus (WET extraction / trafilatura / jusText class), missing from the
curation family until round 6.

Real parsing, not regex soup: Python's stdlib ``html.parser`` walks the
markup inside Arrow-batched mapInPandas workers — script/style subtrees
are skipped entirely, character references decode (``&amp;`` → ``&``),
and the document segments into BLOCKS at block-level tags. Each block
carries the signals the published boilerplate heuristics use
(jusText/Arc90): text length, link count, and link-character density.
``html_main_text`` then applies the classic keep rule — enough
characters and low link density — which drops navigation ("Home X",
all link chars), ad asides, footers, and titles while keeping paragraph
prose, and reassembles the main text in document order.

Determinism: whitespace collapses to single spaces per block and blocks
join with a newline, so the extracted text is a pure function of the
markup — the oracle key replays the page GENERATOR (not a SQL HTML
parser) and a hash match proves the real parser recovered exactly the
planted main content and dropped exactly the planted boilerplate.

Scale shape: map-only (binary/string in, struct out), zero shuffle —
the same profile as the codec family, measured in SCALE.md.

Reference scope: /root/reference ingests CSV/JSON APIs only — this is
LLM-training-data extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame

BLOCK_TAGS = {
    "p", "div", "nav", "aside", "footer", "header", "title", "article",
    "section", "li", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "td", "pre",
}
SKIP_TAGS = {"script", "style"}

BLOCKS_SCHEMA = (
    "doc_id long, block_idx int, tag string, text string, n_chars int, "
    "n_links int, link_chars int"
)

MAIN_SCHEMA = (
    "doc_id long, n_blocks int, n_kept int, main_chars int, main_md5 string"
)


class _BlockParser(HTMLParser):
    """Segment a page into text blocks with link statistics."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur: dict | None = None
        self._skip = 0
        self._link = 0

    def _close(self) -> None:
        if self._cur is not None:
            raw = "".join(self._cur.pop("parts"))
            self._cur["text"] = " ".join(raw.split())
            if self._cur["text"]:
                self.blocks.append(self._cur)
        self._cur = None

    def _open(self, tag: str) -> None:
        self._close()
        self._cur = {"tag": tag, "parts": [], "n_links": 0, "link_chars": 0}

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if tag in BLOCK_TAGS:
            self._open(tag)
        elif tag == "a" and not self._skip:
            if self._cur is None:
                self._open("_implicit")
            self._cur["n_links"] += 1
            self._link += 1

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in BLOCK_TAGS:
            self._close()
        elif tag == "a":
            self._link = max(0, self._link - 1)

    def handle_data(self, data):
        if self._skip or not data:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._open("_implicit")
        self._cur["parts"].append(data)
        if self._link:
            self._cur["link_chars"] += len(data)

    def finish(self) -> list[dict]:
        self._close()
        return self.blocks


def parse_blocks(html: str) -> list[dict]:
    """Driver-free core: blocks of one page (unit-testable without Spark)."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.finish()


def html_blocks(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per text block: (doc, block_idx, tag, text, n_chars,
    n_links, link_chars) — the raw material for any boilerplate rule."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "block_idx": [], "tag": [], "text": [],
                   "n_chars": [], "n_links": [], "link_chars": []}
            for doc_id, page in zip(pdf["doc_id"], pdf["__html"]):
                for i, b in enumerate(parse_blocks(page)):
                    out["doc_id"].append(doc_id)
                    out["block_idx"].append(i)
                    out["tag"].append(b["tag"])
                    out["text"].append(b["text"])
                    out["n_chars"].append(len(b["text"]))
                    out["n_links"].append(b["n_links"])
                    out["link_chars"].append(b["link_chars"])
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("doc_id"), df[html_col].alias("__html")
    ).mapInPandas(walk, schema=BLOCKS_SCHEMA)


def html_main_text(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Main-content extraction readout per page: total blocks, kept
    blocks (>= min_chars and link density < max_link_density), and the
    md5 of the newline-joined main text — the jusText/Arc90 keep rule
    over the real parse."""
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_blocks": [], "n_kept": [],
                   "main_chars": [], "main_md5": []}
            for doc_id, page in zip(pdf["doc_id"], pdf["__html"]):
                blocks = parse_blocks(page)
                kept = [
                    b["text"] for b in blocks
                    if len(b["text"]) >= min_chars
                    and b["link_chars"] < max_link_density * max(1, len(b["text"]))
                ]
                main = "\n".join(kept)
                out["doc_id"].append(doc_id)
                out["n_blocks"].append(len(blocks))
                out["n_kept"].append(len(kept))
                out["main_chars"].append(len(main))
                out["main_md5"].append(hashlib.md5(main.encode()).hexdigest())
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("doc_id"), df[html_col].alias("__html")
    ).mapInPandas(extract, schema=MAIN_SCHEMA)


CONTENT_SCHEMA = "doc_id long, url string, main string"


def html_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    min_chars: int = 30,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Like :func:`html_main_text` but returns the extracted main TEXT
    itself (newline-joined kept blocks) with a passthrough url column —
    the form downstream pipeline stages (fingerprint dedup, quality
    gate, chunking) consume."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "url": [], "main": []}
            for doc_id, url, page in zip(
                pdf["doc_id"], pdf["__url"], pdf["__html"]
            ):
                blocks = parse_blocks(page)
                kept = [
                    b["text"] for b in blocks
                    if len(b["text"]) >= min_chars
                    and b["link_chars"] < max_link_density * max(1, len(b["text"]))
                ]
                out["doc_id"].append(doc_id)
                out["url"].append(url)
                out["main"].append("\n".join(kept))
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("doc_id"),
        df[url_col].alias("__url"),
        df[html_col].alias("__html"),
    ).mapInPandas(extract, schema=CONTENT_SCHEMA)


class _LinkParser(HTMLParser):
    """Collect <a href> values in document order, skipping script/style
    subtrees (attribute values arrive entity-decoded from HTMLParser)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if tag == "a" and not self._skip:
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)


def extract_links(html: str) -> "list[str]":
    """Driver-free core: hrefs of one page in document order."""
    p = _LinkParser()
    p.feed(html)
    p.close()
    return p.hrefs


LINKS_SCHEMA = "doc_id long, link_idx int, href string, resolved string"


def html_links(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    base_col: str = "base_url",
) -> DataFrame:
    """One row per anchor: (doc, link_idx, href, resolved) — the crawl
    loop's FRONTIER-EXPANSION stage: hrefs come out of the real parser
    and resolve against the page's base URL with full RFC 3986 reference
    resolution (stdlib urljoin — relative paths, root-relative, dot
    segments, scheme-relative). Map-only, zero shuffle; feed the output
    through urltools.canonicalize_url + robots_gate + a seen-set
    left_anti join to close the loop."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urljoin

        for pdf in batches:
            out = {"doc_id": [], "link_idx": [], "href": [], "resolved": []}
            for doc_id, base, page in zip(
                pdf["doc_id"], pdf["__base"], pdf["__html"]
            ):
                for i, href in enumerate(extract_links(page)):
                    out["doc_id"].append(doc_id)
                    out["link_idx"].append(i)
                    out["href"].append(href)
                    out["resolved"].append(urljoin(str(base), href))
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("doc_id"),
        df[base_col].alias("__base"),
        df[html_col].alias("__html"),
    ).mapInPandas(walk, schema=LINKS_SCHEMA)
