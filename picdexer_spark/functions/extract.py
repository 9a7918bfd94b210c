"""Extraction: html binary -> text string, byte-identical per url.

This is the analogue of the reference's heavy per-row extract stage — an
exiftool subprocess pulling typed metadata per file (reference:
internal/metadata/metadata.go:92-157, long-lived process reuse 69-73).
Spark-side it is a single Arrow-batched `mapInPandas` pass: pandas vectorized
string ops end-to-end, no per-row Python (BASELINE.json input_hint), and the
reused Python worker is the analogue of the reference's kept-open exiftool.

The wrapper/extractor pair is an exact inverse: for every page the corpus
generator emits, ``extract_text_series(wrap_html_series(text)) == text``
byte-for-byte (the per-row invariant; the golden-fixture pattern of
reference: internal/metadata/metadata_test.go:301-334).

Error semantics mirror the reference: a row whose html cannot be parsed
yields text=None and is counted, not fatal (reference logs & drops the row,
internal/metadata/metadata.go:107-112); rows with null html keep their
existing `text` (extraction skip path).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

# html-escape table (order matters: escape & first, unescape & last)
_ESCAPES = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
]

_ARTICLE_OPEN = "<article>"
_ARTICLE_CLOSE = "</article>"


def _escape_series(s: pd.Series) -> pd.Series:
    for raw, ent in _ESCAPES:
        s = s.str.replace(raw, ent, regex=False)
    return s


def _unescape_series(s: pd.Series) -> pd.Series:
    for raw, ent in reversed(_ESCAPES):
        s = s.str.replace(ent, raw, regex=False)
    return s


def wrap_html_series(text: pd.Series, url: pd.Series) -> pd.Series:
    """Deterministic page wrapper: text -> full html document (bytes).

    Includes title/nav/footer boilerplate so extraction is a real strip,
    not an identity.
    """
    site = url.str.extract(r"https://([^/]+)/", expand=False).fillna("site")
    body = _escape_series(text.fillna(""))
    doc = (
        "<html><head><title>"
        + site
        + '</title><meta charset="utf-8"></head><body><nav><a href="/">'
        + site
        + '</a> <a href="/about">about</a></nav>'
        + _ARTICLE_OPEN
        + body
        + _ARTICLE_CLOSE
        + "<footer>copyright "
        + site
        + "</footer></body></html>"
    )
    return doc.str.encode("utf-8")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized inverse of :func:`wrap_html_series`.

    bytes -> text between <article>...</article>, entities unescaped.
    Unparsable html (no article element) -> None.
    """
    s = html.str.decode("utf-8", errors="replace")  # vectorized, null-safe
    # (?s): article bodies span newlines — without DOTALL any page whose
    # text contains '\n' silently fails extraction, breaking the pinned
    # extract(wrap(text)) == text byte-identity invariant
    inner = s.str.extract(
        rf"(?s){_ARTICLE_OPEN}(.*){_ARTICLE_CLOSE}", expand=False
    )
    return _unescape_series(inner)


def extract_text_col(html):
    """JVM twin of :func:`extract_text_series` — the same extraction as a
    Column expression (whole-stage codegen, no Python worker round-trip):
    UTF-8 decode (malformed bytes -> U+FFFD, matching errors='replace'),
    one greedy `(?s)` article regex (NULL when no article element, the
    same match-vs-empty-article distinction the pandas path makes), then
    the 5-entity unescape chain in the pinned order. Parity with the
    pandas twin is test-pinned row-for-row (tests/test_tokenizer_oracle).

    Decode is `cast(binary as string)`, NOT `F.decode(html, 'UTF-8')`:
    on Spark 4 `decode` raises MALFORMED_CHARACTER_CODING on any invalid
    byte (fatal to the whole build job), while the cast substitutes
    U+FFFD — preserving the module's pinned error semantics (a bad row
    degrades, never aborts) and matching pandas errors='replace'
    byte-for-byte on every malformed class except CESU-8 surrogate
    encodings, where Java emits one U+FFFD for the 3-byte ill-formed
    sequence and Python emits three (maximal-subpart rule). That single
    divergence is pinned in tests/test_tokenizer_oracle.py.
    """
    from pyspark.sql import functions as F

    decoded = html.cast("string")
    pat = rf"(?s){_ARTICLE_OPEN}(.*){_ARTICLE_CLOSE}"
    out = F.when(decoded.rlike(pat), F.regexp_extract(decoded, pat, 1))
    for raw, ent in reversed(_ESCAPES):
        out = F.replace(out, F.lit(ent), F.lit(raw))
    return out


def extract_pages_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: fill `text` from `html` where html is present.

    Input/output schema: url, warc_ts, html, text, lang (+ adds
    `extract_ok` boolean for metrics). Rows with html==null keep their
    incoming text (skip path); rows whose extraction fails get text=None.
    """
    for pdf in batches:
        has_html = pdf["html"].notna()
        extracted = pd.Series([None] * len(pdf), dtype=object, index=pdf.index)
        if has_html.any():
            extracted.loc[has_html] = extract_text_series(pdf.loc[has_html, "html"])
        text = pdf["text"].where(~has_html, extracted)
        out = pdf.copy()
        out["text"] = text
        out["extract_ok"] = text.notna()
        yield out
