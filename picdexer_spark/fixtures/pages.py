"""Deterministic synthetic `pages` corpus + reference query set.

Schema fixed by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Invariants (FIXTURES.md §1):
- seeded (default 42), byte-reproducible across runs and scales;
- Zipfian vocabulary (~10k terms), lognormal doc length (mean ≈ 200 tokens);
- a small fraction of empty texts;
- duplicate `text` under different urls (content-hash/dedup semantics, the
  analogue of the reference's md5-content FileID, reference:
  internal/common/common.go:44-63);
- rows with null html but non-null text (extraction skip path);
- rare terms shared by small doc groups (selective conjunctive queries);
- html is a deterministic wrapper around `text` so extraction has a
  knowable byte-exact answer per url (the golden-fixture pattern of
  reference: internal/metadata/metadata_test.go:301-334).

The html wrapper / extractor pair is pinned in
:mod:`picdexer_spark.functions.extract`.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from picdexer_spark.functions.extract import wrap_html_series

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
N_SITES = 97
RARE_GROUPS = 50

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def _vocab(size: int = VOCAB_SIZE) -> np.ndarray:
    """Deterministic word-like vocabulary: 'w0'..'w9999' (tokenizer-stable)."""
    return np.array([f"w{i}" for i in range(size)])


def rare_term(g: int) -> str:
    return f"rareterm{g}"


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), s)
    return p / p.sum()


def gen_pages(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as one pandas DataFrame (vectorized numpy)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(vocab.size)

    # doc lengths: lognormal, mean ~200 tokens, 1% empty
    lens = np.clip(rng.lognormal(5.0, 0.6, n_docs), 1, 2000).astype(np.int64)
    lens[rng.random(n_docs) < 0.01] = 0

    total = int(lens.sum())
    token_ids = rng.choice(vocab.size, size=total, p=probs)
    words = vocab[token_ids]
    offsets = np.concatenate(([0], np.cumsum(lens)))
    texts = [
        " ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n_docs)
    ]

    # rare-term groups: RARE_GROUPS terms, each appended to 3-8 docs
    for g in range(RARE_GROUPS):
        members = rng.choice(n_docs, size=int(rng.integers(3, 9)), replace=False)
        for m in members:
            texts[m] = (texts[m] + " " + rare_term(g)).strip()

    # duplicates: 2% of docs copy an earlier doc's text
    dup_targets = rng.choice(n_docs, size=max(1, n_docs // 50), replace=False)
    for d in dup_targets:
        if d > 0:
            texts[d] = texts[int(rng.integers(0, d))]

    site = rng.integers(0, N_SITES, n_docs)
    urls = [f"https://site{s}.example/p/{i}" for i, s in enumerate(site)]

    base = np.datetime64("2023-01-01T00:00:00", "us")
    span_us = 365 * 24 * 3600 * 1_000_000
    ts = base + ((np.arange(n_docs, dtype=np.int64) * (span_us // max(n_docs, 1)))
                 + rng.integers(0, 3_600_000_000, n_docs)).astype("timedelta64[us]")

    lang = np.where(
        rng.random(n_docs) < 0.9,
        "en",
        rng.choice(np.array(["fr", "de", ""]), n_docs),
    )

    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "text": texts,
            "lang": lang,
        }
    )
    html = wrap_html_series(pdf["text"], pdf["url"])
    # extraction skip path: 3% of rows carry no html (text-only rows)
    no_html = rng.random(n_docs) < 0.03
    html[no_html] = None
    pdf["html"] = html
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


def gen_queries(seed: int = 42, n_queries: int = 50) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): head/torso/rare mixes."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    head = vocab[:20]
    torso = vocab[100:1000]
    rare = np.array([rare_term(g) for g in range(RARE_GROUPS)])
    rows = []
    for qid in range(n_queries):
        kind = qid % 5
        if kind == 0:  # head-heavy disjunctive
            terms = list(rng.choice(head, size=int(rng.integers(1, 4)), replace=False))
            mode = "disjunctive"
        elif kind == 1:  # torso mix
            terms = list(rng.choice(torso, size=int(rng.integers(2, 6)), replace=False))
            mode = "disjunctive" if qid % 2 else "conjunctive"
        elif kind == 2:  # all-rare conjunctive (selective)
            terms = list(rng.choice(rare, size=int(rng.integers(1, 3)), replace=False))
            mode = "conjunctive"
        elif kind == 3:  # head + rare conjunctive
            terms = [str(rng.choice(head)), str(rng.choice(rare))]
            mode = "conjunctive"
        else:  # includes a nonexistent term (empty conjunctive result)
            terms = [str(rng.choice(torso)), "zzznonexistent"]
            mode = "conjunctive" if qid % 2 else "disjunctive"
        k = 10 if qid % 7 else (1 if qid % 2 else 100)
        rows.append(
            {"query_id": qid, "terms": [str(t) for t in terms], "mode": mode, "k": k}
        )
    return pd.DataFrame(rows)


def materialize_pages(
    n_docs: int, seed: int = 42, cache_dir: str = "/root/repo/.fixtures",
    docs_per_file: int = 1000,
) -> str:
    """Write (once) and return the path of the cached pages fixture dir.

    pages are written as MANY parquet part files (<dir>/pages/part-*.parquet)
    — the shape of a real Common-Crawl input (thousands of WARC-derived
    files) and what gives Spark scan/extract parallelism; a single fat file
    would serialize the whole extract stage onto one task.
    """
    out = os.path.join(cache_dir, f"pages_n{n_docs}_seed{seed}_f{docs_per_file}")
    pages_dir = os.path.join(out, "pages")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(pages_dir, exist_ok=True)
    pdf = gen_pages(n_docs, seed)
    table = pa.Table.from_pandas(pdf, schema=PAGES_SCHEMA, preserve_index=False)
    n_files = max(1, (n_docs + docs_per_file - 1) // docs_per_file)
    for i in range(n_files):
        lo = i * docs_per_file
        hi = min(lo + docs_per_file, n_docs)
        if lo >= hi:
            break
        pq.write_table(
            table.slice(lo, hi - lo),
            os.path.join(pages_dir, f"part-{i:05d}.parquet"),
            row_group_size=docs_per_file,
        )
    gen_queries(seed).to_parquet(os.path.join(out, "queries.parquet"), index=False)
    with open(done, "w") as f:
        f.write("ok")
    return out
