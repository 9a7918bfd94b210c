"""Span-level cross-doc dedup: winnowing-positional selections, shared-fp
span merge, detection guarantees and boundaries."""

import re

import pytest

from picdexer_spark.operators.textops import duplicate_spans

BOILER = "subscribe to our newsletter for weekly updates and offers today"
BOILER2 = "all rights reserved contact the site administrator for access"


def norm(t):
    return " ".join(re.findall("[a-z0-9]+", t.lower()))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passage_detected_in_both_docs(spark):
    a = "alpha beta gamma " + BOILER + " delta epsilon"
    b = "totally different opening words here " + BOILER + " and a tail"
    c = "nothing in common with anybody at all whatsoever in this one"
    spans = duplicate_spans(
        _docs(spark, [(0, a), (1, b), (2, c)]), "doc_id", "text",
        k=8, window=4, min_span=20,
    ).collect()
    by_id = {}
    for r in spans:
        by_id.setdefault(r["id"], []).append(r)
    assert set(by_id) == {0, 1}
    for did, txt in ((0, a), (1, b)):
        (s,) = by_id[did]
        lo = norm(txt).index(BOILER) + 1          # 1-based char pos
        hi = lo + len(BOILER) - 1
        # selections lie inside the shared region, but a k-gram may
        # extend past it over chars the docs ALSO share (here the space
        # after the passage) — allow up to k-1 of slack at each edge
        assert s["span_start"] >= lo - 7
        assert s["span_end"] <= hi + 7
        assert s["span_len"] >= len(BOILER) - (8 + 4)  # covers most of it


def test_short_overlap_below_guarantee_ignored(spark):
    # winnowing guarantees detection only for regions >= k+window-1;
    # an 8-char shared token with min_span=20 never yields a span
    a = "alpha beta gamma shared8 delta epsilon one two three four"
    b = "five six seven shared8 eight nine ten eleven twelve море"
    spans = duplicate_spans(
        _docs(spark, [(0, a), (1, b)]), "doc_id", "text",
        k=8, window=4, min_span=20,
    ).collect()
    assert spans == []


def test_two_regions_split_by_gap(spark):
    filler = "x y z w v u t s r q p o n m l k j i h g f e d c b"
    a = BOILER + " " + filler + " " + BOILER2
    b = BOILER + " completely different middle content here " + BOILER2
    spans = duplicate_spans(
        _docs(spark, [(0, a), (1, b)]), "doc_id", "text",
        k=8, window=4, min_span=20,
    ).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["id"], []).append(r)
    # the two boilerplate blocks are far apart in both docs -> 2 spans each
    assert len(per_doc[0]) == 2 and len(per_doc[1]) == 2


def test_min_docs_three(spark):
    a = "intro " + BOILER + " outro"
    b = "other " + BOILER + " words"
    c = "unrelated text entirely about something else and more of it"
    got2 = duplicate_spans(_docs(spark, [(0, a), (1, b), (2, c)]),
                           "doc_id", "text", k=8, window=4,
                           min_span=20, min_docs=2).count()
    got3 = duplicate_spans(_docs(spark, [(0, a), (1, b), (2, c)]),
                           "doc_id", "text", k=8, window=4,
                           min_span=20, min_docs=3).count()
    assert got2 == 2 and got3 == 0
    with pytest.raises(ValueError):
        duplicate_spans(_docs(spark, [(0, a)]), "doc_id", "text",
                        min_docs=1)


def test_identical_docs_one_full_span(spark):
    t = "the same exact document text repeated verbatim in two rows " \
        "with plenty of length to fingerprint"
    spans = duplicate_spans(
        _docs(spark, [(0, t), (1, t)]), "doc_id", "text",
        k=8, window=4, min_span=20,
    ).collect()
    assert {r["id"] for r in spans} == {0, 1}
    for r in spans:
        assert r["span_len"] >= len(norm(t)) - 2 * (8 + 4)


def test_scrub_spans_removes_shared_passage(spark):
    from picdexer_spark.operators.textops import scrub_spans

    a = "alpha beta gamma " + BOILER + " delta epsilon"
    b = "totally different opening words here " + BOILER + " and a tail"
    c = "nothing in common with anybody at all whatsoever in this one"
    docs = _docs(spark, [(0, a), (1, b), (2, c)])
    spans = duplicate_spans(docs, "doc_id", "text", k=8, window=4,
                            min_span=20)
    out = {r["id"]: r for r in
           scrub_spans(docs, spans, "doc_id", "text").collect()}
    assert set(out) == {0, 1, 2}
    # the boilerplate is gone from both carriers, untouched doc intact
    assert BOILER not in out[0]["text_clean"]
    assert BOILER not in out[1]["text_clean"]
    assert out[0]["text_clean"].startswith("alpha beta gamma")
    assert out[0]["text_clean"].endswith("delta epsilon")
    assert out[2]["text_clean"] == norm(c)
    assert out[2]["n_spans"] == 0 and out[2]["n_removed_chars"] == 0
    for did in (0, 1):
        assert out[did]["n_spans"] == 1
        assert out[did]["n_removed_chars"] >= len(BOILER) - 2 * (8 + 4)
    # kept words survive: removal is span surgery, not token filtering
    assert "different opening words" in out[1]["text_clean"]


def test_scrub_spans_multiple_spans_one_doc(spark):
    from picdexer_spark.operators.textops import scrub_spans

    filler = "x y z w v u t s r q p o n m l k j i h g f e d c b"
    a = BOILER + " " + filler + " " + BOILER2
    b = BOILER + " completely different middle content here " + BOILER2
    docs = _docs(spark, [(0, a), (1, b)])
    spans = duplicate_spans(docs, "doc_id", "text", k=8, window=4,
                            min_span=20)
    out = {r["id"]: r for r in
           scrub_spans(docs, spans, "doc_id", "text").collect()}
    assert out[0]["n_spans"] == 2
    assert BOILER not in out[0]["text_clean"]
    assert BOILER2 not in out[0]["text_clean"]
    # the unique middle filler survives between the two cuts
    assert "x y z" in out[0]["text_clean"]
