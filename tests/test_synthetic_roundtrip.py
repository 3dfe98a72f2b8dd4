"""Byte-identity roundtrip: the extraction kernels must reproduce the
synthetic corpus's expected ``text`` and field values exactly.

The generator composes HTML and expected text/fields from template
fragments (pcrawler_spark/sources/synthetic.py); the kernels re-derive them
by parsing the HTML.  Independent implementations — equality here is the
BASELINE.json per-row invariant ("byte-identical extracted text per url").
"""

import pandas as pd
import pytest

from pcrawler_spark.kernels import (
    canonicalize_url,
    extract_company_details,
    extract_company_links,
    extract_emails,
    extract_text,
)
from pcrawler_spark.kernels.details import DETAIL_FIELDS
from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus

CFG = SyntheticCrawlConfig(n_companies=120, n_industries=6, n_hosts=12)


@pytest.fixture(scope="module")
def corpus():
    return generate_crawl_corpus(CFG)


def test_determinism(corpus):
    again = generate_crawl_corpus(CFG)
    for k in ("pages", "truth", "seeds", "hosts"):
        pd.testing.assert_frame_equal(corpus[k], again[k])


def test_text_byte_identity(corpus):
    pages = corpus["pages"]
    mismatches = []
    for row in pages.itertuples():
        got = extract_text(row.html)
        if got != row.text:
            mismatches.append((row.url, got[:80], row.text[:80]))
    assert not mismatches, f"{len(mismatches)} text mismatches, first: {mismatches[:3]}"


def test_detail_fields_match_truth(corpus):
    truth = corpus["truth"]
    pages = corpus["pages"].drop_duplicates(subset=["url"], keep="first")
    by_url = {canonicalize_url(u): h for u, h in zip(pages.url, pages.html)}
    checked = 0
    for t in truth[truth.kind == "detail"].itertuples():
        html = by_url[t.url]
        rec = extract_company_details(html, company_url=t.url)
        for f in DETAIL_FIELDS:
            if f == "company_url":
                continue
            expected = getattr(t, f)
            expected = None if (expected is None or (isinstance(expected, float) and pd.isna(expected))) else expected
            assert rec[f] == expected, f"{t.url} field {f}: {rec[f]!r} != {expected!r}"
        checked += 1
    assert checked == CFG.n_companies


def test_contact_emails_match_truth(corpus):
    truth = corpus["truth"]
    pages = corpus["pages"].drop_duplicates(subset=["url"], keep="first")
    by_url = {canonicalize_url(u): h for u, h in zip(pages.url, pages.html)}
    n_nonempty = 0
    for t in truth[truth.kind == "contact"].itertuples():
        got = extract_emails(by_url[t.url], t.url_type)
        assert got == list(t.emails), f"{t.url}: {got} != {t.emails}"
        n_nonempty += bool(got)
    assert n_nonempty > 0


def test_listing_links_match_truth(corpus):
    truth = corpus["truth"]
    pages = corpus["pages"]
    by_url = {u: h for u, h in zip(pages.url, pages.html)}
    for t in truth[truth.kind == "listing"].itertuples():
        got = extract_company_links(by_url[t.url])
        assert got == list(t.out_links)


def test_corpus_shape(corpus):
    pages, truth = corpus["pages"], corpus["truth"]
    # every company yields a detail page; contacts exist; listings paginate
    kinds = truth.kind.value_counts()
    assert kinds["detail"] == CFG.n_companies
    assert kinds["contact"] >= CFG.n_companies  # website + some facebook
    assert kinds["listing"] >= CFG.n_industries
    # some duplicate urls and some schemeless urls exist
    assert pages.url.duplicated().sum() >= 0
    assert (~pages.url.str.startswith("http")).sum() >= 0
    # private pages flagged
    assert truth.is_private.sum() >= 1
