"""Property-based fuzzing of the pure-Python kernels (hypothesis).

Crawl inputs are adversarial by nature; the kernels must never raise and
must satisfy their algebraic contracts on arbitrary garbage.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pcrawler_spark.kernels import (
    canonicalize_url,
    extract_company_details,
    extract_company_links,
    extract_emails,
    extract_text,
    normalize_phone,
    split_phones,
)
from pcrawler_spark.kernels.details import DETAIL_FIELDS

text_or_bytes = st.one_of(st.text(max_size=400), st.binary(max_size=400))


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), st.text(max_size=200)))
def test_canonicalize_total_and_idempotent(u):
    c = canonicalize_url(u)
    if c is not None:
        assert c.startswith(("http://", "https://"))
        assert canonicalize_url(c) == c  # idempotent fixpoint


@settings(max_examples=200, deadline=None)
@given(text_or_bytes)
def test_html_kernels_never_raise(html):
    rec = extract_company_details(html)
    assert set(rec) == set(DETAIL_FIELDS)
    txt = extract_text(html)
    assert isinstance(txt, str)
    emails = extract_emails(html)
    assert emails == sorted(set(emails))  # sorted-distinct contract
    links = extract_company_links(html)
    assert all("tong-quan" in l for l in links)


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), st.text(max_size=80)))
def test_phones_total(p):
    n = normalize_phone(p)
    if n is not None:
        assert n.startswith("+") and n[1:].isdigit()
    for e in split_phones(p):
        assert e.startswith("+")


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="0123456789+ -./;(),", min_size=0, max_size=60))
def test_phone_like_inputs(p):
    # phone-shaped garbage: still total, still E.164-or-nothing
    for e in split_phones(p):
        assert e.startswith("+") and 8 <= len(e) - 1 <= 16
