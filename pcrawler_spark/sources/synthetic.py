"""Deterministic synthetic crawl corpus (seed-pure, no external data).

Generates the engine input per BASELINE.json's input_hint — a Common-Crawl
style ``pages`` table ``(url, warc_ts, html binary, text, lang)`` — plus the
``seeds`` and ``hosts`` policy tables and a ``truth`` table holding the
expected extraction results (FIXTURES.md §1-§4).

The corpus mirrors the reference's domain (SURVEY.md §1): a business
directory host serves paginated industry listing pages that link to company
detail pages (hosted on Zipf-skewed company hosts, exercising host-skew
handling); each detail page links a contact page (and sometimes a Facebook
page) that carries extractable emails.

Byte-identity: every template assembles the HTML string and the expected
text fragments TOGETHER from the same field values, applying the documented
text rule (stripped text nodes, document order, script/style skipped,
joined by "\\n") by construction — independent of the DOM parser that the
engine later uses to reproduce the ``text`` column.

Two generation paths share the same per-company row builder:
* :func:`generate_crawl_corpus` — pure pandas, for tests and small runs;
* :func:`pages_spark_df` — ``spark.range(n).mapInPandas`` so a 10^7-row
  bench corpus is produced in parallel on executors, never on the driver.
"""

from __future__ import annotations

import html as _htmlmod
from bisect import bisect_right
from dataclasses import dataclass, replace
from datetime import datetime, timedelta, timezone
from hashlib import blake2b
from typing import Iterable, List

import pandas as pd

BASE_TS = datetime(2025, 10, 17, 0, 0, 0, tzinfo=timezone.utc)

_REVENUES = ["<10 tỷ", "10-50 tỷ", "50-100 tỷ", "100-500 tỷ", ">500 tỷ"]
_SCALES = ["1-24 nhân viên", "25-99 nhân viên", "100-499 nhân viên", "500-1000 nhân viên", "1000+ nhân viên"]
_MOBILE_PREFIXES = ["090", "091", "093", "096", "097", "098", "033", "035", "070", "076"]
_STREETS = ["Lê Lợi", "Nguyễn Huệ", "Trần Hưng Đạo", "Hai Bà Trưng", "Lý Thường Kiệt", "Điện Biên Phủ"]
_CITIES = ["TP.HCM", "Hà Nội", "Đà Nẵng", "Cần Thơ"]


@dataclass(frozen=True)
class SyntheticCrawlConfig:
    n_companies: int = 200
    n_industries: int = 8
    n_hosts: int = 40
    page_size: int = 20
    seed: int = 42
    directory_host: str = "1900.example.vn"
    # must contain 'facebook.com' so the social-media XPath matches it,
    # mirroring the reference's platform-substring selector (1900comvn.yml:27)
    facebook_host: str = "www.facebook.com"
    dup_rate: float = 0.02          # duplicate detail urls (dedup exercise)
    schemeless_rate: float = 0.01   # urls missing https:// (canonicalizer)
    private_rate: float = 0.05      # robots-disallowed detail pages
    facebook_rate: float = 0.5      # companies that also have a fb page
    deep_rate: float = 0.3          # emails only on a keyword-linked subpage
    zipf_exponent: float = 1.2
    # every Nth company's detail page carries an English stopword-rich
    # "about" paragraph whose extracted text PASSES the production
    # 450000-ppm quality gate — 0 (default) disables, keeping the checked-in
    # q32-q34 fixtures byte-stable; entry() opts in so the flagship run
    # exercises the real gate threshold with a mixed pass/fail corpus
    en_boilerplate_every: int = 0


def _h64(seed: int, tag: str, i: int) -> int:
    d = blake2b(f"{seed}:{tag}:{i}".encode(), digest_size=8).digest()
    return int.from_bytes(d, "big")


def _u(seed: int, tag: str, i: int) -> float:
    return _h64(seed, tag, i) / 2**64


def _zipf_cdf(n: int, alpha: float) -> List[float]:
    w = [1.0 / (k + 1) ** alpha for k in range(n)]
    tot = sum(w)
    acc, cdf = 0.0, []
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


class _Doc:
    """Builds an HTML string and its expected extracted text in lockstep."""

    def __init__(self):
        self._html: List[str] = []
        self._text: List[str] = []

    def raw(self, markup: str) -> "_Doc":
        self._html.append(markup)
        return self

    def text(self, value: str, pad: str = "") -> "_Doc":
        """Emit one text node; expected extraction is value.strip()."""
        self._html.append(pad + _htmlmod.escape(value) + pad)
        s = value.strip()
        if s:
            self._text.append(s)
        return self

    def script(self, body: str) -> "_Doc":
        self._html.append(f"<script>{body}</script>")
        return self

    def html(self) -> str:
        return "".join(self._html)

    def expected_text(self) -> str:
        return "\n".join(self._text)


def _company_fields(cfg: SyntheticCrawlConfig, i: int) -> dict:
    j = i % cfg.n_industries
    industry = f"Ngành {j:02d}"
    name = f"Công ty TNHH Số {i:06d}"
    street_no = 1 + _h64(cfg.seed, "addr", i) % 400
    address = (
        f"{street_no} {_STREETS[_h64(cfg.seed, 'street', i) % len(_STREETS)]}, "
        f"{_CITIES[_h64(cfg.seed, 'city', i) % len(_CITIES)]}"
    )
    prefix = _MOBILE_PREFIXES[_h64(cfg.seed, "phonep", i) % len(_MOBILE_PREFIXES)]
    phone = f"{prefix}{_h64(cfg.seed, 'phone', i) % 10_000_000:07d}"
    return {
        "company_id": i,
        "industry": industry,
        "company_name": name,
        "address": address,
        "phone": phone,
        "created_year": str(1990 + _h64(cfg.seed, "year", i) % 35),
        "revenue": _REVENUES[_h64(cfg.seed, "rev", i) % len(_REVENUES)],
        "scale": _SCALES[_h64(cfg.seed, "scale", i) % len(_SCALES)],
    }


def _host_for(cfg: SyntheticCrawlConfig, cdf: List[float], i: int) -> str:
    idx = bisect_right(cdf, _u(cfg.seed, "host", i))
    return f"host{min(idx, cfg.n_hosts - 1):04d}.example.vn"


def _detail_urls(cfg: SyntheticCrawlConfig, cdf: List[float], i: int) -> dict:
    host = _host_for(cfg, cdf, i)
    private = _u(cfg.seed, "priv", i) < cfg.private_rate
    prefix = "/private" if private else ""
    url = f"https://{host}{prefix}/company/{i}-tong-quan.html"
    website = f"https://{host}/contact/{i}.html"
    facebook = (
        f"https://{cfg.facebook_host}/company{i}"
        if _u(cfg.seed, "fb", i) < cfg.facebook_rate
        else None
    )
    return {"host": host, "is_private": private, "detail_url": url, "website": website, "facebook": facebook}


def _lang_for(cfg: SyntheticCrawlConfig, i: int) -> str:
    u = _u(cfg.seed, "lang", i)
    return "vi" if u < 0.85 else ("en" if u < 0.95 else "")


def _detail_doc(cfg: SyntheticCrawlConfig, i: int, f: dict, urls: dict) -> _Doc:
    """Detail-page HTML; template id (i mod 5) exercises primary/fallback/
    missing/whitespace paths per FIXTURES.md §5a."""
    t = i % 5
    d = _Doc()
    d.raw("<html><head>")
    d.raw("<title>").text(f["company_name"] + " - 1900").raw("</title>")
    d.raw("<style>.x{color:red}</style>").script("var tracked='t@9.9';")
    d.raw("</head><body>")
    d.raw('<h1 class="company-detail-name"><span>')
    d.text(f["company_name"], pad="  " if t == 4 else "")
    d.raw("</span><span>").text("✓").raw("</span></h1>")

    if t != 1:
        # primary address path
        d.raw('<div class="box-body"><div class="item"><div class="desc">')
        d.text(f["address"], pad="\n  " if t == 4 else "")
        d.raw('</div></div><div class="item"><div class="desc">')
        d.text("không phải địa chỉ")
        d.raw("</div></div></div>")
    else:
        # fallback address path: only the company-details li carries it
        pass

    d.raw('<div class="box-caption"><p>')
    d.raw(f'<a href="tel:{f["phone"]}">').text(f["phone"]).raw("</a>")
    if t != 2:
        d.raw(f'<a href="{urls["website"]}">').text("website").raw("</a>")
    d.raw("</p></div>")

    d.raw('<div class="company-subdetail"><div class="company-subdetail-info"><span>')
    d.text("Loại hình").raw("</span><span>").text("TNHH").raw("</span></div>")
    d.raw('<div class="company-subdetail-info"><span>').text("Quy mô").raw("</span><span>")
    if t != 3:
        d.text(f["scale"])
    else:
        d.text("")  # missing scale
    d.raw("</span></div></div>")

    d.raw('<ul class="company-details">')
    if t == 1:
        d.raw("<li><label>").text("Trụ sở chính").raw("</label><span>")
        d.text(f["address"]).raw("</span></li>")
    d.raw("<li><label>").text("Thành lập").raw("</label><span>")
    d.text(f["created_year"], pad=" " if t == 4 else "").raw("</span></li>")
    d.raw("<li><label>").text("Ngành").raw("</label>")
    d.raw('<a href="/nganh">').text(f["industry"]).raw("</a></li>")
    if t != 3:
        d.raw("<li><label>").text("Doanh thu").raw("</label><span>")
        d.text(f["revenue"]).raw("</span></li>")
    d.raw("</ul>")

    d.raw('<div class="social-media-container">')
    if urls["facebook"]:
        d.raw(f'<a href="{urls["facebook"]}">').text("Facebook").raw("</a>")
    if t in (0, 4):
        d.raw(f'<a href="https://linkedin.com/company/c{i}">').text("LinkedIn").raw("</a>")
    if t == 0:
        d.raw(f'<a href="https://youtube.com/@c{i}">').text("YouTube").raw("</a>")
    d.raw("</div>")
    if cfg.en_boilerplate_every and i % cfg.en_boilerplate_every == 0:
        about = (
            "This is the profile of the company, and it is a part of the "
            "directory. The team of the company is one of the best of the "
            "region, and the mission of the group is the growth of the "
            "value of the work, and the quality of the service is the "
            "pride of the staff. "
        ) * 4
        d.raw("<p>").text(about.strip()).raw("</p>")
    d.raw("</body></html>")
    return d


def _expected_details(cfg: SyntheticCrawlConfig, i: int, f: dict, urls: dict) -> dict:
    """The oracle record: what the reference extractor yields on this page."""
    t = i % 5
    return {
        "company_name": f["company_name"],
        "address": f["address"],
        "phone": f["phone"],
        "website": urls["website"] if t != 2 else None,
        "facebook": urls["facebook"],
        "linkedin": "LinkedIn" if t in (0, 4) else None,   # text field, not href
        "tiktok": None,
        "youtube": "YouTube" if t == 0 else None,
        "instagram": None,
        "industry": f["industry"],
        "created_year": f["created_year"],
        "revenue": f["revenue"] if t != 3 else None,
        "scale": f["scale"] if t != 3 else None,
    }


def _contact_emails(cfg: SyntheticCrawlConfig, i: int, url_type: str) -> tuple[List[str], bool]:
    """(template emails, has_invalid_decoys) for company i's contact site.

    Domains must avoid 'example.com' — that substring is an invalid-email
    anti-pattern in the reference (email_extractor.py:29)."""
    t = i % 5
    dom = f"c{i}.example.vn" if url_type == "website" else f"fb{i}.mail.vn"
    if t == 0:
        return [f"info@{dom}", f"sales@{dom}"], False
    if t == 1:
        return [f"hr.dept-{i}@{dom}"], False
    if t == 2:
        return [], True  # only invalids on the page
    if t == 3:
        return [f"e{k}@{dom}" for k in range(7)], False  # >5 → export caps at 5
    return [f"info@{dom}"], False  # duplicated on page → distinct


def _email_body(d: _Doc, cfg: SyntheticCrawlConfig, i: int, url_type: str) -> List[str]:
    """Emit the template's email paragraphs into ``d``; returns the expected
    sorted valid-email list."""
    t = i % 5
    dom = f"c{i}.example.vn" if url_type == "website" else f"fb{i}.mail.vn"
    emails, invalids = _contact_emails(cfg, i, url_type)
    if invalids:
        d.raw("<p>").text(f"noreply@{dom} test@example.com bot@12.34").raw("</p>")
    if t == 4:
        d.raw("<p>").text(f"info@{dom}").raw("</p>")  # duplicate occurrence
    for e in emails:
        d.raw("<p>").text(f"Email: {e}").raw("</p>")
    return sorted(set(emails))


def is_deep_contact(cfg: SyntheticCrawlConfig, i: int, url_type: str) -> bool:
    """True when company i's emails live only on a keyword-linked subpage
    (exercises the best-first deep email crawl, email_extractor.py:149-225)."""
    return url_type == "website" and _u(cfg.seed, "deep", i) < cfg.deep_rate


def _contact_docs(cfg: SyntheticCrawlConfig, i: int, f: dict, url_type: str,
                  curl: str) -> List[tuple[str, _Doc, List[str], List[str]]]:
    """Contact-site pages for one fetch target: [(url, doc, expected sorted
    valid emails, expected followed out_links)].  For deep companies the
    landing page carries only an invalid decoy plus three links — one
    keyword-scored internal (followed), one unscored internal and one
    keyword-scored EXTERNAL (both ignored) — and the emails live on the
    /lienhe subpage (FIXTURES §5b)."""
    host = curl.split("/")[2]
    # real contact pages are never near-empty; the footer keeps every
    # template above the reference's len(html) > 100 validity cutoff
    # (detail_crawler.py:39) so the F5 gate only drops genuinely broken pages
    footer = f"© {f['company_name']} — thông tin liên hệ chính thức"
    if not is_deep_contact(cfg, i, url_type):
        d = _Doc()
        d.raw("<html><body>")
        d.raw("<h2>").text("Liên hệ " + f["company_name"]).raw("</h2>")
        emails = _email_body(d, cfg, i, url_type)
        d.raw("<footer>").text(footer).raw("</footer>")
        d.raw("</body></html>")
        return [(curl, d, emails, [])]

    sub_url = f"https://{host}/lienhe/{i}.html"
    dom = f"c{i}.example.vn"
    landing = _Doc()
    landing.raw("<html><body>")
    landing.raw("<h2>").text("Liên hệ " + f["company_name"]).raw("</h2>")
    landing.raw("<p>").text(f"noreply@{dom}").raw("</p>")  # invalid decoy only
    landing.raw(f'<a href="/lienhe/{i}.html">').text("Email contact").raw("</a>")
    landing.raw(f'<a href="/san-pham/{i}.html">').text("Sản phẩm").raw("</a>")
    landing.raw('<a href="https://elsewhere.example.vn/contact.html">').text("Contact").raw("</a>")
    landing.raw("</body></html>")

    sub = _Doc()
    sub.raw("<html><body>")
    sub.raw("<h3>").text("Thông tin liên hệ").raw("</h3>")
    emails = _email_body(sub, cfg, i, url_type)
    sub.raw("<footer>").text(footer).raw("</footer>")
    sub.raw("</body></html>")
    return [(curl, landing, [], [sub_url]), (sub_url, sub, emails, [])]


def _listing_doc(cfg: SyntheticCrawlConfig, j: int, page: int, n_pages: int,
                 companies: List[tuple[int, str, str]]) -> tuple[_Doc, List[str]]:
    d = _Doc()
    d.raw("<html><body><h1>").text(f"Ngành {j:02d} - trang {page}").raw("</h1><div>")
    links = []
    for i, name, detail_url in companies:
        d.raw(f'<a href="{detail_url}">').text(name).raw("</a>")
        links.append(detail_url)
    d.raw('</div><ul>')
    for p in range(1, n_pages + 1):
        href = _listing_url(cfg, j, p)
        d.raw(f'<li class="page-item"><a class="page-link" href="{href}">').text(str(p)).raw("</a></li>")
    d.raw("</ul></body></html>")
    return d, links


def _listing_url(cfg: SyntheticCrawlConfig, j: int, page: int) -> str:
    base = f"https://{cfg.directory_host}/cong-ty-nganh-{j:02d}-c{100 + j}.html"
    return base if page == 1 else f"{base}?page={page}"


_PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
_TRUTH_COLS = [
    "url", "kind", "url_type", "company_id", "host", "is_private",
    "company_name", "company_url", "address", "phone", "website", "facebook",
    "linkedin", "tiktok", "youtube", "instagram", "industry", "created_year",
    "revenue", "scale", "emails", "out_links",
]


def _company_page_rows(cfg: SyntheticCrawlConfig, cdf: List[float], i: int
                       ) -> tuple[List[dict], List[dict]]:
    """All page rows + truth rows derived from company i (detail page, its
    optional duplicate, contact page(s))."""
    f = _company_fields(cfg, i)
    urls = _detail_urls(cfg, cdf, i)
    pages, truths = [], []

    ddoc = _detail_doc(cfg, i, f, urls)
    ts = BASE_TS + timedelta(seconds=137 * i)
    stored_url = urls["detail_url"]
    if _u(cfg.seed, "schemeless", i) < cfg.schemeless_rate:
        stored_url = stored_url[len("https://"):]
    pages.append({
        "url": stored_url, "warc_ts": ts, "html": ddoc.html().encode("utf-8"),
        "text": ddoc.expected_text(), "lang": _lang_for(cfg, i),
    })
    if _u(cfg.seed, "dup", i) < cfg.dup_rate:
        pages.append({
            "url": urls["detail_url"], "warc_ts": ts + timedelta(hours=1),
            "html": ddoc.html().encode("utf-8"), "text": ddoc.expected_text(),
            "lang": _lang_for(cfg, i),
        })
    exp = _expected_details(cfg, i, f, urls)
    truths.append({
        "url": urls["detail_url"], "kind": "detail", "url_type": None,
        "company_id": i, "host": urls["host"], "is_private": urls["is_private"],
        "company_url": urls["detail_url"], "emails": None,
        "out_links": [u for u in (exp["website"], exp["facebook"]) if u],
        **exp,
    })

    for url_type, curl in (("website", urls["website"]), ("facebook", urls["facebook"])):
        if not curl:
            continue
        for off, (page_url, cdoc, emails, out_links) in enumerate(_contact_docs(cfg, i, f, url_type, curl)):
            pages.append({
                "url": page_url, "warc_ts": ts + timedelta(seconds=5 + off),
                "html": cdoc.html().encode("utf-8"), "text": cdoc.expected_text(),
                "lang": _lang_for(cfg, i),
            })
            truths.append({
                "url": page_url, "kind": "contact", "url_type": url_type,
                "company_id": i, "host": page_url.split("/")[2], "is_private": False,
                "company_name": f["company_name"], "company_url": urls["detail_url"],
                "address": None, "phone": None, "website": None, "facebook": None,
                "linkedin": None, "tiktok": None, "youtube": None, "instagram": None,
                "industry": None, "created_year": None, "revenue": None, "scale": None,
                "emails": emails, "out_links": out_links,
            })
    return pages, truths


def _listing_rows(cfg: SyntheticCrawlConfig, cdf: List[float]) -> tuple[List[dict], List[dict], List[dict]]:
    """Listing pages for every industry + the seeds rows."""
    pages, truths, seeds = [], [], []
    for j in range(cfg.n_industries):
        ids = list(range(j, cfg.n_companies, cfg.n_industries))
        n_pages = max(1, -(-len(ids) // cfg.page_size))
        for p in range(1, n_pages + 1):
            chunk = ids[(p - 1) * cfg.page_size : p * cfg.page_size]
            companies = []
            for i in chunk:
                f = _company_fields(cfg, i)
                companies.append((i, f["company_name"], _detail_urls(cfg, cdf, i)["detail_url"]))
            doc, links = _listing_doc(cfg, j, p, n_pages, companies)
            url = _listing_url(cfg, j, p)
            ts = BASE_TS + timedelta(seconds=137 * (cfg.n_companies + j * 1000 + p))
            pages.append({"url": url, "warc_ts": ts, "html": doc.html().encode("utf-8"),
                          "text": doc.expected_text(), "lang": "vi"})
            truths.append({
                "url": url, "kind": "listing", "url_type": None, "company_id": None,
                "host": cfg.directory_host, "is_private": False, "company_name": None,
                "company_url": None, "address": None, "phone": None, "website": None,
                "facebook": None, "linkedin": None, "tiktok": None, "youtube": None,
                "instagram": None, "industry": f"Ngành {j:02d}", "created_year": None,
                "revenue": None, "scale": None, "emails": None, "out_links": links,
            })
        seeds.append({"url": _listing_url(cfg, j, 1), "priority": 0,
                      "industry": f"Ngành {j:02d}"})
    return pages, truths, seeds


def _hosts_rows(cfg: SyntheticCrawlConfig) -> List[dict]:
    delays = [0.5, 1.0, 2.0, 5.0]
    rows = [{
        "host": cfg.directory_host, "crawl_delay_s": 0.5,
        "robots_disallow": [], "max_parallel": 4,
    }, {
        "host": cfg.facebook_host, "crawl_delay_s": 1.0,
        "robots_disallow": ["/login"], "max_parallel": 4,
    }]
    for k in range(cfg.n_hosts):
        rows.append({
            "host": f"host{k:04d}.example.vn",
            "crawl_delay_s": delays[_h64(cfg.seed, "delay", k) % len(delays)],
            "robots_disallow": ["/private", "/login"],
            "max_parallel": 1 + _h64(cfg.seed, "par", k) % 4,
        })
    return rows


def generate_crawl_corpus(cfg: SyntheticCrawlConfig | None = None) -> dict[str, pd.DataFrame]:
    """Pure-pandas generation (tests / small scale).  Returns dict with
    ``pages``, ``truth``, ``seeds``, ``hosts`` DataFrames."""
    cfg = cfg or SyntheticCrawlConfig()
    cdf = _zipf_cdf(cfg.n_hosts, cfg.zipf_exponent)
    pages, truths = [], []
    for i in range(cfg.n_companies):
        p, t = _company_page_rows(cfg, cdf, i)
        pages.extend(p)
        truths.extend(t)
    lp, lt, seeds = _listing_rows(cfg, cdf)
    pages.extend(lp)
    truths.extend(lt)
    return {
        "pages": pd.DataFrame(pages, columns=_PAGE_COLS),
        "truth": pd.DataFrame(truths, columns=_TRUTH_COLS),
        "seeds": pd.DataFrame(seeds, columns=["url", "priority", "industry"]),
        "hosts": pd.DataFrame(_hosts_rows(cfg), columns=["host", "crawl_delay_s", "robots_disallow", "max_parallel"]),
    }


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_spark_df(spark, cfg: SyntheticCrawlConfig | None = None,
                   num_files: int | None = None):
    """Distributed generation: company-derived pages are built on executors
    via mapInPandas over an id range (scales to 10^7+ rows without touching
    the driver); the few listing pages are unioned in from the driver.

    ``num_files`` controls the output fan-out: a CPU-bound Arrow extraction
    stage wants MANY small splits (multiple task waves per core, short
    straggler tail), so benches write ~4 files per core instead of one."""
    cfg = cfg or SyntheticCrawlConfig()
    cdf = _zipf_cdf(cfg.n_hosts, cfg.zipf_exponent)
    cfg_d, cdf_d = cfg, list(cdf)

    from pyspark.sql import functions as F

    def gen(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                p, _ = _company_page_rows(cfg_d, cdf_d, int(i))
                rows.extend(p)
            yield pd.DataFrame(rows, columns=_PAGE_COLS)

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    company_pages = spark.range(cfg.n_companies, numPartitions=n_parts).mapInPandas(gen, PAGES_SCHEMA)
    lp, _, _ = _listing_rows(cfg, cdf)
    listing_pages = spark.createDataFrame(pd.DataFrame(lp, columns=_PAGE_COLS), PAGES_SCHEMA)
    # hash-mix page kinds across partitions: without this every listing page
    # lands in one driver-side partition → one straggler task dominates the
    # extraction stage (observed: 32-wide stage degraded to a 35 s tail)
    return company_pages.unionByName(listing_pages).repartition(
        num_files or n_parts, F.xxhash64("url")
    )


def planted_cluster_embeddings(embeddings, n_clusters: int = 16,
                               spread: float = 0.25):
    """Derive a PLANTED-CLUSTER embedding table from the driver testdata's
    near-random embeddings — deterministic and replayable in ANSI SQL, so
    IVF recall demos (q54/q58) run against data where cells carry real
    structure instead of arbitrary labels.

    Construction: cluster c = vec_id % n_clusters; dimension i of the new
    vector is ``((c*37 + i*11) % 17) - 8 + spread * v[i]`` — an
    integer-lattice cluster center (distinct for every c < 17, since 37 is
    invertible mod 17) plus a small deterministic within-cluster offset
    reusing the source embedding.  Center math is exact integer→double, the
    offset is one multiply-add, so Spark and DuckDB produce bit-identical
    vectors (the SQL side is the `list_transform` in __spark_entry__'s
    clustered-CTE).

    Returns (vec_id, embedding array<double>, label int) — the same
    contract as the raw table, with `label` = the true cluster."""
    from pyspark.sql import functions as F

    if n_clusters > 17:
        raise ValueError("center lattice is mod-17: n_clusters must be <= 17")
    c = (F.col("vec_id") % n_clusters).cast("int")
    emb = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: ((c * 37 + i * 11) % 17).cast("double") - 8.0
        + F.lit(float(spread)) * x,
    )
    return embeddings.select(
        "vec_id", emb.alias("embedding"), c.alias("label")
    )
