"""Regenerate the checked-in oracle fixtures (deterministic, no Spark).

The driver's correctness gate runs ``oracle_sql()`` strings in DuckDB; for
queries whose input is the synthetic corpus (not the shared testdata
tables), the oracle reads these parquet files via ``read_parquet``.  The
fixtures are derived from the synthetic GENERATOR's truth tables — pure
Python, independent of the Spark kernels under test — so the comparison is
a real oracle, not an echo.  ``tests/test_fixture_freshness.py`` fails if
the generator drifts from these files; rerun this script and commit when it
does:

    python fixtures/make_fixtures.py
"""

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "fixtures")

# must match __spark_entry__._synthetic_pages / q34
from pcrawler_spark.sources.synthetic import SyntheticCrawlConfig, generate_crawl_corpus
from pcrawler_spark.kernels import canonicalize_url
from pcrawler_spark.kernels.urlnorm import url_host

CFG = SyntheticCrawlConfig(n_companies=50, n_industries=4, n_hosts=8)


def main() -> None:
    corpus = generate_crawl_corpus(CFG)
    truth, pages, hosts = corpus["truth"], corpus["pages"], corpus["hosts"]

    # q32: expected 14-field extraction per detail page (generator truth)
    detail = truth[truth.kind == "detail"].copy()
    detail["canon_url"] = detail.url.map(canonicalize_url)
    q32 = detail[[
        "canon_url", "company_name", "address", "phone", "website", "facebook",
        "linkedin", "tiktok", "youtube", "instagram", "industry",
        "created_year", "revenue", "scale",
    ]].sort_values("canon_url").reset_index(drop=True)
    # all-null columns (tiktok/instagram) must still be STRING in parquet,
    # not pyarrow's null type
    q32 = q32.astype({c: "string" for c in q32.columns})
    q32.to_parquet(os.path.join(OUT, "q32_details_truth.parquet"), index=False)

    # q33: expected extracted text per canonical url (generator truth text)
    pt = pages[["url", "text"]].copy()
    pt["canon_url"] = pt.url.map(canonicalize_url)
    q33 = pt.drop_duplicates("canon_url")[["canon_url", "text"]].sort_values(
        "canon_url").reset_index(drop=True)
    q33.to_parquet(os.path.join(OUT, "q33_text_truth.parquet"), index=False)

    # q34: a frontier snapshot (canon_url, host, priority, retry_count) the
    # politeness scheduler runs over — BOTH engines read this same file
    fr = pages[["url"]].copy()
    fr["canon_url"] = fr.url.map(canonicalize_url)
    fr = fr.dropna(subset=["canon_url"]).drop_duplicates("canon_url")
    fr["host"] = fr.canon_url.map(url_host)
    fr["priority"] = 1
    fr["retry_count"] = 0
    q34 = fr[["canon_url", "host", "priority", "retry_count"]].sort_values(
        "canon_url").reset_index(drop=True)
    q34.to_parquet(os.path.join(OUT, "q34_frontier.parquet"), index=False)
    hosts.to_parquet(os.path.join(OUT, "q34_hosts.parquet"), index=False)

    # q46: raw robots.txt bodies exercising group selection, consecutive
    # user-agents, comments, blank lines, empty Disallow, Crawl-delay, rules
    # outside any group, unknown fields
    robots_rows = [
        ("plain.vn",
         "User-agent: *\nDisallow: /private\nDisallow: /tmp\nCrawl-delay: 2\n"),
        ("othersonly.vn",
         "User-agent: Googlebot\nDisallow: /all\nCrawl-delay: 9\n"),
        ("multi.vn",
         "User-agent: Googlebot\nUser-agent: *\nDisallow: /a\n\n"
         "User-agent: Bingbot\nDisallow: /b\n\nUser-agent: *\nDisallow: /c\nCrawl-delay: 1.5\n"),
        ("comments.vn",
         "# header comment\nUser-agent: * # trailing\nDisallow: /x # note\n"
         "Disallow:\nAllow: /public\nCrawl-delay: 0.5\n"),
        ("orphan.vn",
         "Disallow: /before-any-group\nUser-agent: *\nDisallow: /ok\n"),
        ("empty.vn", ""),
        ("casemix.vn",
         "USER-AGENT: *\nDISALLOW: /Upper\ncrawl-DELAY: 3\n"),
    ]
    q46 = pd.DataFrame(robots_rows, columns=["host", "robots_txt"]).astype(
        {"host": "string", "robots_txt": "string"})
    q46.to_parquet(os.path.join(OUT, "q46_robots.parquet"), index=False)

    for f in ("q32_details_truth", "q33_text_truth", "q34_frontier", "q34_hosts",
              "q46_robots"):
        p = os.path.join(OUT, f + ".parquet")
        print(f, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
