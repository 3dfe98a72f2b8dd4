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


def q36_expected() -> pd.DataFrame:
    """Expected q36 multimodal features, derived from the payload-builder
    SPEC by independent arithmetic — not by running the decoders under test:

    * PPM f0 = declared width; WAV f0 = frames/rate from the builder's own
      parameters; truncated real-format payloads must fail decode;
    * the codec-bound stub's blake2b derivation is shared by definition
      (the stub IS its spec, operators/multimodal.py:106-111);
    * n_frames = the 1s frame-sampling plan length from duration_ms.

    f0 goes through the same float32 Arrow round-trip the engine's
    ``array<float>`` column imposes before the double cast."""
    from hashlib import blake2b

    rows = []
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        truncated = i in (9, 10, 12)
        if kind == "image":
            # images alternate the two REAL decoders: BMP on i%6==0, PPM on
            # i%6==3 (mirrors q36's payload builder); f0 = declared width
            # for both, straight from the builder's own parameter
            codec = "bmp" if i % 6 == 0 else "ppm"
            f0, ok = (None, False) if truncated else (float(16 + i % 5), True)
        elif kind == "audio":
            codec = "wav"
            f0, ok = (None, False) if truncated else (float(4000 + 100 * i) / 16000.0, True)
        else:
            codec = "stub"
            payload = bytes([i % 251] * (50 + i))
            d = blake2b(payload, digest_size=16).digest()
            f0, ok = int.from_bytes(d[0:2], "big") / 65535.0, True
        n_frames = ((3000 + i * 500 - 1) // 1000) + 1 if kind == "video" else 0
        rows.append((i, kind, codec, f0, ok, n_frames))
    df = pd.DataFrame(
        rows, columns=["media_id", "kind", "codec", "f0", "decode_ok", "n_frames"])
    df["f0"] = df["f0"].astype("float32").astype("float64")
    df["media_id"] = df["media_id"].astype("int64")
    df["n_frames"] = df["n_frames"].astype("int64")
    return df.astype({"kind": "string", "codec": "string"})


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

    q36_expected().to_parquet(os.path.join(OUT, "q36_media_truth.parquet"), index=False)

    for f in ("q32_details_truth", "q33_text_truth", "q34_frontier", "q34_hosts",
              "q46_robots", "q36_media_truth"):
        p = os.path.join(OUT, f + ".parquet")
        print(f, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
