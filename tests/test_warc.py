"""WARC kernel + distributed source/sink roundtrip."""

import pytest


def test_warc_kernel_roundtrip_and_framing_trap():
    from pcrawler_spark.kernels.warc import build_warc, parse_warc

    recs = [
        ("https://a.example/1", "2024-01-01T00:00:00Z", b"<html>one</html>"),
        # payload that LOOKS like a record boundary: Content-Length framing
        # must carry the reader straight through it
        ("https://a.example/2", "2024-01-02T00:00:00Z",
         b"before\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"),
        ("https://a.example/3", "2024-01-03T00:00:00Z", b""),  # empty payload
        # multi-byte UTF-8: Content-Length counts octets, not chars
        ("https://a.example/4", "2024-01-04T00:00:00Z",
         "xin chào thế giới".encode("utf-8")),
    ]
    assert parse_warc(build_warc(recs)) == recs


def test_warc_kernel_truncation_fails_loudly():
    from pcrawler_spark.kernels.warc import build_warc, parse_warc

    blob = build_warc([("u", "d", b"0123456789")])
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc(blob[:-14])  # cut into the payload
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n")


def test_warc_spark_roundtrip_one_file_per_partition(spark, tmp_path):
    from pcrawler_spark.sources.warc import read_warc, write_warc

    rows = [(f"https://h{i % 3}.example/d/{i}", "2024-02-01T00:00:00Z",
             f"<html>doc {i} body</html>") for i in range(40)]
    df = spark.createDataFrame(
        rows, "url string, warc_date string, html string").repartition(4)
    out = str(tmp_path / "warc_out")
    manifest = write_warc(df, out).collect()
    assert sum(m["n_records"] for m in manifest) == 40
    assert len(manifest) <= 4 and len(manifest) >= 1  # ≤ one file/partition

    back = read_warc(spark, out)
    got = sorted((r["url"], r["warc_date"], r["html"]) for r in back.collect())
    assert got == sorted(rows)
