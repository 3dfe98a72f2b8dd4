"""PII redaction operator: staged email → IPv4 → phone masking."""


def test_redact_pii_staged_semantics(spark):
    from pcrawler_spark.operators.redact import redact_pii

    docs = spark.createDataFrame(
        [
            # digit-heavy email local part: the 9-digit run must be counted
            # as EMAIL only — the phone stage sees '<EMAIL>' (no digits)
            (1, "mail 000000042@example.com please"),
            (2, "call 25-989-741-2988 or +84-123-4567-890 now"),
            (3, "server 10.0.0.1 and 192.168.255.254 up"),
            (4, "plain text, no pii at all"),
            # mixed, in reverse order of the stages
            (5, "tel 84-555-123-4567 ip 172.16.0.9 mail a.b+c@x.io"),
            # short digit runs stay: 8-char run is below the phone floor
            (6, "order 1234-567 ref 42"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}

    assert out[1]["redacted"] == "mail <EMAIL> please"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)

    assert out[2]["redacted"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_phones"] == 2

    assert out[3]["redacted"] == "server <IP> and <IP> up"
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 2, 0)

    assert out[4]["redacted"] == out[4]["text"]
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)

    assert out[5]["redacted"] == "tel <PHONE> ip <IP> mail <EMAIL>"
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)

    assert out[6]["redacted"] == out[6]["text"]
    assert out[6]["n_phones"] == 0
