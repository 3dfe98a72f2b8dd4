"""PII masking for training-data pipelines — emails, IPv4 addresses, phone
numbers replaced by typed placeholders, with per-category match counts.

Every public web-text curation pipeline masks PII before training (CCNet,
RefinedWeb, Dolma all ship an email/IP/phone regex pass); the reference
engine extracts emails/phones as *data* (app/extractor/*), and this operator
is the complementary sink-side guard: same entity classes, opposite
direction.

Design constraints:

* **JVM-side only** — a chain of ``regexp_replace`` / ``regexp_extract_all``
  column expressions, whole-stage-codegen friendly, no Python in the path.
* **Engine-portable patterns** — the regexes avoid backreferences,
  lookaround, and ``\\b`` so the same strings run identically under Java
  ``java.util.regex`` (Spark) and RE2 (DuckDB oracle).  Parity is pinned by
  the q39 oracle, which replays the staged pipeline in SQL.
* **Staged counting** — categories are counted AND replaced in a fixed
  order (email → IPv4 → phone); each stage counts on the PREVIOUS stage's
  output, so a digit run inside an already-masked email local-part is never
  double-counted as a phone.  The placeholders contain no digits, so later
  stages cannot re-match earlier replacements.

The phone pattern is deliberately aggressive (any 9+-char digit/hyphen run,
international ``+`` optional): for PII masking, recall beats precision —
the cost of masking a stray id is nil next to leaking a number.  Exact
E.164 *validation* (the opposite trade-off) lives in ``kernels/phones.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\+?\d[\d-]{7,}\d"

EMAIL_TAG = "<EMAIL>"
IP_TAG = "<IP>"
PHONE_TAG = "<PHONE>"

# (count column, pattern, placeholder) in replacement order — the order is
# part of the contract (see module docstring) and the q39 oracle replays it
PII_STAGES = (
    ("n_emails", EMAIL_RE, EMAIL_TAG),
    ("n_ips", IPV4_RE, IP_TAG),
    ("n_phones", PHONE_RE, PHONE_TAG),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Mask emails → IPv4s → phones in ``text_col``; emit ``out_col`` plus
    long count columns ``n_emails``/``n_ips``/``n_phones`` (matches counted
    on the stage input, i.e. after earlier categories were masked)."""
    cur: Column = F.col(text_col)
    out = df
    for cnt_col, pat, tag in PII_STAGES:
        out = out.withColumn(
            cnt_col,
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast("long"),
        )
        cur = F.regexp_replace(cur, pat, tag)
    return out.withColumn(out_col, cur)
