"""Vietnamese E.164 phone normalization kernel (pure Python, no Spark).

Re-expresses the computation of the reference's phone tool
(/root/reference/app/tools/e164_phone_normalizer.py): multi-separator
splitting (:179-202), 9-digit → +84 inference (:243-246), bare-``84``
promotion (:281-288), leading-0 VN numbers with the VN area-code table
(:93-101, :146-154), international ``+`` passthrough (:248-269, :302-311).

The reference validates via the ``phonenumbers`` library, which is not
available here; validity is instead a documented VN numbering-plan rule:
the national significant number (NSN, digits after +84) is valid iff

* 9 digits with a mobile prefix (first two NSN digits drawn from the
  reference's area-code table minus the leading 0: 32-39, 52, 55, 56, 58,
  59, 70, 76-79, 81-89, 90-94, 96-99), or
* 9-10 digits starting with ``2`` (the 02x landline space; the reference
  accepts 02 + 8-9 further digits, e164_phone_normalizer.py:135-144,
  :530-536).

International numbers: ``+`` followed by 8-15 digits is kept verbatim
(E.164 length bound); the reference keeps >10-digit numbers as-is when
phonenumbers cannot parse them (:255-269).
"""

from __future__ import annotations

import re
from typing import List, Optional

_CLEAN_RE = re.compile(r"[^\d+]")

# e164_phone_normalizer.py:93-101 — VN area codes with leading zero.
VN_AREA_CODES = frozenset(
    [
        "032", "033", "034", "035", "036", "037", "038", "039",
        "052", "055", "056", "058", "059",
        "070", "076", "077", "078", "079",
        "081", "082", "083", "084", "085", "086", "087", "088", "089",
        "090", "091", "092", "093", "094", "096", "097", "098", "099",
        "02",
    ]
)
_MOBILE_NSN_PREFIXES = frozenset(c[1:] for c in VN_AREA_CODES if c != "02")


def _is_valid_vn_nsn(nsn: str) -> bool:
    if not nsn.isdigit():
        return False
    if len(nsn) == 9 and nsn[:2] in _MOBILE_NSN_PREFIXES:
        return True
    if nsn.startswith("2") and len(nsn) in (9, 10):
        return True
    return False


def _intl_plausible(plus_number: str) -> bool:
    digits = plus_number[1:]
    return digits.isdigit() and 8 <= len(digits) <= 15


def normalize_phone(phone: Optional[str]) -> Optional[str]:
    """Normalize one phone string to E.164; None when invalid."""
    if phone is None:
        return None
    cleaned = _CLEAN_RE.sub("", str(phone).strip())
    if not cleaned:
        return None

    # 9 digits → assume VN missing +84 (e164_phone_normalizer.py:243-246)
    if len(cleaned) == 9 and cleaned.isdigit():
        cleaned = "+84" + cleaned

    if cleaned.startswith("+84"):
        return cleaned if _is_valid_vn_nsn(cleaned[3:]) else None
    if cleaned.startswith("+"):
        # other international: keep when plausible (:302-311)
        return cleaned if _intl_plausible(cleaned) else None
    if cleaned.startswith("84") and len(cleaned) >= 10:
        # bare 84 → +84 when the area code checks out (:281-288, :121-132)
        candidate = "+" + cleaned
        if _is_valid_vn_nsn(candidate[3:]):
            return candidate
        return candidate if len(cleaned) > 10 and _intl_plausible(candidate) else None
    if cleaned.startswith("0") and len(cleaned) >= 10:
        # leading-0 VN with valid area code (:146-154, :135-144)
        if cleaned.startswith("02") and len(cleaned) in (10, 11):
            return "+84" + cleaned[1:]
        if len(cleaned) == 10 and cleaned[:3] in VN_AREA_CODES:
            return "+84" + cleaned[1:]
        return None
    if len(cleaned) > 10 and cleaned.isdigit():
        # >10 digits without + → prepend + and keep (:255-259)
        candidate = "+" + cleaned
        return candidate if _intl_plausible(candidate) else None
    return None


# Separator tiers, applied in order (e164_phone_normalizer.py:179-202).
_PRIMARY_SEPS = [";", "/", ",", "\n", "|"]
_SECONDARY_SEPS = ["\t", "-", "."]
_FINAL_SEPS = [" "]


def split_phones(phone_text: Optional[str]) -> List[str]:
    """Split a multi-phone string and normalize each part; invalid parts are
    dropped (e164_phone_normalizer.py:170-220)."""
    if not phone_text:
        return []
    parts = [str(phone_text)]
    for sep in _PRIMARY_SEPS + _SECONDARY_SEPS + _FINAL_SEPS:
        parts = [q.strip() for p in parts for q in p.split(sep) if q.strip()]
    out = []
    for p in parts:
        norm = normalize_phone(re.sub(r"\s+", "", p))
        if norm:
            out.append(norm)
    return out
