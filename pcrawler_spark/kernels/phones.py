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


# Vendored subset of PUBLIC international numbering metadata (ITU-T E.164
# country codes + national-number patterns as published in libphonenumber's
# open metadata).  The reference validates via the `phonenumbers` library
# (e164_phone_normalizer.py:248-311), which is not in this env; these
# patterns reproduce its is_valid_number outcome for the most common
# countries.  Keys are country calling codes, values validate the NSN
# (digits after the country code).
INTL_NSN_RULES = {
    "1": re.compile(r"[2-9]\d{2}[2-9]\d{6}"),           # NANP (US/CA): NXX-NXX-XXXX
    "44": re.compile(r"7[1-9]\d{8}|[123]\d{9}|8\d{8,9}"),  # UK mobile/geo/non-geo
    "33": re.compile(r"[1-9]\d{8}"),                     # FR: 9 NSN digits
    "49": re.compile(r"[1-9]\d{5,10}"),                  # DE: variable length
    "61": re.compile(r"[2-478]\d{8}"),                   # AU
    "65": re.compile(r"[3689]\d{7}"),                    # SG: 8 digits
    "66": re.compile(r"[2-9]\d{7,8}"),                   # TH
    "81": re.compile(r"[1-9]\d{8,9}"),                   # JP
    "82": re.compile(r"[1-9]\d{7,9}"),                   # KR
    "86": re.compile(r"1[3-9]\d{9}|[2-9]\d{8,10}"),      # CN mobile/landline
    "91": re.compile(r"[6-9]\d{9}"),                     # IN: 10 digits
    # r4 extension — 18 more common calling codes, patterns simplified from
    # libphonenumber's published generalDesc/fixedLine/mobile metadata
    "7": re.compile(r"[34689]\d{9}|7\d{9}"),             # RU (3/4/8/9) + KZ (6/7): 10 NSN digits
    "31": re.compile(r"[1-9]\d{8}"),                     # NL: 9 digits
    "32": re.compile(r"4\d{8}|[1-9]\d{7}"),              # BE: mobile 9 / geo 8
    "34": re.compile(r"[6-9]\d{8}"),                     # ES: 9 digits
    "39": re.compile(r"0\d{5,10}|3\d{8,9}"),             # IT: keeps leading 0
    "41": re.compile(r"[1-9]\d{8}"),                     # CH: 9 digits
    "43": re.compile(r"[1-9]\d{3,12}"),                  # AT: variable length
    "46": re.compile(r"[1-9]\d{6,12}"),                  # SE: variable length
    "47": re.compile(r"[2-9]\d{7}"),                     # NO: 8 digits
    "48": re.compile(r"[1-9]\d{8}"),                     # PL: 9 digits
    "52": re.compile(r"[1-9]\d{9}"),                     # MX: 10 digits
    "55": re.compile(r"[1-9]\d{9,10}"),                  # BR: 10-11 digits
    "60": re.compile(r"[1-9]\d{7,9}"),                   # MY
    "62": re.compile(r"[2-9]\d{7,11}"),                  # ID
    "63": re.compile(r"[2-9]\d{7,9}"),                   # PH
    "852": re.compile(r"[2-9]\d{7}"),                    # HK: 8 digits
    "886": re.compile(r"[2-9]\d{7,8}"),                  # TW: 8-9 digits
    "971": re.compile(r"5\d{8}|[2-9]\d{7}"),             # AE: mobile 9 / geo 8
    # r5 extension — 25 more calling codes (54 total), patterns simplified
    # from libphonenumber's published metadata as before
    "20": re.compile(r"1[0125]\d{8}|[2-9]\d{6,8}"),      # EG: mobile 10 / geo 8-9
    "27": re.compile(r"[1-9]\d{8}"),                     # ZA: 9 digits
    "30": re.compile(r"[26]\d{9}"),                      # GR: geo 2x / mobile 69x
    "36": re.compile(r"[1-9]\d{7,8}"),                   # HU: 8-9 digits
    "40": re.compile(r"[237]\d{8}"),                     # RO: 9 digits
    "45": re.compile(r"[2-9]\d{7}"),                     # DK: 8 digits
    "51": re.compile(r"9\d{8}|[1-8]\d{7}"),              # PE: mobile 9 / geo 8
    "54": re.compile(r"9\d{10}|[1-8]\d{9}"),             # AR: +54 9 mobile / geo 10
    "56": re.compile(r"[2-9]\d{8}"),                     # CL: 9 digits
    "57": re.compile(r"[36]\d{9}"),                      # CO: mobile 3x / fixed 60x
    "64": re.compile(r"[2-9]\d{7,9}"),                   # NZ: variable length
    "90": re.compile(r"[2-5]\d{9}"),                     # TR: 10 digits
    "92": re.compile(r"[1-9]\d{8,9}"),                   # PK: 9-10 digits
    "212": re.compile(r"[5-8]\d{8}"),                    # MA: 9 digits
    "234": re.compile(r"[789]\d{9}|[1-9]\d{6,8}"),       # NG: mobile 10 / geo 7-9
    "254": re.compile(r"[17]\d{8}|[2-9]\d{6,7}"),        # KE: mobile 9 / geo 7-8
    "351": re.compile(r"[2369]\d{8}"),                   # PT: 9 digits
    "353": re.compile(r"[1-9]\d{6,9}"),                  # IE: variable length
    "358": re.compile(r"[1-9]\d{4,11}"),                 # FI: variable length
    "380": re.compile(r"[3-9]\d{8}"),                    # UA: 9 digits
    "420": re.compile(r"[2-9]\d{8}"),                    # CZ: 9 digits
    "421": re.compile(r"[2-9]\d{8}"),                    # SK: 9 digits
    "880": re.compile(r"1[3-9]\d{8}|[2-9]\d{5,8}"),      # BD: mobile 10 / geo 6-9
    "966": re.compile(r"5\d{8}|1\d{7,8}"),               # SA: mobile 9 / geo 8-9
    "972": re.compile(r"5\d{8}|7\d{8}|[2-489]\d{7}"),    # IL: mobile/VoIP 9 / geo 8
    # r5b extension — 32 more calling codes (88 total; +84 VN is handled by the exact VN rules above), patterns simplified
    # from libphonenumber's published metadata as before
    "93": re.compile(r"[2-7]\d{8}"),                     # AF: 9 digits
    "94": re.compile(r"[1-9]\d{8}"),                     # LK: 9 digits
    "95": re.compile(r"[1-9]\d{5,9}"),                   # MM: variable length
    "98": re.compile(r"[1-9]\d{9}"),                     # IR: 10 digits
    "213": re.compile(r"[5-7]\d{8}|[1-49]\d{7}"),        # DZ: mobile 9 / geo 8
    "216": re.compile(r"[2-9]\d{7}"),                    # TN: 8 digits
    "221": re.compile(r"[37]\d{8}"),                     # SN: 9 digits
    "233": re.compile(r"[2-9]\d{8}"),                    # GH: 9 digits
    "255": re.compile(r"[1-9]\d{8}"),                    # TZ: 9 digits
    "256": re.compile(r"[1-9]\d{8}"),                    # UG: 9 digits
    "355": re.compile(r"[2-9]\d{7,8}"),                  # AL: 8-9 digits
    "359": re.compile(r"[1-9]\d{7,8}"),                  # BG: 8-9 digits
    "370": re.compile(r"[3-9]\d{7}"),                    # LT: 8 digits
    "371": re.compile(r"[2-7]\d{7}"),                    # LV: 8 digits
    "372": re.compile(r"[3-9]\d{6,7}"),                  # EE: 7-8 digits
    "375": re.compile(r"[1-9]\d{8}"),                    # BY: 9 digits
    "381": re.compile(r"[1-9]\d{7,8}"),                  # RS: 8-9 digits
    "385": re.compile(r"[1-9]\d{7,8}"),                  # HR: 8-9 digits
    "386": re.compile(r"[1-9]\d{7}"),                    # SI: 8 digits
    "853": re.compile(r"[68]\d{7}"),                     # MO: 8 digits
    "855": re.compile(r"[1-9]\d{7,8}"),                  # KH: 8-9 digits
    "856": re.compile(r"[2-8]\d{7,9}"),                  # LA: 8-10 digits
    "961": re.compile(r"[1-9]\d{6,7}"),                  # LB: 7-8 digits
    "962": re.compile(r"7[789]\d{7}|[2-6]\d{7}"),        # JO: mobile 9 / geo 8
    "964": re.compile(r"7\d{9}|[1-6]\d{7,8}"),           # IQ: mobile 10 / geo 8-9
    "965": re.compile(r"[12569]\d{7}"),                  # KW: 8 digits
    "968": re.compile(r"[279]\d{7}"),                    # OM: 8 digits
    "973": re.compile(r"[13689]\d{7}"),                  # BH: 8 digits
    "974": re.compile(r"[2-7]\d{7}"),                    # QA: 8 digits
    "976": re.compile(r"[1-9]\d{7}"),                    # MN: 8 digits
    "977": re.compile(r"9[678]\d{8}|[1-8]\d{6,7}"),      # NP: mobile 10 / geo 7-8
    "994": re.compile(r"[1-9]\d{8}"),                    # AZ: 9 digits
    "995": re.compile(r"[2-9]\d{8}"),                    # GE: 9 digits
    "998": re.compile(r"[1-9]\d{8}"),                    # UZ: 9 digits
    # r5c extension — 60 more calling codes (148 total), patterns simplified
    # from libphonenumber's published metadata as before
    "53": re.compile(r"5\d{7}|[2-4]\d{5,7}"),            # CU: mobile 8 / geo 6-8
    "58": re.compile(r"[24]\d{9}"),                      # VE: 10 digits (geo 2xx / mobile 4xx)
    "211": re.compile(r"[19]\d{8}"),                     # SS: 9 digits
    "218": re.compile(r"9\d{8}|[1-8]\d{6,7}"),           # LY: mobile 9 / geo 7-8
    "220": re.compile(r"[2-9]\d{6}"),                    # GM: 7 digits
    "222": re.compile(r"[2-4]\d{7}"),                    # MR: 8 digits
    "223": re.compile(r"[2-9]\d{7}"),                    # ML: 8 digits
    "224": re.compile(r"6\d{8}|[3-9]\d{7}"),             # GN: mobile 9 / geo 8
    "226": re.compile(r"[025-7]\d{7}"),                  # BF: 8 digits
    "227": re.compile(r"[0289]\d{7}"),                   # NE: 8 digits
    "228": re.compile(r"[279]\d{7}"),                    # TG: 8 digits
    "230": re.compile(r"[2-9]\d{6,7}"),                  # MU: 7-8 digits
    "231": re.compile(r"[2-9]\d{6,8}"),                  # LR: 7-9 digits
    "232": re.compile(r"[2-9]\d{7}"),                    # SL: 8 digits
    "235": re.compile(r"[2679]\d{7}"),                   # TD: 8 digits
    "236": re.compile(r"[278]\d{7}"),                    # CF: 8 digits
    "237": re.compile(r"[26]\d{8}"),                     # CM: 9 digits (mobile 6 / geo 2)
    "238": re.compile(r"[2359]\d{6}"),                   # CV: 7 digits
    "243": re.compile(r"[1-9]\d{8}"),                    # CD: 9 digits
    "244": re.compile(r"[29]\d{8}"),                     # AO: 9 digits
    "248": re.compile(r"[24]\d{6}"),                     # SC: 7 digits
    "249": re.compile(r"[19]\d{8}"),                     # SD: 9 digits
    "250": re.compile(r"[27]\d{8}"),                     # RW: 9 digits
    "251": re.compile(r"[1-59]\d{8}"),                   # ET: 9 digits
    "253": re.compile(r"[27]\d{7}"),                     # DJ: 8 digits
    "257": re.compile(r"[2-8]\d{7}"),                    # BI: 8 digits
    "258": re.compile(r"8\d{8}|2\d{7}"),                 # MZ: mobile 9 / geo 8
    "260": re.compile(r"[279]\d{8}"),                    # ZM: 9 digits
    "261": re.compile(r"[23]\d{8}"),                     # MG: 9 digits
    "263": re.compile(r"7\d{8}|[2-6]\d{5,9}"),           # ZW: mobile 9 / geo variable
    "264": re.compile(r"[68]\d{7,8}"),                   # NA: geo 8 / mobile 9
    "265": re.compile(r"[89]\d{8}|1\d{6}"),              # MW: mobile 9 / geo 7
    "266": re.compile(r"[2568]\d{7}"),                   # LS: 8 digits
    "267": re.compile(r"7\d{7}|[2-6]\d{6}"),             # BW: mobile 8 / geo 7
    "268": re.compile(r"[237]\d{7}"),                    # SZ: 8 digits
    "291": re.compile(r"[178]\d{6}"),                    # ER: 7 digits
    "350": re.compile(r"[256]\d{7}"),                    # GI: 8 digits
    "352": re.compile(r"[2-9]\d{3,10}"),                 # LU: variable length
    "354": re.compile(r"[4-8]\d{6}"),                    # IS: 7 digits
    "356": re.compile(r"[2579]\d{7}"),                   # MT: 8 digits
    "357": re.compile(r"[29]\d{7}"),                     # CY: 8 digits
    "373": re.compile(r"[267]\d{7}"),                    # MD: 8 digits
    "374": re.compile(r"[1-9]\d{7}"),                    # AM: 8 digits
    "376": re.compile(r"[3-8]\d{5,8}"),                  # AD: 6-9 digits
    "377": re.compile(r"[469]\d{7,8}"),                  # MC: 8-9 digits
    "382": re.compile(r"[2-9]\d{7,8}"),                  # ME: 8-9 digits
    "383": re.compile(r"[2-9]\d{7}"),                    # XK: 8 digits
    "387": re.compile(r"[3-6]\d{7}"),                    # BA: 8 digits
    "389": re.compile(r"[2-7]\d{7}"),                    # MK: 8 digits
    "423": re.compile(r"[2-7]\d{6}"),                    # LI: 7 digits
    "502": re.compile(r"[2-7]\d{7}"),                    # GT: 8 digits
    "503": re.compile(r"[267]\d{7}"),                    # SV: 8 digits
    "504": re.compile(r"[2389]\d{7}"),                   # HN: 8 digits
    "505": re.compile(r"[258]\d{7}"),                    # NI: 8 digits
    "506": re.compile(r"[2468]\d{7}"),                   # CR: 8 digits
    "507": re.compile(r"6\d{7}|[2-9]\d{6}"),             # PA: mobile 8 / geo 7
    "509": re.compile(r"[2-9]\d{7}"),                    # HT: 8 digits
    "591": re.compile(r"[2-7]\d{7}"),                    # BO: 8 digits
    "593": re.compile(r"9\d{8}|[2-7]\d{6,7}"),           # EC: mobile 9 / geo 7-8
    "595": re.compile(r"9\d{8}|[2-8]\d{7,8}"),           # PY: mobile 9 / geo 8-9
    "598": re.compile(r"[249]\d{7}"),                    # UY: 8 digits
    "670": re.compile(r"7\d{7}|[23]\d{6}"),              # TL: mobile 8 / geo 7
    "673": re.compile(r"[2-8]\d{6}"),                    # BN: 7 digits
    "675": re.compile(r"[2-9]\d{6,7}"),                  # PG: 7-8 digits
    "679": re.compile(r"[2-9]\d{6}"),                    # FJ: 7 digits
    "960": re.compile(r"[3679]\d{6}"),                   # MV: 7 digits
    "963": re.compile(r"9\d{8}|[1-5]\d{7,8}"),           # SY: mobile 9 / geo 8-9
    "967": re.compile(r"7\d{8}|[1-6]\d{6,7}"),           # YE: mobile 9 / geo 7-8
    "970": re.compile(r"5\d{8}|[2-9]\d{7}"),             # PS: mobile 9 / geo 8
    "975": re.compile(r"[1-8]\d{6,7}"),                  # BT: 7-8 digits
    "992": re.compile(r"[1-9]\d{8}"),                    # TJ: 9 digits
    "993": re.compile(r"[1-8]\d{7}"),                    # TM: 8 digits
    "996": re.compile(r"[3-9]\d{8}"),                    # KG: 9 digits
    # r6 extension — the FINAL 45 assigned geographic/shared ITU-T E.164
    # codes (206 total incl. +84's exact VN rules above): island and
    # territory plans, simplified from the ITU national numbering plans /
    # libphonenumber's published metadata as before.  The calling-code
    # LIST is now complete; pattern fidelity (not coverage) is the
    # remaining delta vs `phonenumbers`.
    "225": re.compile(r"[02]\d{9}"),                     # CI: 10 digits (2021 plan)
    "229": re.compile(r"01\d{8}|[24-9]\d{7}"),           # BJ: 10 (2022 plan) / legacy 8
    "239": re.compile(r"[29]\d{6}"),                     # ST: 7 digits
    "240": re.compile(r"[235]\d{8}"),                    # GQ: 9 digits
    "241": re.compile(r"[0-7]\d{6,8}"),                  # GA: 7-9 digits
    "242": re.compile(r"[02]\d{8}"),                     # CG: 9 digits
    "245": re.compile(r"9\d{8}|4\d{6}"),                 # GW: mobile 9 / geo 7
    "246": re.compile(r"3\d{6}"),                        # IO: 7 digits
    "247": re.compile(r"[46]\d{4}"),                     # AC: 5 digits
    "252": re.compile(r"[1-9]\d{5,8}"),                  # SO: variable length
    "262": re.compile(r"[26-9]\d{8}"),                   # RE/YT: 9 digits
    "269": re.compile(r"[3478]\d{6}"),                   # KM: 7 digits
    "290": re.compile(r"[256]\d{3,4}"),                  # SH: 4-5 digits
    "297": re.compile(r"[25-9]\d{6}"),                   # AW: 7 digits
    "298": re.compile(r"[2-9]\d{5}"),                    # FO: 6 digits
    "299": re.compile(r"[1-9]\d{5}"),                    # GL: 6 digits
    "378": re.compile(r"[05-9]\d{5,9}"),                 # SM: variable length
    "500": re.compile(r"[2-7]\d{4}"),                    # FK: 5 digits
    "501": re.compile(r"[2-8]\d{6}"),                    # BZ: 7 digits
    "508": re.compile(r"[45]\d{5}"),                     # PM: 6 digits
    "590": re.compile(r"[56]9\d{7}"),                    # GP/BL/MF: 9 digits
    "592": re.compile(r"[2-7]\d{6}"),                    # GY: 7 digits
    "594": re.compile(r"[56]94\d{6}"),                   # GF: 9 digits
    "596": re.compile(r"[56]96\d{6}"),                   # MQ: 9 digits
    "597": re.compile(r"[2-8]\d{5,6}"),                  # SR: 6-7 digits
    "599": re.compile(r"[34569]\d{6,7}"),                # CW/BQ: 7-8 digits
    "672": re.compile(r"[13]\d{5}"),                     # NF: 6 digits
    "674": re.compile(r"[45]\d{6}"),                     # NR: 7 digits
    "676": re.compile(r"[2-8]\d{4,6}"),                  # TO: 5 or 7 digits
    "677": re.compile(r"[1-9]\d{4,6}"),                  # SB: 5 or 7 digits
    "678": re.compile(r"[2-9]\d{4,6}"),                  # VU: 5 or 7 digits
    "680": re.compile(r"[2-8]\d{6}"),                    # PW: 7 digits
    "681": re.compile(r"[4-8]\d{5}"),                    # WF: 6 digits
    "682": re.compile(r"[2-8]\d{4}"),                    # CK: 5 digits
    "683": re.compile(r"[1-9]\d{3,6}"),                  # NU: 4 or 7 digits
    "685": re.compile(r"[2-8]\d{4,6}"),                  # WS: 5-7 digits
    "686": re.compile(r"[2-9]\d{4,7}"),                  # KI: 5 or 8 digits
    "687": re.compile(r"[2-9]\d{5}"),                    # NC: 6 digits
    "688": re.compile(r"[279]\d{4,6}"),                  # TV: 5-7 digits
    "689": re.compile(r"[48]\d{7}|[2-9]\d{5}"),          # PF: 8 / legacy 6
    "690": re.compile(r"[2-9]\d{3,6}"),                  # TK: 4-7 digits
    "691": re.compile(r"[39]\d{6}"),                     # FM: 7 digits
    "692": re.compile(r"[2-6]\d{6}"),                    # MH: 7 digits
    "850": re.compile(r"[1-9]\d{6,9}"),                  # KP: variable length
    "870": re.compile(r"7\d{8}"),                        # Inmarsat: 9 digits
}


def is_valid_international(plus_number: str) -> bool:
    """True when a ``+``-prefixed number is valid under the vendored
    metadata: country code recognized (longest match first) and NSN matching
    that country's pattern; unknown country codes fall back to the E.164
    length bound (8-15 digits) — the same 'cannot parse' tolerance the
    reference applies when phonenumbers raises (:255-269)."""
    digits = plus_number[1:]
    if not (digits.isdigit() and 8 <= len(digits) <= 15):
        return False
    for cc_len in (3, 2, 1):
        rule = INTL_NSN_RULES.get(digits[:cc_len])
        if rule is not None:
            return bool(rule.fullmatch(digits[cc_len:]))
    return True


def _intl_plausible(plus_number: str) -> bool:
    """Keep-or-drop rule for non-VN ``+`` numbers, mirroring the reference's
    actual control flow (e164_phone_normalizer.py):

    * ``len(cleaned) > 10`` (≥10 digits): the reference keeps the number
      VERBATIM even when phonenumbers says invalid (:248-269 — invalid
      parses fall through to ``return cleaned``), so only the E.164 length
      bound applies;
    * shorter ``+`` numbers (:302-311) are kept only when genuinely valid —
      here: the vendored per-country NSN patterns."""
    digits = plus_number[1:]
    if not (digits.isdigit() and 8 <= len(digits) <= 15):
        return False
    if len(plus_number) > 10:
        return True
    return is_valid_international(plus_number) and any(
        digits[:cc_len] in INTL_NSN_RULES for cc_len in (3, 2, 1)
    )


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
