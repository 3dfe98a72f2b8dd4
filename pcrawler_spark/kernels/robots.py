"""robots.txt parsing kernel (pure Python, no Spark).

The reference never fetches robots.txt (its politeness is sleep-based,
detail_crawler.py:28); the north_star upgrades politeness to "crawl-delay +
robots.txt rules materialized as a broadcast-joined host table".  This
kernel turns a raw robots.txt body into that table's row.

Semantics (the subset relevant to a crawler identifying as ``*``, per the
public robots.txt RFC 9309 and the de-facto Crawl-delay extension):

* group selection: the ``User-agent: *`` group(s); a group runs from a
  User-agent line to the next User-agent line that starts a new group;
  consecutive User-agent lines share one group;
* ``Disallow:`` path prefixes collected from the selected groups; an empty
  Disallow means "allow all" and contributes nothing; rules outside any
  group are ignored;
* ``Crawl-delay:`` seconds from the selected groups (last one wins);
* comments (#...) stripped, field names case-insensitive, values trimmed;
* a missing/empty/unparseable file ⇒ no restrictions (None delay, []).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union


def parse_robots(body: Union[str, bytes, None],
                 agent: str = "*") -> Tuple[Optional[float], List[str]]:
    """Returns (crawl_delay_s or None, sorted disallow path prefixes)."""
    if body is None:
        return None, []
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    delay: Optional[float] = None
    disallow: List[str] = []
    in_selected = False
    prev_was_agent = False
    agent_l = agent.lower()
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if prev_was_agent:
                # consecutive agents extend the same group
                in_selected = in_selected or value.lower() == agent_l
            else:
                in_selected = value.lower() == agent_l
            prev_was_agent = True
            continue
        prev_was_agent = False
        if not in_selected:
            continue
        if field == "disallow" and value:
            disallow.append(value)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return delay, sorted(set(disallow))
