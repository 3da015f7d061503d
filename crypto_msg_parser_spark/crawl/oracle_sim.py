"""Single-threaded Python oracle for the politeness scheduler (SURVEY §7.3
item 1): a heap-based simulator that executes the crawl spec imperatively.
The Spark job (crawl/scheduler.py) must reproduce its visit sequence and
seen-set exactly under the same seeds + budgets."""

from __future__ import annotations

import hashlib
import heapq
import re


def canonical_url(url: str) -> str:
    """Reference implementation of crawl/canonicalize.py in plain Python."""
    url = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    scheme = m.group(1).lower() if m else ""
    rest = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", url)
    am = re.match(r"^([^/?]*)", rest)
    authority = am.group(1).lower()
    path_query = rest[len(am.group(1)) :]
    if scheme == "https" and authority.endswith(":443"):
        authority = authority[: -len(":443")]
    elif scheme == "http" and authority.endswith(":80"):
        authority = authority[: -len(":80")]
    pm = re.match(r"^([^?]*)", path_query)
    path = pm.group(1)
    query = re.sub(r"^[^?]*\??", "", path_query)
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    if path == "":
        path = "/"
    if query:
        query = "&".join(sorted(query.split("&")))
        return f"{scheme}://{authority}{path}?{query}"
    return f"{scheme}://{authority}{path}"


def stable_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def simulate(rows: list[dict]) -> list[dict]:
    """rows: [{url, host, priority, rate_budget_per_min}] ->
    visit sequence [{canonical, host, in_host_rank, epoch}] with the
    URL-seen set applied (first occurrence of a canonical URL wins)."""
    seen: set[str] = set()
    per_host: dict[str, list] = {}
    budget: dict[str, int] = {}
    for r in rows:
        c = canonical_url(r["url"])
        if c in seen:
            continue
        seen.add(c)
        host = r["host"]
        heapq.heappush(
            per_host.setdefault(host, []),
            (r["priority"], stable_hash64(c), c),
        )
        budget[host] = r["rate_budget_per_min"]

    out = []
    epoch = 0
    while any(per_host.values()):
        for host in sorted(h for h, q in per_host.items() if q):
            n = 0
            base_rank = budget[host] * epoch
            while per_host[host] and n < budget[host]:
                prio, h64, c = heapq.heappop(per_host[host])
                n += 1
                out.append(
                    {
                        "canonical": c,
                        "host": host,
                        "in_host_rank": base_rank + n,
                        "epoch": epoch,
                    }
                )
        epoch += 1
    return out
