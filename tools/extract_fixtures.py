"""Extract the golden parser fixtures from the reference test suite.

Scans /root/reference/crypto-msg-parser/tests/*.rs for `let raw_msg = r#"…"#`
literals together with their enclosing `mod` (message type) and test fn name
(market type), and writes tests/fixtures/reference_fixtures.jsonl. These are
test VECTORS (public exchange WebSocket/REST payloads), not code.

Run: python tools/extract_fixtures.py
"""

from __future__ import annotations

import json
import pathlib
import re

TESTS_DIR = pathlib.Path("/root/reference/crypto-msg-parser/tests")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests/fixtures/reference_fixtures.jsonl"

MOD_TO_MSG_TYPE = {
    "trade": "trade",
    "l2_event": "l2_event",
    "l2_orderbook": "l2_event",
    "l2_update": "l2_event",
    "order_book_l2_25": "l2_event",
    "order_book_l2": "l2_event",
    "l2_topk": "l2_topk",
    "l2_top20": "l2_topk",
    "l2_snapshot": "l2_snapshot",
    "bbo": "bbo",
    "ticker": "ticker",
    "candlestick": "candlestick",
    "funding_rate": "funding_rate",
    "before_20220429": None,  # nested era mod — msg type comes from parent
    "session": None,
    "other": "other",
}

FN_TO_MARKET = {
    "spot": "spot",
    "linear_future": "linear_future",
    "inverse_future": "inverse_future",
    "linear_swap": "linear_swap",
    "inverse_swap": "inverse_swap",
    "quanto_swap": "quanto_swap",
    "quanto_future": "quanto_future",
    "option": "european_option",
    "european_option": "european_option",
    "move": "move",
    "bvol": "bvol",
}


def market_from_fn(fn: str) -> str | None:
    if fn in FN_TO_MARKET:
        return FN_TO_MARKET[fn]
    # e.g. spot_20210916, inverse_swap_all, linear_swapu, option_all
    for key, mt in sorted(FN_TO_MARKET.items(), key=lambda kv: -len(kv[0])):
        if fn.startswith(key):
            return mt
    return None


RAW_RE = re.compile(r'let\s+raw_msg\s*=\s*r#"(.*?)"#', re.DOTALL)
MOD_RE = re.compile(r"^(\s*)mod\s+(\w+)\s*\{")
FN_RE = re.compile(r"^\s*fn\s+(\w+)\s*\(")


def extract_file(path: pathlib.Path) -> list[dict]:
    exchange = path.stem.replace("_v3", "").replace("_v5", "")
    variant = path.stem
    text = path.read_text()
    lines = text.splitlines()
    # map char offset -> (mod, fn) by walking lines
    events = []  # (offset, kind, name)
    offset = 0
    for line in lines:
        m = MOD_RE.match(line)
        if m:
            events.append((offset, "mod", m.group(2)))
        m = FN_RE.match(line)
        if m:
            events.append((offset, "fn", m.group(1)))
        offset += len(line) + 1
    out = []
    for i, m in enumerate(RAW_RE.finditer(text)):
        mod = fn = None
        for off, kind, name in events:
            if off > m.start():
                break
            if kind == "mod":
                if MOD_TO_MSG_TYPE.get(name, name) is not None:
                    mod = name
            else:
                fn = name
        msg_type = MOD_TO_MSG_TYPE.get(mod, mod) if mod else None
        out.append(
            {
                "fixture_id": f"{variant}:{mod}:{fn}:{i}",
                "exchange": exchange,
                "variant": variant,
                "msg_type": msg_type,
                "market_type": market_from_fn(fn) if fn else None,
                "test_fn": fn,
                "raw": m.group(1),
            }
        )
    return out


def main() -> None:
    rows = []
    for path in sorted(TESTS_DIR.glob("*.rs")):
        if path.stem == "utils":
            continue
        rows.extend(extract_file(path))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    by_ex: dict[str, int] = {}
    for r in rows:
        by_ex[r["exchange"]] = by_ex.get(r["exchange"], 0) + 1
    print(f"{len(rows)} fixtures -> {OUT}")
    print(dict(sorted(by_ex.items(), key=lambda kv: -kv[1])))


if __name__ == "__main__":
    main()
