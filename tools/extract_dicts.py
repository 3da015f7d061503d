"""Extract the reference's offline dictionary tables into JSON data files.

These are market FACTS (contract multipliers, tick sizes, symbol ids)
embedded as offline fallbacks in the reference's Lazy blocks; the engine
broadcasts them as dimension tables. Output goes to
crypto_msg_parser_spark/parser/data/*.json.

Run: python tools/extract_dicts.py
"""

from __future__ import annotations

import json
import pathlib
import re

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / (
    "crypto_msg_parser_spark/parser/data"
)

PAIR_VAL_RE = re.compile(r'\(\s*"([^"]+)"\s*,\s*([0-9_.eE+-]+)_f64\s*\)')
LET_RE = re.compile(r"let\s+(\w+)\s*:")


def blocks_with_pairs(path: pathlib.Path) -> dict[str, dict[str, float]]:
    """Map each `let <name>` block to the (pair -> value) entries inside."""
    text = path.read_text()
    lets = [(m.start(), m.group(1)) for m in LET_RE.finditer(text)]
    out: dict[str, dict[str, float]] = {}
    for m in PAIR_VAL_RE.finditer(text):
        owner = None
        for off, name in lets:
            if off > m.start():
                break
            owner = name
        if owner is None:
            continue
        val = float(m.group(2).replace("_", ""))
        out.setdefault(owner, {})[m.group(1)] = val
    return out


def extract_okx() -> None:
    # crypto-contract-value/src/exchanges/okx.rs:10-244 (linear_swap /
    # linear_future / option offline maps)
    b = blocks_with_pairs(REF / "crypto-contract-value/src/exchanges/okx.rs")
    data = {
        "linear_swap": b.get("linear_swap", {}),
        "linear_future": b.get("linear_future", {}),
        "european_option": b.get("option", {}),
    }
    (OUT / "okx_contract_values.json").write_text(json.dumps(data, indent=1))
    print("okx:", {k: len(v) for k, v in data.items()})


BITMEX_ROW_RE = re.compile(r'\(\s*"([^"]+)"\s*,\s*\(\s*(\d+)\s*,\s*([0-9_.eE+-]+)\s*\)\s*\)')


def extract_bitmex_ticks() -> None:
    # bitmex (symbol -> (index, tick_size)) static table
    # crypto-msg-parser/src/exchanges/bitmex.rs:20-501
    text = (REF / "crypto-msg-parser/src/exchanges/bitmex.rs").read_text()
    rows = {
        m.group(1): [int(m.group(2)), float(m.group(3).replace("_", ""))]
        for m in BITMEX_ROW_RE.finditer(text)
    }
    (OUT / "bitmex_ticks.json").write_text(json.dumps(rows, indent=0))
    print("bitmex ticks:", len(rows))


def extract_huobi() -> None:
    b = blocks_with_pairs(REF / "crypto-contract-value/src/exchanges/huobi.rs")
    (OUT / "huobi_contract_values.json").write_text(json.dumps(b, indent=1))
    print("huobi:", {k: len(v) for k, v in b.items()})


def extract_kraken() -> None:
    b = blocks_with_pairs(REF / "crypto-contract-value/src/exchanges/kraken.rs")
    (OUT / "kraken_contract_values.json").write_text(json.dumps(b, indent=1))
    print("kraken:", {k: len(v) for k, v in b.items()})


def extract_bybit() -> None:
    b = blocks_with_pairs(REF / "crypto-contract-value/src/exchanges/bybit.rs")
    (OUT / "bybit_contract_values.json").write_text(json.dumps(b, indent=1))
    print("bybit:", {k: len(v) for k, v in b.items()})


BITMEX_CV_RE = re.compile(r'\(\s*"([a-z_]+\.[^"]+)"\s*,\s*([0-9.eE+-]+)\s*\)')


def extract_bitmex_cvs() -> None:
    # keyed "market_type.pair", default 1.0
    # (crypto-contract-value/src/exchanges/bitmex.rs:9-142)
    text = (REF / "crypto-contract-value/src/exchanges/bitmex.rs").read_text()
    rows = {m.group(1): float(m.group(2)) for m in BITMEX_CV_RE.finditer(text)}
    (OUT / "bitmex_contract_values.json").write_text(json.dumps(rows, indent=1))
    print("bitmex cvs:", len(rows))


def extract_gate() -> None:
    # crypto-contract-value/src/exchanges/gate.rs: linear_swap (:47+) and
    # linear_future (:463+) offline maps; inverse is closed-form 1.0 (:528)
    b = blocks_with_pairs(REF / "crypto-contract-value/src/exchanges/gate.rs")
    data = {
        "linear_swap": b.get("linear_swap", {}),
        "linear_future": b.get("linear_future", {}),
    }
    (OUT / "gate_contract_values.json").write_text(json.dumps(data, indent=1))
    print("gate:", {k: len(v) for k, v in data.items()})


def extract_bitget() -> None:
    # crypto-contract-value/src/exchanges/bitget.rs:8-38
    # (LINEAR_SWAP_CONTRACT_VALUES static; single block so no let-scoping)
    text = (REF / "crypto-contract-value/src/exchanges/bitget.rs").read_text()
    data = {
        "linear_swap": {
            m.group(1): float(m.group(2).replace("_", ""))
            for m in PAIR_VAL_RE.finditer(text)
        }
    }
    (OUT / "bitget_contract_values.json").write_text(json.dumps(data, indent=1))
    print("bitget:", {k: len(v) for k, v in data.items()})


def extract_kucoin() -> None:
    # crypto-contract-value/src/exchanges/kucoin.rs:11-269
    # (LINEAR_CONTRACT_VALUES static; single `let mut` block)
    text = (REF / "crypto-contract-value/src/exchanges/kucoin.rs").read_text()
    data = {
        "linear_swap": {
            m.group(1): float(m.group(2).replace("_", ""))
            for m in PAIR_VAL_RE.finditer(text)
        }
    }
    (OUT / "kucoin_contract_values.json").write_text(json.dumps(data, indent=1))
    print("kucoin:", {k: len(v) for k, v in data.items()})


def extract_mexc() -> None:
    # crypto-contract-value/src/exchanges/mexc.rs:8-466
    # (LINEAR_CONTRACT_VALUES static; single `let mut` block)
    text = (REF / "crypto-contract-value/src/exchanges/mexc.rs").read_text()
    data = {
        "linear_swap": {
            m.group(1): float(m.group(2).replace("_", ""))
            for m in PAIR_VAL_RE.finditer(text)
        }
    }
    (OUT / "mexc_contract_values.json").write_text(json.dumps(data, indent=1))
    print("mexc:", {k: len(v) for k, v in data.items()})


ZBG_SPOT_RE = re.compile(r'\(\s*(\d+),\s*"([a-z0-9_]+)"\s*\)')
ZBG_SWAP_RE = re.compile(r'\(\s*(\d+),\s*"([A-Za-z0-9_-]+)",\s*([0-9_.eE+-]+)_f64\s*\)')


def extract_zbg() -> None:
    # spot numeric-id -> symbol map (crypto-msg-parser/src/exchanges/zbg/
    # zbg_spot.rs:16+) and swap (id -> symbol, contract_unit) map
    # (zbg_swap.rs:15-49)
    spot_text = (REF / "crypto-msg-parser/src/exchanges/zbg/zbg_spot.rs").read_text()
    swap_text = (REF / "crypto-msg-parser/src/exchanges/zbg/zbg_swap.rs").read_text()
    data = {
        "spot_symbols": {
            m.group(1): m.group(2) for m in ZBG_SPOT_RE.finditer(spot_text)
        },
        "swap_contracts": {
            m.group(1): [m.group(2), float(m.group(3).replace("_", ""))]
            for m in ZBG_SWAP_RE.finditer(swap_text)
        },
    }
    (OUT / "zbg_symbols.json").write_text(json.dumps(data, indent=1))
    print("zbg:", {k: len(v) for k, v in data.items()})


BFX_MAP_RE = re.compile(r'\("([A-Za-z0-9]+)",\s*"([^"]+)"\)')


def extract_bitfinex() -> None:
    # currency alias map (crypto-pair/src/exchanges/bitfinex.rs:6-70)
    text = (REF / "crypto-pair/src/exchanges/bitfinex.rs").read_text()
    block = text.split("static BITFINEX_MAPPING")[1].split("];")[0]
    data = {m.group(1): m.group(2) for m in BFX_MAP_RE.finditer(block)}
    (OUT / "bitfinex_currency_map.json").write_text(json.dumps(data, indent=1))
    print("bitfinex:", len(data))


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    extract_okx()
    extract_bitmex_ticks()
    extract_huobi()
    extract_kraken()
    extract_bybit()
    extract_bitmex_cvs()
    extract_gate()
    extract_bitget()
    extract_kucoin()
    extract_mexc()
    extract_zbg()
    extract_bitfinex()
