"""Summarize a round A/B log (tools/ab_r4.log) into a markdown table.

The log is written by tools/ab_round4.sh as repeated blocks of
    === <tag> (<HH:MM:SSZ>)
    {"metric": ..., "value": N, "mfu": ..., ...}
Variants whose bench invocation died leave the tag line with no JSON line;
those are reported as FAILED rather than silently dropped.

Usage: python tools/ab_report.py [tools/ab_r4.log] [--base head_2pass_b32]
"""

from __future__ import annotations

import argparse
import json


def parse(path: str) -> dict[str, dict | None]:
    rows: dict[str, dict | None] = {}
    tag = None
    for line in open(path):
        line = line.strip()
        if line.startswith("=== "):
            if tag is not None and tag not in rows:
                rows[tag] = None  # previous tag produced no JSON line
            tag = line[4:].split(" (")[0]
            if tag == "done":
                tag = None
            continue
        if tag is not None and line.startswith("{"):
            try:
                rows[tag] = json.loads(line)
            except json.JSONDecodeError:
                rows[tag] = None
            tag = None
    if tag is not None and tag not in rows:
        rows[tag] = None
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="tools/ab_r4.log")
    ap.add_argument("--base", default="head_2pass_b32")
    args = ap.parse_args()

    rows = parse(args.log)
    base = rows.get(args.base)
    base_v = base["value"] if base else None

    print("| variant | img/s/chip | Δ vs base | MFU |")
    print("|---|---|---|---|")
    for tag, r in rows.items():
        if r is None:
            print(f"| {tag} | FAILED | — | — |")
            continue
        v = r.get("value")
        mfu = r.get("mfu")
        delta = (
            f"{(v / base_v - 1) * 100:+.1f}%" if base_v and tag != args.base else "—"
        )
        print(
            f"| {tag} | {v:.1f} | {delta} | "
            f"{f'{mfu * 100:.1f}%' if mfu is not None else '—'} |"
        )


if __name__ == "__main__":
    main()
