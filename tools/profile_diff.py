"""Diff two tools/profile_step.py JSONs to explain scaling anomalies.

Compares per-HLO-category device time *per image* between two profiles
(e.g. train batch 32 vs 64).  A category that scales linearly with batch
has equal us/image in both columns; the "Δ/img" column isolates exactly
where a larger batch loses (the VERDICT r3 batch-64 anomaly).

Usage: python tools/profile_diff.py tools/profile_b32.json tools/profile_b64.json
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    d = json.load(open(path))
    if "batch" not in d or "categories_us_per_step" not in d:
        raise SystemExit(f"{path}: not a profile_step.py output")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--top", type=int, default=25, help="top ops to list")
    args = ap.parse_args()

    pa, pb = load(args.a), load(args.b)
    ba, bb = pa["batch"], pb["batch"]
    print(
        f"# {args.a} (batch {ba}) vs {args.b} (batch {bb}) — "
        f"device us/IMAGE per category\n"
    )
    cats = sorted(
        set(pa["categories_us_per_step"]) | set(pb["categories_us_per_step"]),
        key=lambda c: -(pb["categories_us_per_step"].get(c, 0.0) / bb),
    )
    print(f"| category | b{ba} us/img | b{bb} us/img | Δ/img | Δ% |")
    print("|---|---|---|---|---|")
    tot_a = tot_b = 0.0
    for c in cats:
        ua = pa["categories_us_per_step"].get(c, 0.0) / ba
        ub = pb["categories_us_per_step"].get(c, 0.0) / bb
        tot_a += ua
        tot_b += ub
        if max(ua, ub) < 1.0:
            continue
        pct = f"{(ub / ua - 1) * 100:+.0f}%" if ua > 0 else "new"
        print(f"| {c} | {ua:.0f} | {ub:.0f} | {ub - ua:+.0f} | {pct} |")
    print(f"| **total** | {tot_a:.0f} | {tot_b:.0f} | {tot_b - tot_a:+.0f} | "
          f"{(tot_b / tot_a - 1) * 100:+.1f}% |")

    # Per-op view of the biggest per-image regressions, matched by category
    # + flops signature (op names like fusion.4184 are not stable across
    # compiles, so exact-name matching only works within one profile pair
    # when XLA happens to assign the same names).
    if "ops" in pa and "ops" in pb:
        common = set(pa["ops"]) & set(pb["ops"])
        if common:
            print(f"\n## ops present in both (by name), worst Δus/img first\n")
            rows = []
            for k in common:
                ua = pa["ops"][k]["us_per_step"] / ba
                ub = pb["ops"][k]["us_per_step"] / bb
                rows.append((ub - ua, k, ua, ub, pa["ops"][k]["category"]))
            rows.sort(reverse=True)
            print("| op | category | us/img Δ | b-a |")
            print("|---|---|---|---|")
            for d, k, ua, ub, cat in rows[: args.top]:
                print(f"| {k} | {cat} | {ua:.0f} → {ub:.0f} | {d:+.0f} |")


if __name__ == "__main__":
    main()
