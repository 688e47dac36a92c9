"""Summarize ood_method_comparison JSONL checkpoints into markdown tables.

Usage: python scripts/ood_table.py benchmarks/ood_multiseed_r4.jsonl [...]

Groups rows by (steps, batch, hw, style_group_size) workload, then prints
one mean+/-std-over-seeds markdown table per workload (the format used in
docs/VALIDATION.md). Pure numpy — safe to run anywhere, no jax import.
"""

import json
import sys
from collections import defaultdict

import numpy as np

# canonical column order; files with other eval domains (e.g. the round-5
# gamma probe's gamma1.5/gamma3.0/gamma_raw) fall back to their rows' own
# key order
DOMAINS = ["iid", "gamma", "bias", "ghosting", "spike"]


def _domains_for(methods):
    """Column set for one workload: canonical if it matches, else the
    union of the rows' dice keys in first-seen order."""
    seen = []
    for per_seed in methods.values():
        for dice in per_seed.values():
            for k in dice:
                if k not in seen:
                    seen.append(k)
    return DOMAINS if set(seen) == set(DOMAINS) else seen


def load(paths):
    groups = defaultdict(lambda: defaultdict(dict))  # wl -> method -> seed
    for path in paths:
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                wl = (r["steps"], r["batch"], r["hw"],
                      r.get("style_group_size"))
                groups[wl][r["method"]][r["seed"]] = r["dice"]
    return groups


def cell(vals):
    if len(vals) > 1:
        return f"{np.mean(vals):.3f}±{np.std(vals):.3f}"
    return f"{np.mean(vals):.4f}"


def main(paths):
    # style_group_size is None for ungrouped arms; map it to -1 for the
    # sort so a file mixing grouped and ungrouped workloads (the b80
    # fidelity sweep) doesn't raise int-vs-None TypeError.
    for wl, methods in sorted(load(paths).items(),
                              key=lambda kv: kv[0][:3] + (
                                  -1 if kv[0][3] is None else kv[0][3],)):
        steps, batch, hw, group = wl
        domains = _domains_for(methods)
        print(f"\n### steps={steps} batch={batch} hw={hw} "
              f"style_group_size={group}")
        print("| method | seeds | " + " | ".join(domains) + " | OOD avg |")
        print("|---|---|" + "---|" * (len(domains) + 1))
        for method, per_seed in methods.items():
            seeds = sorted(per_seed)
            cells = [cell([per_seed[s][d] for s in seeds]) for d in domains]
            ood = cell([np.mean([per_seed[s][d] for d in domains
                                 if d != "iid"]) for s in seeds])
            print(f"| {method} | {','.join(map(str, seeds))} | "
                  + " | ".join(cells) + f" | **{ood}** |")


if __name__ == "__main__":
    main(sys.argv[1:] or ["benchmarks/ood_cpu_micro_r4.jsonl"])
