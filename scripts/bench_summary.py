"""Render the throughput source of truth: benchmarks/bench_history.jsonl.

Every successful `bench.py` run appends one timestamped row; docs quote
THIS derivation instead of hard-coding a number (VERDICT r4 item 7 —
round 4's README said 4.245 while the driver artifact said 3.452, because
the campaign was contending for the chip and the docs had no single
source of truth).

Headline = median of the most recent K uncontended TPU rows (rows whose
`chip_lock.contended` is false or absent-but-pre-lock; K=3). Contended
rows are listed but never enter the headline.

Usage: python scripts/bench_summary.py [--last 8] [--k 3]
"""

import argparse
import json
import os
import time

HISTORY = os.path.join(os.path.dirname(__file__), "..",
                       "benchmarks", "bench_history.jsonl")


def load_rows(path=HISTORY):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


# The one pre-lock row known (from campaign logs) to have been measured
# while the round-4 OOD sweep was mid-arm on the same chip — the very
# incident the lock exists to prevent. Identified by timestamp.
KNOWN_CONTENDED_TS = {1787104564}


def is_contended(row):
    """Pre-lock rows (round <=4) carry no chip_lock field; they are
    treated as uncontended only if nothing marked them otherwise — the
    two round-4 builder runs were verified idle-host by hand, and the
    one known-contended row is denylisted by timestamp above."""
    if int(row.get("ts", 0)) in KNOWN_CONTENDED_TS:
        return True
    lock = row.get("chip_lock")
    if lock is not None and (lock.get("contended") or
                             not lock.get("acquired", True)):
        return True
    return False


def headline(rows, k=3):
    tpu = [r for r in rows if r.get("backend") == "tpu"
           and not is_contended(r)]
    recent = sorted(tpu, key=lambda r: r.get("ts", 0))[-k:]
    if not recent:
        return None
    vals = sorted(r["value"] for r in recent)
    return {"steps_per_sec": vals[len(vals) // 2],
            "n": len(recent),
            "vs_baseline": recent[-1].get("vs_baseline"),
            "latest_ts": recent[-1].get("ts")}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--last", type=int, default=8)
    ap.add_argument("--k", type=int, default=3)
    opt = ap.parse_args(argv)
    rows = load_rows()

    print(f"{'when (UTC)':20} {'steps/s':>8} {'vs_base':>8} "
          f"{'backend':>8}  contention")
    for r in rows[-opt.last:]:
        when = time.strftime("%Y-%m-%d %H:%M", time.gmtime(r.get("ts", 0)))
        lock = r.get("chip_lock")
        note = ("pre-lock era" if lock is None else
                "CONTENDED" if is_contended(r) else
                f"clean (waited {lock['waited_s']}s)")
        print(f"{when:20} {r['value']:8.3f} {str(r.get('vs_baseline')):>8} "
              f"{r.get('backend', '?'):>8}  {note}")

    h = headline(rows, opt.k)
    print()
    if h:
        print(json.dumps({"headline_steps_per_sec": h["steps_per_sec"],
                          "median_of_last_n_uncontended_tpu": h["n"],
                          "vs_baseline_latest": h["vs_baseline"]}))
    else:
        print("no uncontended TPU rows yet")


if __name__ == "__main__":
    main()
