"""Physical-plan fingerprinting shared by the lint test and the
manifest generator (r10 verdict item 3).

The r10 Matryoshka SMJ fall-through was caught by a HAND `.explain`
sweep; this mechanizes it.  A fingerprint is the count of each
strategy-bearing node name in the executed-plan text — join
strategies, exchange kinds, WindowGroupLimit — the features a
Catalyst upgrade or a refactor can silently flip.  Counting node
NAMES (not arguments) keeps the fingerprint immune to cosmetic churn:
expression ids, statistics, column order, and AQE's isFinalPlan flag
all change without touching it.

``tests/plan_manifest.json`` is the checked-in expectation, seeded
from the r11 all-green plans.  ``test_plan_lint`` fails on any diff;
an INTENTIONAL strategy change is recorded by re-running
``python tests/gen_plan_manifest.py`` and committing the diff — the
review happens in the commit, never silently.
"""

from __future__ import annotations

import json
import os

# Node names whose count changing means the physical STRATEGY changed.
# "Exchange hashpartitioning"/"SinglePartition"/"rangepartitioning"
# prefixes match the shuffle kinds; BroadcastExchange is implied by the
# broadcast join counts and skipped to avoid double-charging reused
# exchanges.
FEATURES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "WindowGroupLimit",
)

MANIFEST_PATH = os.path.join(os.path.dirname(__file__), "plan_manifest.json")


def fingerprint(plan: str) -> dict[str, int]:
    """Nonzero feature counts of an executedPlan().toString() text."""
    out = {}
    for f in FEATURES:
        n = plan.count(f)
        if n:
            out[f] = n
    return out


def load_manifest() -> dict[str, dict[str, int]]:
    if not os.path.exists(MANIFEST_PATH):
        return {}
    with open(MANIFEST_PATH) as fh:
        return json.load(fh)


def save_manifest(m: dict[str, dict[str, int]]) -> None:
    with open(MANIFEST_PATH, "w") as fh:
        json.dump(dict(sorted(m.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
