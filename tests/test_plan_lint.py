"""Registry-wide physical-plan lint — the machine-enforced version of
the scale review that previously happened by hand.

The r3 verdict found three single-partition global windows by reading
plans; r4 fixed them and guarded those three queries individually
(test_plan_shapes.py:462). This sweep makes the guard UNIVERSAL so no
future registry entry can reintroduce the classic 100 TB killers:

1. ``CartesianProduct`` — an all-pairs join; corpus² rows at scale.
   (Broadcast nested-loop over a tiny broadcast side is a different
   node and is allowed where intentional: ann_bruteforce's
   query-batch × corpus scan.)
2. ``BatchEvalPython`` — a row-at-a-time Python UDF on the hot path;
   10-100× slower than Arrow/pandas batches. ``BatchEvalPythonUDTF``
   is matched separately: the one registered UDTF is the declared
   Spark-4 API-surface demo (the posexplode form is the hot path).
3. An ``Exchange SinglePartition`` whose input is NOT provably bounded
   (an Aggregate — one row per upstream partition/group — or a
   LocalLimit/TakeOrderedAndProject). A single-partition exchange over
   raw rows serializes the corpus through one task; AQE cannot split
   it.

Queries on the whitelist are documented exceptions, each with the
reason reviewed in a verdict round. Adding a query to the whitelist
requires the same justification — the test fails loudly otherwise.
"""

from __future__ import annotations

import re

import pytest

from knowledge_model_spark.plans import load_registry

from tests.conftest import SF_DIR
from tests.plan_fingerprint import fingerprint, load_manifest

REGISTRY = load_registry()
PLAN_MANIFEST = load_manifest()

# query -> (rule, reason). Reviewed exceptions only.
WHITELIST: dict[str, tuple[str, str]] = {
    "udtf_sentence_split": (
        "row_udtf",
        "the registered Spark 4 Python-UDTF API demo (SURVEY §2.10); "
        "the production path is the posexplode/pandas chunker — "
        "documented at functions/udtf.py",
    ),
    "window_ntile_percent_rank": (
        "single_partition",
        "ntile/percent_rank over an unpartitioned window is "
        "single-partition BY SQL SEMANTICS; kept as the API demo with "
        "the production decomposition documented at "
        "plans/relational_queries.py:579 (r4 verdict: acceptable)",
    ),
}

_AGGS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_BOUNDED = _AGGS + ("LocalLimit", "TakeOrderedAndProject")
# WindowGroupLimit (the node Spark 4 inserts under a rank<=k filter)
# bounds its output to k rows PER GROUP; global boundedness
# additionally needs a bounded GROUP COUNT.  r6 accepted the node
# unconditionally; r7 (verdict item 7) tightens it: the node counts as
# bounding only when its OWN subtree contains a genuine bounding
# operator (an aggregate or limit — the node that caps how many groups
# can exist, e.g. retrieval_hybrid_weighted's per-label
# ObjectHashAggregate on the query side of its top-k shortlist).  A
# WindowGroupLimit keyed directly on raw scan columns with no
# aggregate anywhere below is per-group-bounded but globally unbounded
# and now fails the lint, requiring an explicit whitelist entry.
# single-child operators that preserve (never multiply) row counts, so
# boundedness looks through them.  Window is row-preserving — it adds
# COLUMNS over the same rows; the single-partition hazard of an
# unpartitioned window is the Exchange above it, which is the very node
# being linted, so skipping Window here loses nothing.
_PASSTHROUGH = (
    "Project",
    "Filter",
    "ColumnarToRow",
    "InputAdapter",
    "Coalesce",
    "AQEShuffleRead",
    "WholeStageCodegen",
    "Window [",  # not WindowGroupLimit — that is a _BOUNDED node
)


def _indent(line: str) -> int:
    for k, ch in enumerate(line):
        if ch.isalpha():
            return k
    return len(line)


def _single_partition_violations(plan: str) -> list[str]:
    """Every ``Exchange SinglePartition`` must consume a bounded
    subtree: walk its children (indentation-delimited), skipping
    row-preserving passthroughs, until a bounding operator or a
    substantive non-bounding one."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        base = _indent(ln)
        verdict = None
        for j in range(i + 1, len(lines)):
            nxt = lines[j]
            if _indent(nxt) <= base:
                break  # left the Exchange's subtree
            if any(b in nxt for b in _BOUNDED):
                verdict = "ok"
                break
            if "WindowGroupLimit" in nxt:
                # bounded per group; globally bounded only if the group
                # count is — require a bounding node in ITS subtree
                wbase = _indent(nxt)
                verdict = "WindowGroupLimit with unbounded group count"
                for sub in lines[j + 1 :]:
                    if _indent(sub) <= wbase:
                        break  # left the WindowGroupLimit's subtree
                    if any(b in sub for b in _BOUNDED):
                        verdict = "ok"
                        break
                break
            if any(p in nxt for p in _PASSTHROUGH):
                continue
            verdict = nxt.strip()[:90]
            break
        if verdict != "ok":
            out.append(f"line {i}: feeds from [{verdict}]")
    return out


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_lint(spark, name):
    # a DataFrame cached by an EARLIER test swaps InMemoryTableScan in
    # for the scan+Exchange it covers (CacheManager matches canonical
    # subplans), silently changing this query's fingerprint — clear so
    # the lint always sees the cold plan the manifest was seeded from
    spark.catalog.clearCache()
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rule, _reason = WHITELIST.get(name, (None, None))

    assert "CartesianProduct" not in plan, f"{name}: all-pairs join"

    if rule != "row_udtf":
        # \b: BatchEvalPythonUDTF is a distinct node (see WHITELIST)
        assert not re.search(r"BatchEvalPython\b", plan), (
            f"{name}: row-at-a-time Python UDF on the hot path"
        )
        assert "BatchEvalPythonUDTF" not in plan, (
            f"{name}: unreviewed Python UDTF"
        )

    if rule != "single_partition":
        viol = _single_partition_violations(plan)
        assert not viol, (
            f"{name}: Exchange SinglePartition over unbounded input "
            f"(serializes the corpus through one task at scale): {viol}"
        )

    # plan-fingerprint regression (r10 verdict item 3): the physical
    # strategy — join algorithms, shuffle kinds, WindowGroupLimit —
    # must match the checked-in manifest.  A silent flip (Catalyst
    # upgrade, refactor losing a broadcast hint) fails HERE instead of
    # surfacing as a bench regression three rounds later.  Intentional
    # changes: python tests/gen_plan_manifest.py <query> and commit.
    got = fingerprint(plan)
    want = PLAN_MANIFEST.get(name)
    assert want is not None, (
        f"{name}: no plan-manifest entry — seed it with "
        f"`python tests/gen_plan_manifest.py {name}` and commit "
        f"tests/plan_manifest.json (current fingerprint: {got})"
    )
    assert got == want, (
        f"{name}: physical-plan fingerprint drifted from the manifest.\n"
        f"  manifest: {want}\n  current:  {got}\n"
        f"If intentional, regenerate with "
        f"`python tests/gen_plan_manifest.py {name}` and commit the diff."
    )


def test_window_group_limit_rule_requires_bounded_group_count():
    """The r7 tightening (verdict item 7): a WindowGroupLimit whose own
    subtree contains no aggregate/limit is per-group-bounded but
    globally unbounded — the lint must flag it; one with an aggregate
    below (the group-count bound) passes.  Exercised on synthetic plan
    text so the rule itself is pinned, not just its effect on today's
    registry."""
    unbounded = "\n".join([
        "Sort [x ASC]",
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- WindowGroupLimit [k], [s DESC], row_number(), 20, Final",
        "      +- Sort [k ASC, s DESC], false, 0",
        "         +- FileScan parquet [k,s]",
    ])
    viol = _single_partition_violations(unbounded)
    assert viol and "unbounded group count" in viol[0]

    bounded = "\n".join([
        "Sort [x ASC]",
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        "   +- WindowGroupLimit [k], [s DESC], row_number(), 20, Final",
        "      +- Sort [k ASC, s DESC], false, 0",
        "         +- HashAggregate(keys=[k], functions=[max(s)])",
        "            +- FileScan parquet [k,s]",
    ])
    assert not _single_partition_violations(bounded)

    # a bounding node AFTER the subtree (sibling branch) must not count
    escaped = "\n".join([
        "Union",
        ":- Exchange SinglePartition, ENSURE_REQUIREMENTS",
        ":  +- WindowGroupLimit [k], [s DESC], row_number(), 20, Final",
        ":     +- FileScan parquet [k,s]",
        "+- HashAggregate(keys=[k], functions=[max(s)])",
        "   +- FileScan parquet [k,s]",
    ])
    viol2 = _single_partition_violations(escaped)
    assert viol2 and "unbounded group count" in viol2[0]


def test_correctness_window_is_oracled_only_and_priority_is_exact():
    """The driver certifies EXACTLY the first 50 registry entries, so
    (a) a rows-only query in the window burns a slot on a weak row —
    the window must stay oracled-only (r9 verdict), and (b) every
    _GATE_PRIORITY name must actually exist in the registry: the
    ordering loop silently skips unknown names, so a typo would
    silently reshuffle the certification window."""
    from knowledge_model_spark.plans import _GATE_PRIORITY

    window = list(REGISTRY)[:50]
    rows_only = [n for n in window if REGISTRY[n].oracle is None]
    assert rows_only == [], f"rows-only queries burning window slots: {rows_only}"
    unknown = [n for n in _GATE_PRIORITY if n not in REGISTRY]
    assert unknown == [], f"priority names not in registry: {unknown}"
    dupes = {n for n in _GATE_PRIORITY if _GATE_PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate priority names: {dupes}"
    # every registered query is reachable: priority ∪ fallback == registry
    assert len(REGISTRY) >= len(set(_GATE_PRIORITY))
