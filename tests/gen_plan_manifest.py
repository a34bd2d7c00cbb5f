"""Regenerate tests/plan_manifest.json from the current registry.

Run after an INTENTIONAL physical-strategy change and commit the diff:

    python tests/gen_plan_manifest.py            # full regeneration
    python tests/gen_plan_manifest.py q1 q2 ...  # update named queries

The diff IS the review artifact — a join falling from BroadcastHashJoin
to SortMergeJoin shows up as a one-line change the committer must own.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledge_model_spark.plans import load_registry  # noqa: E402
from knowledge_model_spark.session import get_spark  # noqa: E402

from tests.plan_fingerprint import (  # noqa: E402
    fingerprint,
    load_manifest,
    save_manifest,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main(names: list[str]) -> None:
    spark = get_spark("kms-plan-manifest", cpus=8)
    registry = load_registry()
    manifest = load_manifest() if names else {}
    targets = names or sorted(registry)
    for i, name in enumerate(targets, 1):
        df = registry[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        manifest[name] = fingerprint(plan)
        print(f"[{i}/{len(targets)}] {name}: {manifest[name]}", flush=True)
    # drop entries for queries no longer registered
    manifest = {k: v for k, v in manifest.items() if k in registry}
    save_manifest(manifest)
    print(f"wrote {len(manifest)} fingerprints")


if __name__ == "__main__":
    main(sys.argv[1:])
