"""Versioned snapshot table: Delta-lite time travel on plain Parquet.

Reference parity: the reference persists each monthly ingest by
OVERWRITING its corpus JSONL + DB rows in place
(knowledge_model/ingestion/pipeline.py:178-205) — a bad write destroys
the previous state and "what did the corpus look like before March's
ingest?" is unanswerable.  This sink gives every write an immutable
version directory plus a manifest, so reads can time-travel and a bad
ingest is a one-line rollback, without requiring a table format the
container doesn't ship (Delta/Iceberg/Hudi — the public systems this
mirrors; swap in `format("delta")` when available).

Layout:
    base/
      _manifest.json          {"latest": 3, "versions": {"1": {...}, ...}}
      v=1/part-*.parquet      immutable snapshot files
      v=2/...

Write protocol (same two-phase shape as the quarantine TSV writer):
executors write the new version's files under a staging dir; the
driver renames staging -> v=<n> and only THEN rewrites the manifest.
A crash before the manifest flip leaves the table at the old version —
readers never observe a half-written snapshot.  At 100 TB the rename
and manifest flip are O(1) metadata operations; snapshot data is
written exactly once, partition-parallel.

Time travel composes with the CDC operators: diff_versions() feeds two
snapshots through cdc_snapshot_diff, giving the minimal I/U/D changelog
between any two table versions.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _read_manifest(base: str) -> dict:
    path = os.path.join(base, _MANIFEST)
    if not os.path.exists(path):
        return {"latest": 0, "versions": {}}
    with open(path) as fh:
        return json.load(fh)


def _write_manifest(base: str, manifest: dict) -> None:
    # write-then-rename so a concurrent reader sees old or new, never torn
    tmp = os.path.join(base, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(base, _MANIFEST))


def write_snapshot(df: DataFrame, base: str, note: str = "") -> int:
    """Write df as the next immutable version; returns the version id."""
    os.makedirs(base, exist_ok=True)
    manifest = _read_manifest(base)
    version = manifest["latest"] + 1
    staging = os.path.join(base, f"_staging_v{version}")
    final = os.path.join(base, f"v={version}")
    if os.path.exists(staging):
        shutil.rmtree(staging)  # leftover from a crashed attempt
    if os.path.exists(final):
        # a crash BETWEEN the staging rename and the manifest flip
        # leaves v=<n> on disk but unreferenced (the manifest still says
        # latest = n-1, so no reader ever saw it); without this sweep
        # the retry's os.replace would fail with ENOTEMPTY — rename(2)
        # cannot clobber a non-empty directory
        shutil.rmtree(final)
    df.write.mode("overwrite").parquet(staging)
    os.replace(staging, final)
    n_rows = df.sparkSession.read.parquet(final).count()
    manifest["versions"][str(version)] = {"note": note, "rows": n_rows}
    manifest["latest"] = version
    _write_manifest(base, manifest)
    return version


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (default: latest per the manifest)."""
    manifest = _read_manifest(base)
    v = manifest["latest"] if version is None else version
    if v < 1 or str(v) not in manifest["versions"]:
        raise ValueError(f"version {v} not in manifest (latest={manifest['latest']})")
    return spark.read.parquet(os.path.join(base, f"v={v}"))


def list_versions(base: str) -> dict:
    return _read_manifest(base)


def diff_versions(
    spark: SparkSession, base: str, v_old: int, v_new: int, key: list[str]
) -> DataFrame:
    """Minimal I/U/D changelog between two snapshots (CDC composition)."""
    from knowledge_model_spark.operators.cdc import cdc_snapshot_diff

    return cdc_snapshot_diff(
        read_snapshot(spark, base, v_old), read_snapshot(spark, base, v_new), key
    )


def rollback(spark: SparkSession, base: str, to_version: int) -> int:
    """Restore an old snapshot by writing it as a NEW version.

    History stays append-only (the bad version remains inspectable);
    the manifest note records the provenance.
    """
    df = read_snapshot(spark, base, to_version)
    return write_snapshot(df, base, note=f"rollback to v{to_version}")


def vacuum(base: str, keep_last: int = 2) -> list[int]:
    """Delete snapshot directories older than the newest ``keep_last``
    versions — the retention pass every versioned table needs once time
    travel exists (storage is 1 copy per version until vacuumed).

    Returns the removed version ids.  The manifest is rewritten FIRST
    (dropping the vacuumed entries) and directories deleted after: a
    crash between the two leaves unreferenced dirs (harmless garbage, a
    later vacuum re-deletes them) rather than referenced-but-missing
    versions.  To make that re-delete true, the doomed set is computed
    from the FILESYSTEM (every on-disk v=k with k <= cutoff), not from
    the manifest — a crashed vacuum's orphans are no longer in the
    manifest, so a manifest-driven sweep would leak them forever.
    Time travel to a vacuumed version fails with the same
    manifest error as a never-written one; rollback targets must
    therefore be within the retention window — rollback() itself copies
    data forward, so a completed rollback never depends on old dirs.
    """
    import re

    manifest = _read_manifest(base)
    cutoff = manifest["latest"] - keep_last
    on_disk = [
        int(m.group(1))
        for d in os.listdir(base)
        if (m := re.fullmatch(r"v=(\d+)", d))
    ]
    doomed = sorted(v for v in on_disk if v <= cutoff)
    if not doomed:
        return []
    changed = False
    for v in doomed:
        if str(v) in manifest["versions"]:
            del manifest["versions"][str(v)]
            changed = True
    if changed:
        _write_manifest(base, manifest)
    for v in doomed:
        path = os.path.join(base, f"v={v}")
        if os.path.exists(path):
            shutil.rmtree(path)
    return doomed
