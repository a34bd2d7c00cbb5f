"""Object-store (s3a://) path + committer configuration helper.

The reference uploads files to S3 one boto3 call at a time after writing
locally (knowledge_model/ingestion/upload_s3.py:62-156, key layout
``{prefix}/YYYY/MM/{name}``). The Spark-native form is to WRITE the
table to ``s3a://`` directly — no separate upload step — but a naive
``df.write.parquet("s3a://...")`` ships with two production landmines
this module exists to prevent:

- **rename-based commit**: the default FileOutputCommitter "commits" by
  renaming, which on an object store is a full copy+delete per file —
  O(data) commit time and a non-atomic window where readers see partial
  output. The S3A committers (magic / directory staging, Hadoop 3.1+)
  commit via multipart-upload completion: O(files) metadata calls,
  task-level atomicity.
- **driver-side misconfig discovered at minute 59**: committer conf is
  session-level (``spark.hadoop.*``) and silently defaults to rename;
  building the conf through one validated helper makes the wrong state
  unrepresentable.

No object-store endpoint exists in the test container, so
``s3a_session_confs`` / ``s3a_path`` are pure functions unit-tested
directly (same seam style as sources/jdbc.py); they emit exactly the
keys a real cluster session would set.
"""

from __future__ import annotations

_COMMITTERS = ("magic", "directory", "partitioned")


def s3a_path(bucket: str, *key_parts: str | int) -> str:
    """``s3a://bucket/part/part/...`` with the reference's year/month
    layout expressible as ``s3a_path(b, prefix, year, month, name)``
    (upload_s3.py:125-131). Rejects empty parts and accidental
    scheme-bearing buckets."""
    if not bucket or "/" in bucket or "://" in bucket:
        raise ValueError(f"bucket must be a bare bucket name, got {bucket!r}")
    parts = [str(p).strip("/") for p in key_parts]
    if any(not p for p in parts):
        raise ValueError(f"empty path segment in {key_parts!r}")
    return "s3a://" + "/".join([bucket, *parts])


def s3a_session_confs(
    *,
    committer: str = "magic",
    upload_part_mb: int = 64,
    fast_upload_buffer: str = "disk",
    max_connections: int = 96,
    endpoint: str | None = None,
    path_style_access: bool = False,
) -> dict[str, str]:
    """Session confs (``key -> value``, all ``spark.hadoop.*``-prefixed
    where Hadoop-scoped) for a correct, atomic-commit s3a write path.

    ``committer``: 'magic' (in-place multipart, needs S3Guard-free
    consistent listing — standard S3 since 2020), 'directory' (staging
    on cluster FS, safest default for mixed writers), or 'partitioned'
    (staging, per-partition conflict resolution — the one to use with
    dynamic partition overwrite of hive layouts).
    """
    if committer not in _COMMITTERS:
        raise ValueError(
            f"committer must be one of {_COMMITTERS}, got {committer!r}"
        )
    if upload_part_mb < 5:  # S3 multipart minimum part size
        raise ValueError("upload_part_mb must be >= 5 (S3 multipart floor)")
    h = "spark.hadoop."
    confs: dict[str, str] = {
        # route parquet/ORC commit protocol through the S3A committers
        h + "mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        h + "fs.s3a.committer.name": committer,
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        # upload tuning: stream parts from disk, bounded connection pool
        h + "fs.s3a.fast.upload.buffer": fast_upload_buffer,
        h + "fs.s3a.multipart.size": f"{upload_part_mb}M",
        h + "fs.s3a.connection.maximum": str(max_connections),
        # directory marker retention avoids O(depth) DELETEs per write
        h + "fs.s3a.directory.marker.retention": "keep",
    }
    if committer in ("directory", "partitioned"):
        confs[h + "fs.s3a.committer.staging.conflict-mode"] = (
            "replace" if committer == "directory" else "append"
        )
    if endpoint is not None:
        confs[h + "fs.s3a.endpoint"] = endpoint
    if path_style_access:
        confs[h + "fs.s3a.path.style.access"] = "true"
    return confs
