"""Versioned snapshot log over plain parquet — time travel, rollback,
and vacuum without a table format (SURVEY.md §2 L2 family, alongside
``maintenance.merge_into``).

The mechanism is the one Delta/Iceberg build on: data files are
immutable, and a tiny JSON manifest per commit lists exactly the files
that make up that version. Readers resolve a manifest and scan ONLY its
files; writers add files and a new manifest, never mutating old ones —
so every historical version stays readable (time travel) until a
vacuum explicitly drops files no retained manifest references.

Layout:

    <table>/_snapshots/v00000001.json   one manifest per committed version
    <table>/data/v00000001/part-*.parquet   immutable data files

Manifests are written via temp-file + atomic rename, and the committed
version is the MAX manifest present — a crashed writer leaves either no
manifest (invisible partial data, cleaned by vacuum) or a complete one.
Concurrency: the rename makes a duplicate-version race visible (the
second rename overwrites); a real multi-writer deployment would front
this with a lock service or conditional-put object store, which is
exactly what Delta's commit protocol does — out of scope here, noted
per the single-writer contract of this repo's sinks.

Reference parity: the reference keeps one mutable MySQL table with no
history (`/root/reference/etl.py:110-156`); the snapshot log is what a
lake needs instead — reproducible reads ("train on v7") and instant
rollback from a bad load.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _SNAP_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


def _list_versions(path: str) -> list[int]:
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _write_manifest(path: str, manifest: dict) -> None:
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    os.rename(tmp, _manifest_path(path, manifest["version"]))


def snapshot_commit(
    spark: SparkSession, path: str, df: DataFrame, mode: str = "append"
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version.

    ``mode="append"`` adds the new files to the parent version's file
    list; ``mode="overwrite"`` starts the list fresh. Either way, no
    existing file is touched — history stays readable.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = _list_versions(path)
    version = (versions[-1] + 1) if versions else 1
    data_sub = os.path.join(_DATA_DIR, f"v{version:08d}")
    df.write.mode("overwrite").parquet(os.path.join(path, data_sub))
    new_files = sorted(
        os.path.join(data_sub, f)
        for f in os.listdir(os.path.join(path, data_sub))
        if f.endswith(".parquet") or f.startswith("part-")
    )
    new_files = [f for f in new_files if not f.endswith(".crc")]
    files = list(new_files)
    if mode == "append" and versions:
        files = _read_manifest(path, versions[-1])["files"] + files
    _write_manifest(
        path,
        {
            "version": version,
            "parent": versions[-1] if versions else None,
            "mode": mode,
            "files": files,
        },
    )
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot — the latest by default, or any retained
    historical ``version`` (time travel). Scans exactly the manifest's
    files, so a version's result never changes after commit."""
    versions = _list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    manifest = _read_manifest(path, v)
    if not manifest["files"]:
        raise ValueError(
            f"version {v} has no data files (empty commit) — schema-less "
            "empty snapshots are not representable without a stored schema"
        )
    return spark.read.parquet(
        *[os.path.join(path, f) for f in manifest["files"]]
    )


def snapshot_history(path: str) -> list[dict]:
    """All manifests, oldest first (version/parent/mode/file count)."""
    out = []
    for v in _list_versions(path):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "mode": m["mode"],
                "n_files": len(m["files"]),
            }
        )
    return out


def rollback(spark: SparkSession, path: str, version: int) -> int:
    """Restore the table to ``version`` by committing a NEW version
    whose file list is the old one (Delta RESTORE semantics): history
    including the bad commits is preserved, readers see the restored
    data, and no file is rewritten. Returns the new version."""
    versions = _list_versions(path)
    if version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    old = _read_manifest(path, version)
    new_version = versions[-1] + 1
    _write_manifest(
        path,
        {
            "version": new_version,
            "parent": versions[-1],
            "mode": f"rollback:{version}",
            "files": old["files"],
        },
    )
    return new_version


def vacuum(spark: SparkSession, path: str, keep_last: int = 1) -> int:
    """Drop data files referenced ONLY by manifests older than the last
    ``keep_last`` versions (and those orphaned by crashed commits).
    Returns the number of files deleted. Time travel remains valid for
    the retained versions; older manifests are removed."""
    versions = _list_versions(path)
    if not versions:
        return 0
    keep_versions = versions[-keep_last:]
    keep_files = set()
    for v in keep_versions:
        keep_files.update(_read_manifest(path, v)["files"])
    removed = 0
    data_root = os.path.join(path, _DATA_DIR)
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path)
            if rel not in keep_files and (
                f.endswith(".parquet") or f.startswith("part-")
            ):
                os.remove(full)
                removed += 1
    for v in versions[:-keep_last]:
        os.remove(_manifest_path(path, v))
    return removed
