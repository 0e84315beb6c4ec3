"""Minimal versioned-table format: atomic manifest commits over
immutable parquet files + time-travel reads — the Iceberg-lite shape a
100-TB pipeline needs so a reader NEVER sees a half-written table and a
bad load can be rolled back by pointing at the previous version.

Layout: <table_dir>/manifest-v<N>.json, each listing the IMMUTABLE
parquet files that make up version N (append mode unions the parent's
files; overwrite starts fresh). Commits are optimistic: the manifest is
created with O_EXCL, so two concurrent committers race on the version
number and the loser retries against the new parent — no coordinator,
no locks, safe on any POSIX filesystem. Data files are never rewritten
or deleted by a commit, so every historical version stays readable
until an explicit vacuum.

The reference system has no table format (single-document tool); this
exists for the corpus-scale output-management path next to
``state/checkpoint.py``'s per-shard lineage."""

from __future__ import annotations

import json
import os

import ray.data

_PREFIX = "manifest-v"


def _versions(table_dir: str) -> list[int]:
    try:
        names = os.listdir(table_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith(_PREFIX) and n.endswith(".json"):
            try:
                out.append(int(n[len(_PREFIX):-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    vs = _versions(table_dir)
    return vs[-1] if vs else None


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"{_PREFIX}{version}.json")


def commit_version(
    table_dir: str,
    files: list[str],
    mode: str = "append",
    max_retries: int = 16,
) -> int:
    """Commit ``files`` (immutable parquet paths) as a new table
    version. ``append`` unions the current latest version's files;
    ``overwrite`` replaces the file set. Returns the committed version
    number. Optimistic concurrency: O_EXCL manifest creation — a racing
    committer retries against the winner's version."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    os.makedirs(table_dir, exist_ok=True)
    for _ in range(max_retries):
        parent = latest_version(table_dir)
        version = 1 if parent is None else parent + 1
        if mode == "append" and parent is not None:
            with open(_manifest_path(table_dir, parent)) as fh:
                base = json.load(fh)["files"]
        else:
            base = []
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "files": base + [f for f in files if f not in base],
        }
        try:
            fd = os.open(
                _manifest_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue  # lost the race — re-resolve the parent and retry
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
        return version
    raise RuntimeError(
        f"commit contention: {max_retries} losing races in {table_dir}"
    )


def read_version(
    table_dir: str, version: int | None = None
) -> ray.data.Dataset:
    """Dataset over exactly the files of ``version`` (latest when
    None) — a time-travel read; concurrent commits never change what
    this scan sees because data files are immutable."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no manifests in {table_dir}")
    with open(_manifest_path(table_dir, version)) as fh:
        manifest = json.load(fh)
    return ray.data.read_parquet(manifest["files"])
