"""Cluster-addressable storage roots (VERDICT r3 "what's wrong" #2).

Single-node runs default to fast node-local ``/tmp``.  On a multi-node
cluster that default is WRONG for anything one task writes and another
task re-reads: the reader may land on a different node.  Two knobs fix
this without touching call sites:

``VFRAME_RAY_SCRATCH``
    Root for transient exchange data (e.g. the chunk files of
    :func:`vframe_ray.stages.similarity.cosine_dup_pairs`).  Accepts a
    plain path on a shared filesystem (NFS/Lustre mount present on every
    node) or an fsspec/pyarrow URI (``s3://bucket/prefix``) — scratch
    producers/consumers go through ``ray.data.write_parquet`` /
    ``pyarrow.parquet.read_table``, both URI-capable.

``VFRAME_RAY_CACHE``
    Root for reusable index caches (``pipelines/flagship.py``).  Index
    segments are written/read with local file APIs, so this must be a
    *filesystem path* visible on every node (shared mount), not an
    object-store URI.

Defaults keep the current single-node behavior byte-identical.
"""

from __future__ import annotations

import os
import posixpath


def is_uri(path: str) -> bool:
    return "://" in path


def join(root: str, *parts: str) -> str:
    """Path join that keeps URI roots valid (no backslash/normpath)."""
    if is_uri(root):
        return posixpath.join(root, *parts)
    return os.path.join(root, *parts)


def scratch_root() -> str:
    return os.environ.get("VFRAME_RAY_SCRATCH", "/tmp/vframe_ray_scratch")


def cache_root() -> str:
    return os.environ.get("VFRAME_RAY_CACHE", "/tmp/vframe_ray_cache")


def filesystem_for(path: str):
    """Resolve ``path`` to (pyarrow FileSystem, path-within-fs)."""
    from pyarrow import fs as pafs

    if is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def list_dir_names(path: str) -> list[str]:
    """Base names of entries directly under ``path`` (URI-capable)."""
    from pyarrow import fs as pafs

    fsys, p = filesystem_for(path)
    infos = fsys.get_file_info(pafs.FileSelector(p, allow_not_found=True))
    return [posixpath.basename(i.path.rstrip("/")) for i in infos]


def remove_tree(path: str) -> None:
    """Best-effort recursive delete (URI-capable)."""
    fsys, p = filesystem_for(path)
    try:
        fsys.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass
