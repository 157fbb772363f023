"""Index merge: combine several finished indexes into one.

The index-level analog of `vf utils merge-json` (reference:
src/commands/utils/merge-json.py:18-46 — concatenate per-shard detection
JSONs into one), and the standing answer to the reference's manual
sharding workflow (`--slice a b` CLI shards + merge, open.py:22-37):
build shards independently (e.g. one index per input partition / day /
source), then merge.

Because segments are immutable and self-contained (doc ids are
segment-local; global stats fold out of manifests), a merge is pure
metadata + file placement:

- each source segment is hard-linked (or copied) into the target under a
  fresh sequential segment id;
- global stats (N, total_len, avgdl) are summed from source manifests;
- global term df/cf re-merges the per-segment term tables (same salted-
  combiner groupby the build uses).

Constraint checked: identical analyzer + BM25 + block_size configs —
merging indexes with different tokenization would be semantically wrong
(same rule the reference applies implicitly by merging runs of the same
model config).
"""

from __future__ import annotations

import os
import shutil

import ray.data

from ..sources.readers import read_parquet as _read_parquet
from ..state.manifest import read_json, write_json


def snapshot_index(index_dir: str, dst_dir: str, *,
                   link: bool = True) -> dict:
    """Point-in-time snapshot of a finished index: recreate the
    directory tree with HARD LINKS for every file (zero data copied;
    falls back to copy when ``link=False`` or across filesystems).

    Isolation comes free from the engine's write discipline: segment
    files are immutable after the atomic build rename, and the only
    mutable sidecar (``deletes.parquet``) is swapped via write-tmp +
    ``os.replace`` (build.delete_docs) — a later delete in the source
    creates a NEW inode, leaving the snapshot's link pointing at the
    old one.  Serve the snapshot while rebuilding/deleting in the
    source (Lucene commit-point analog; reference analog: the prior-run
    JSON a new run re-opens read-only, media.py:79-111).
    """
    man_path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(man_path):
        raise ValueError(f"{index_dir!r} is not a finished index "
                         f"(no manifest.json)")
    if os.path.exists(dst_dir):
        raise ValueError(f"snapshot target {dst_dir!r} already exists")
    tmp = dst_dir + ".tmp-snapshot"
    shutil.rmtree(tmp, ignore_errors=True)
    n_files = 0
    for root, _dirs, files in os.walk(index_dir):
        rel = os.path.relpath(root, index_dir)
        out_root = os.path.join(tmp, rel) if rel != "." else tmp
        os.makedirs(out_root, exist_ok=True)
        for f in files:
            src = os.path.join(root, f)
            dst = os.path.join(out_root, f)
            if link:
                try:
                    os.link(src, dst)
                except OSError:          # cross-device: degrade to copy
                    shutil.copy2(src, dst)
            else:
                shutil.copy2(src, dst)
            n_files += 1
    os.rename(tmp, dst_dir)              # atomic publish
    man = read_json(man_path)
    return {"n_files": n_files,
            "n_segments": len(man["segments"]),
            "n_docs": man["stats"]["n_docs"]}


def merge_indexes(src_dirs: list[str], out_dir: str, *,
                  link: bool = True) -> dict:
    """Merge finished indexes at ``src_dirs`` into ``out_dir``."""
    if not src_dirs:
        raise ValueError("need at least one source index")
    cfgs = [read_json(os.path.join(d, "config.json")) for d in src_dirs]
    for c in cfgs[1:]:
        for key in ("analyzer", "bm25"):
            if c[key] != cfgs[0][key]:
                raise ValueError(f"cannot merge indexes with different "
                                 f"{key} configs")
        if c["index"]["block_size"] != cfgs[0]["index"]["block_size"]:
            raise ValueError("cannot merge indexes with different "
                             "block_size")

    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "global"), exist_ok=True)

    seg_names: list[str] = []
    n_docs = total_len = postings_bytes = 0
    new_id = 0
    term_files: list[str] = []
    for d in src_dirs:
        man = read_json(os.path.join(d, "manifest.json"))
        for seg in man["segments"]:
            src_seg = os.path.join(d, "segments", seg)
            name = f"seg-{new_id:05d}"
            dst_seg = os.path.join(out_dir, "segments", name)
            if os.path.exists(dst_seg):
                shutil.rmtree(dst_seg)
            if link:
                os.makedirs(dst_seg)
                for f in os.listdir(src_seg):
                    os.link(os.path.join(src_seg, f),
                            os.path.join(dst_seg, f))
            else:
                shutil.copytree(src_seg, dst_seg)
            m = read_json(os.path.join(dst_seg, "manifest.json"))
            m["segment"] = name
            m["segment_id"] = new_id
            m["merged_from"] = src_seg
            # manifest.json is a hard link to the source's file — replace
            # it with an independent copy before rewriting
            os.unlink(os.path.join(dst_seg, "manifest.json"))
            write_json(os.path.join(dst_seg, "manifest.json"), m)
            seg_names.append(name)
            n_docs += m["n_docs"]
            total_len += m["total_len"]
            postings_bytes += m["postings_bytes"]
            term_files.append(os.path.join(dst_seg, "terms.parquet"))
            new_id += 1

    # re-merge global term stats over all segments (same bucketed
    # reduce as build_index.term_stats_sum)
    from .build import term_stats_sum

    term_stats_sum(
        _read_parquet(term_files, columns=["term", "df", "cf"])
    ).write_parquet(os.path.join(out_dir, "global", "terms"))

    stats = {"n_docs": n_docs, "total_len": total_len,
             "avgdl": (total_len / n_docs) if n_docs else 0.0,
             "n_segments_built": len(seg_names),
             "postings_bytes": postings_bytes}
    write_json(os.path.join(out_dir, "global", "stats.json"), stats)
    write_json(os.path.join(out_dir, "config.json"), cfgs[0])
    write_json(os.path.join(out_dir, "manifest.json"),
               {"segments": sorted(seg_names), "stats": stats,
                "merged_from": [os.path.abspath(d) for d in src_dirs]})
    return stats
