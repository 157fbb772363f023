"""Segment compaction: merge many small segments into few big ones.

Build wants MANY segments (bounded per-builder memory, wide shuffle
fan-out); serving wants FEW (per-segment fixed cost — postings read,
dense score array, top-k heap — is paid per query per segment).  This
is the classic Lucene-style background merge, recast as a one-shot
Ray Data pass over groups of source segments (reference analog: the
shard-merge workflow of `utils merge-json`, merge-json.py:18-46, one
level deeper: postings are re-encoded, not just relabeled).

Correctness contract (tested rank-identical in tests/test_compact.py):

- the merged docmap is re-sorted by (conv_id, turn_idx) and doc_locals
  renumbered, so within-segment doc order == global tie-break order —
  the same invariant build_segment establishes (segment.py:68);
- postings doc ids are remapped through that renumbering and re-encoded
  with the same block-max codec, so BMW/TAAT scoring and positional
  phrase matching behave identically;
- global df/cf/stats are unchanged (just copied): compaction moves
  postings between files, never changes them.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import EngineConfig
from ..state.manifest import read_json, write_atomic_dir, write_json
from .codec import encode_postings_batch
from .segment import TERMS_SCHEMA


def compact_group(seg_dirs: list[str], new_id: int, out_dir: str,
                  cfg: EngineConfig) -> dict:
    """Merge the given source segments into ``out_dir/segments/seg-<id>``."""
    bs = cfg.index.block_size
    has_pos = cfg.index.store_positions

    # ---- merged docmap, re-sorted to (conv_id, turn_idx) order
    docs = [pq.read_table(os.path.join(d, "docs.parquet"))
            for d in seg_dirs]
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([d.num_rows for d in docs], out=offsets[1:])
    cat = pa.concat_tables(docs).drop_columns(["doc_local"])
    order = pc.sort_indices(cat, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
    order_np = order.to_numpy(zero_copy_only=False)
    n = cat.num_rows
    new_of_concat = np.empty(n, dtype=np.int64)
    new_of_concat[order_np] = np.arange(n, dtype=np.int64)
    merged_docs = cat.take(order)
    merged_docs = pa.table(
        {"doc_local": pa.array(np.arange(n, dtype=np.int64)),
         **{name: merged_docs[name] for name in merged_docs.column_names}})
    doclen = merged_docs["doclen"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)

    # ---- bulk-decode every source segment (3 varint passes each),
    # remap doc ids, tag pairs with merged-vocabulary term codes
    from .codec import decode_terms_bulk
    src_fps = []
    seg_terms_l, seg_ndocs_l = [], []
    dids_l, tfs_l, pos_l = [], [], []
    for si, d in enumerate(seg_dirs):
        src_fps.append(read_json(os.path.join(d, "manifest.json"))
                       ["input_fingerprint"])
        tt = pq.read_table(os.path.join(d, "terms.parquet"))
        if has_pos:
            toffs, dids, tfs, pos = decode_terms_bulk(tt, bs,
                                                      with_positions=True)
            pos_l.append(pos)
        else:
            toffs, dids, tfs = decode_terms_bulk(tt, bs)
        seg_terms_l.append(np.asarray(tt["term"].to_pylist(), dtype=object))
        seg_ndocs_l.append(np.diff(toffs))
        dids_l.append(new_of_concat[offsets[si] + dids])
        tfs_l.append(tfs)

    # resume: same sources -> same output
    fp = hashlib.sha1("|".join(sorted(src_fps)).encode()).hexdigest()
    seg_name = f"seg-{new_id:05d}"
    seg_dir = os.path.join(out_dir, "segments", seg_name)
    from ..state.manifest import completed_segment
    if completed_segment(seg_dir, fp):
        return read_json(os.path.join(seg_dir, "manifest.json"))

    # merged vocabulary + per-pair term codes
    all_terms = np.concatenate(seg_terms_l) if seg_terms_l else \
        np.empty(0, dtype=object)
    vocab = np.unique(all_terms)
    terms_sorted = vocab.tolist()
    if len(vocab):
        codes_per_entry = np.searchsorted(vocab, all_terms)
        ndocs_per_entry = np.concatenate(seg_ndocs_l)
        pair_term = np.repeat(codes_per_entry, ndocs_per_entry)
        pair_docs_u = np.concatenate(dids_l)
        pair_tfs_u = np.concatenate(tfs_l).astype(np.int64)
        # (term, doc)-sort of all pairs (docmaps disjoint: ids unique/term)
        o = np.lexsort((pair_docs_u, pair_term))
        pair_docs = pair_docs_u[o]
        pair_tfs = pair_tfs_u[o]
        positions = None
        if has_pos:
            pos_all = np.concatenate(pos_l)
            starts = np.zeros(len(pair_tfs_u), dtype=np.int64)
            np.cumsum(pair_tfs_u[:-1], out=starts[1:])
            out_starts = np.zeros(len(pair_tfs), dtype=np.int64)
            np.cumsum(pair_tfs[:-1], out=out_starts[1:])
            total = int(pair_tfs.sum())
            idx = np.repeat(starts[o] - out_starts, pair_tfs) \
                + np.arange(total, dtype=np.int64)
            positions = pos_all[idx]
        # per-term runs in the sorted pair arrays
        pt_sorted = pair_term[o]
        new_term = np.empty(len(pt_sorted), dtype=bool)
        new_term[0] = True
        np.not_equal(pt_sorted[1:], pt_sorted[:-1], out=new_term[1:])
        term_starts_np = np.flatnonzero(new_term)
        encoded = encode_postings_batch(term_starts_np, pair_docs, pair_tfs,
                                        doclen[pair_docs], positions, bs)
        term_ends = np.append(term_starts_np[1:], len(pair_docs))
        df_arr = (term_ends - term_starts_np).astype(np.int64)
        cf_arr = np.add.reduceat(pair_tfs, term_starts_np)
        terms_table = pa.table({
            "term": pa.array(terms_sorted, pa.string()),
            "df": pa.array(df_arr),
            "cf": pa.array(cf_arr.astype(np.int64)),
            "n_docs": pa.array([tp.n_docs for tp in encoded], pa.int64()),
            "blob": pa.array([tp.blob for tp in encoded], pa.large_binary()),
            "block_last_doc": pa.array([tp.block_last_doc for tp in encoded],
                                       pa.list_(pa.int64())),
            "block_max_tf": pa.array([tp.block_max_tf for tp in encoded],
                                     pa.list_(pa.int32())),
            "block_min_dl": pa.array([tp.block_min_dl for tp in encoded],
                                     pa.list_(pa.int32())),
            "block_doc_off": pa.array([tp.block_doc_off for tp in encoded],
                                      pa.list_(pa.int64())),
            "block_tf_off": pa.array([tp.block_tf_off for tp in encoded],
                                     pa.list_(pa.int64())),
            "tf_section_off": pa.array([tp.tf_section_off for tp in encoded],
                                       pa.int64()),
            "pos_section_off": pa.array([tp.pos_section_off
                                         for tp in encoded], pa.int64()),
        }, schema=TERMS_SCHEMA)
    else:
        terms_table = pa.table({k.name: [] for k in TERMS_SCHEMA},
                               schema=TERMS_SCHEMA)

    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=seg_name + ".tmp.",
                           dir=os.path.join(out_dir, "segments"))
    try:
        pq.write_table(merged_docs, os.path.join(tmp, "docs.parquet"))
        pq.write_table(terms_table, os.path.join(tmp, "terms.parquet"),
                       row_group_size=4096)
        manifest = {
            "segment": seg_name,
            "segment_id": int(new_id),
            "n_docs": int(n),
            "n_terms": int(len(terms_sorted)),
            "total_len": int(doclen.sum()),
            "postings_bytes": int(terms_table["blob"].nbytes),
            "input_fingerprint": fp,
            "compacted_from": [os.path.basename(d) for d in seg_dirs],
        }
        write_json(os.path.join(tmp, "manifest.json"), manifest)
        write_atomic_dir(tmp, seg_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return manifest


def compact_index(index_dir: str, out_dir: str, *,
                  target_segments: int = 64) -> dict:
    """Compact a finished index into ``target_segments`` merged segments.

    Postings are re-encoded (doc ids renumbered into the merged
    (conv_id, turn_idx) order); global term stats and config are copied
    unchanged.  Groups compact in parallel (one Ray Data task per output
    segment); re-running with the same sources resumes per segment via
    the combined input fingerprint.
    """
    from .build import load_index_meta
    cfg_dict, _stats, seg_dirs = load_index_meta(index_dir)
    cfg = EngineConfig.from_dict(cfg_dict)
    target = max(1, min(target_segments, len(seg_dirs)))
    groups = [list(g) for g in np.array_split(np.asarray(seg_dirs), target)]

    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "global"), exist_ok=True)

    items = [{"new_id": i, "segs": "\x00".join(g)}
             for i, g in enumerate(groups) if g]
    cfg_d = cfg.to_dict()

    def stage(batch: pa.Table) -> pa.Table:
        rows = []
        for new_id, segs in zip(batch["new_id"].to_pylist(),
                                batch["segs"].to_pylist()):
            m = compact_group(segs.split("\x00"), int(new_id), out_dir,
                              EngineConfig.from_dict(cfg_d))
            rows.append((m["segment"], m["n_docs"], m["total_len"],
                         m["postings_bytes"]))
        return pa.table({
            "segment": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "total_len": pa.array([r[2] for r in rows], pa.int64()),
            "postings_bytes": pa.array([r[3] for r in rows], pa.int64()),
        })

    res = (ray.data.from_items(items)
           .map_batches(stage, batch_format="pyarrow", batch_size=1)
           .to_pandas())

    # global stats/terms unchanged by compaction — copy through
    for f in os.listdir(os.path.join(index_dir, "global")):
        src = os.path.join(index_dir, "global", f)
        dst = os.path.join(out_dir, "global", f)
        if os.path.isdir(src):
            if not os.path.exists(dst):
                shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
    stats = {
        "n_docs": int(res["n_docs"].sum()),
        "total_len": int(res["total_len"].sum()),
        "avgdl": (float(res["total_len"].sum()) / res["n_docs"].sum())
        if res["n_docs"].sum() else 0.0,
        "n_segments_built": int(len(res)),
        "postings_bytes": int(res["postings_bytes"].sum()),
    }
    write_json(os.path.join(out_dir, "global", "stats.json"), stats)
    write_json(os.path.join(out_dir, "config.json"), cfg.to_dict())
    write_json(os.path.join(out_dir, "manifest.json"), {
        "segments": sorted(res["segment"].tolist()),
        "stats": stats,
        "compacted_from": os.path.abspath(index_dir),
    })
    return stats
