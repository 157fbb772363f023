import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data


def test_write_partitioned(ray_session, tmp_path):
    from vframe_ray.stages.sinks import write_partitioned
    tbl = pa.table({
        "lang": pa.array(["en", "de", "en", "fr"]),
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = str(tmp_path / "parts")
    write_partitioned(ray.data.from_arrow(tbl), out, ["lang"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]
    back = pq.ParquetDataset(out).read()
    assert back.num_rows == 4


def test_split_errors(ray_session):
    from vframe_ray.stages.sinks import split_errors
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["ok", "", "fine", ""]),
    })
    valid, errors = split_errors(
        ray.data.from_arrow(tbl),
        lambda t: pc.not_equal(t["text"], ""))
    assert sorted(valid.to_pandas()["doc_id"]) == [0, 2]
    assert sorted(errors.to_pandas()["doc_id"]) == [1, 3]
