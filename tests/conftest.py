import os
import shutil

import pytest

import ray

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    """sf-small synthetic transcripts (~2000 turns), multiple shuffled files."""
    from vframe_ray.corpus import write_transcripts
    d = str(tmp_path_factory.mktemp("transcripts_small"))
    write_transcripts(d, 2000, rows_per_file=500, n_terms=800)
    return d


@pytest.fixture(scope="session")
def small_oracle(small_corpus_dir):
    import pyarrow.parquet as pq
    from vframe_ray.oracle import OracleIndex
    from tests.util import SMALL_CFG
    t = pq.ParquetDataset(small_corpus_dir).read(
        columns=["conv_id", "turn_idx", "text"])
    rows = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                    t["text"].to_pylist()))
    return OracleIndex(rows, SMALL_CFG)


@pytest.fixture(scope="session")
def small_index_dir(ray_session, small_corpus_dir, tmp_path_factory):
    from vframe_ray.index.build import build_index
    from vframe_ray.sources.readers import read_transcripts
    from tests.util import SMALL_CFG
    d = str(tmp_path_factory.mktemp("index_small"))
    ds = read_transcripts(small_corpus_dir,
                          columns=["conv_id", "turn_idx", "text"])
    build_index(ds, d, SMALL_CFG)
    return d
