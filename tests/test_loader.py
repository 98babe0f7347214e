"""SeqBatchLoader: multi-worker IO correctness + throughput sanity."""

import time

import numpy as np
import pytest

from sgtapose_tpu.config import Config, ModelConfig
from sgtapose_tpu.data.discovery import find_ndds_seq_data_in_dir
from sgtapose_tpu.data.loader import SeqBatchLoader
from sgtapose_tpu.data.synthetic import write_synthetic_dataset

TINY = Config(model=ModelConfig(input_res=(64, 64)))
KP = ["Link0", "Link1", "Link3", "Link4", "Link6", "Link7", "Panda_hand"]
K = np.array([[502.30, 0.0, 319.75], [0.0, 502.30, 179.75], [0.0, 0.0, 1.0]])


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("loader_data"))
    write_synthetic_dataset(d, n_videos=3, n_frames=4, seed=0)
    return d


def _epoch_batches(dataset, num_workers, epoch=1, batch_size=4):
    pairs = find_ndds_seq_data_in_dir(dataset)
    loader = SeqBatchLoader(
        pairs, TINY, K, "panda_synthetic", KP, batch_size,
        num_workers=num_workers,
    )
    return list(loader.epoch(epoch))


def test_workers_do_not_change_the_stream(dataset):
    """Batch content and order are identical for 1 vs 4 workers (the pool is
    an IO detail, not a semantic one)."""
    b1 = _epoch_batches(dataset, num_workers=1)
    b4 = _epoch_batches(dataset, num_workers=4)
    assert len(b1) == len(b4) > 0
    for x, y in zip(b1, b4):
        for f in x._fields:
            np.testing.assert_array_equal(getattr(x, f), getattr(y, f))


def test_shuffle_per_epoch(dataset):
    a = _epoch_batches(dataset, num_workers=2, epoch=1)
    b = _epoch_batches(dataset, num_workers=2, epoch=2)
    assert any(
        not np.array_equal(x.prev_projs, y.prev_projs) for x, y in zip(a, b)
    )


def test_early_break_shuts_down_workers(dataset):
    """Breaking out of the epoch iterator must not deadlock or leak."""
    pairs = find_ndds_seq_data_in_dir(dataset)
    loader = SeqBatchLoader(
        pairs, TINY, K, "panda_synthetic", KP, 2, num_workers=4
    )
    it = loader.epoch(0)
    next(it)
    it.close()  # triggers the finally/stop path


def test_loader_throughput_probe(dataset, capsys):
    """Not a perf assertion (1 visible CPU here) — records images/sec for
    both worker counts so regressions are visible in -s runs."""
    for nw in (1, 4):
        t0 = time.perf_counter()
        n = sum(b.prev_img.shape[0] * 2 for b in _epoch_batches(dataset, nw))
        dt = time.perf_counter() - t0
        print(f"num_workers={nw}: {n / dt:.1f} images/s")
    assert n > 0


def test_load_failure_surfaces_in_consumer(dataset, tmp_path):
    """A corrupt sample must raise in the consuming loop, not silently
    truncate the epoch (the coordinator ships the exception through the
    queue)."""
    import shutil

    d = str(tmp_path / "broken")
    shutil.copytree(dataset, d)
    # corrupt one frame's meta json
    import glob, os
    victim = sorted(glob.glob(os.path.join(d, "*", "*_meta.json")))[1]
    with open(victim, "w") as f:
        f.write("{not json")
    pairs = find_ndds_seq_data_in_dir(d)
    loader = SeqBatchLoader(
        pairs, TINY, K, "panda_synthetic", KP, 2, num_workers=2,
        shuffle=False,
    )
    with pytest.raises(Exception):
        list(loader.epoch(0))
