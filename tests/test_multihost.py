"""Multi-host training entry: loader process-sharding + distributed init.

Reference: tools/dist_train.sh:8 launches one process per GPU across nodes
(env NNODES/NODE_RANK/MASTER_ADDR) with a DistributedSampler slicing the
epoch per rank (apis/samplers.py:13,35-100). The rebuild's counterpart is
tools/train.py --coordinator (jax.distributed.initialize) + DataLoader
(num_shards, shard_id).
"""

import os
import subprocess
import sys

import numpy as np

from sst_tpu.data.loader import DataLoader, weak_shuffle_indices


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return i


def _collate(xs):
    return np.asarray(xs)


def test_loader_shards_partition_epoch():
    ds = _Range(64)
    got = []
    for sid in range(4):
        dl = DataLoader(ds, batch_size=4, seed=7, collate=_collate,
                        num_shards=4, shard_id=sid, num_workers=1)
        assert len(dl) == 4  # 64 / 4 shards / batch 4
        for b in dl:
            got.extend(b.tolist())
    # disjoint cover of the full epoch, same seeded global order
    assert sorted(got) == list(range(64))


def test_loader_shards_same_global_order():
    """Every process derives its slice from the SAME seeded permutation
    (stride rank::world — reference DistributedSampler)."""
    ds = _Range(32)
    base = np.arange(32)
    np.random.RandomState(7 + 0).shuffle(base)
    dl = DataLoader(ds, batch_size=4, seed=7, collate=_collate,
                    num_shards=2, shard_id=1, num_workers=1)
    got = np.concatenate(list(dl))
    np.testing.assert_array_equal(got, base[1::2])


def test_weak_shuffle_shards_keep_sequences_contiguous():
    seq_ids = np.repeat(np.arange(8), 10)  # 8 sequences x 10 frames
    parts = [
        weak_shuffle_indices(seq_ids, shard_size=10, seed=0, epoch=0,
                             num_shards=2, shard_id=s)
        for s in range(2)
    ]
    allidx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allidx, np.arange(80))
    for p in parts:
        # intra-shard time order: within every sequence run, indices ascend
        runs = np.split(p, np.nonzero(np.diff(seq_ids[p]))[0] + 1)
        for r in runs:
            assert np.all(np.diff(r) > 0)
            assert len(np.unique(seq_ids[r])) == 1


def test_single_process_distributed_init_dry_run():
    """tools/train.py --coordinator with one process: the full multi-host
    code path (jax.distributed.initialize → process-sharded loader →
    make_array_from_process_local_data batches) runs end to end."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SST_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         os.path.join(repo, "configs", "sst", "sst_tiny_synthetic.py"),
         "--synthetic", "--max-steps", "2", "--log-interval", "1",
         "--coordinator", "localhost:29617", "--num-processes", "1",
         "--work-dir", "/tmp/sst_tpu_multihost_dryrun"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo,
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-1500:]
    assert "step 2/2" in r.stdout or "step 2" in r.stdout, r.stdout[-800:]
