"""Batch loader: multi-dataset iteration with prefetch and host sharding.

Replaces the reference's PointCloudDataModule + torch DataLoader machinery
(/root/reference/rectified_point_flow/data/datamodule.py): per-epoch shuffled
shape-aware packing, per-dataset random subset caps for balancing
(RandomSampledDataset, datamodule.py:201-253), background-thread prefetch
(hides PLY/HDF5 + augmentation latency behind TPU steps), and per-process
sharding by striding the *batch plan* list (all hosts agree on shapes).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator

import numpy as np

from .dataset import PointCloudDataset, Sample
from .packer import BatchPlan, collate_to_part_batch, plan_batches


@dataclasses.dataclass(frozen=True)
class LoaderConfig:
    max_points_per_batch: int = 400_000
    shuffle: bool = False
    seed: int = 0
    prefetch: int = 2
    max_samples_per_epoch: int = 0   # per-dataset random cap (0 = all)
    process_index: int = 0
    process_count: int = 1
    drop_last: bool = False
    s_multiple: int = 1   # pad each batch's sample count to a multiple (DP shards)


class BatchLoader:
    """Iterates (PartBatch, names, dataset_name) over one or more datasets."""

    def __init__(self, datasets: list[PointCloudDataset], cfg: LoaderConfig):
        self.datasets = datasets
        self.cfg = cfg

    def _epoch_plan(self, epoch: int) -> list[tuple[int, BatchPlan]]:
        """[(dataset_idx, plan)] for this process this epoch."""
        all_plans: list[tuple[int, BatchPlan]] = []
        for d_idx, ds in enumerate(self.datasets):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.cfg.seed, epoch, d_idx])
            )
            indices = np.arange(len(ds))
            if self.cfg.max_samples_per_epoch and len(indices) > self.cfg.max_samples_per_epoch:
                indices = rng.choice(
                    indices, self.cfg.max_samples_per_epoch, replace=False
                )
            part_counts = [ds.part_counts[i] for i in indices]
            # size estimate: precomputed num_points (total) / parts, else a
            # conservative default; exact sizes are only known after loading
            sizes = []
            for i in indices:
                npnt = ds.precomputed_num_points[i]
                sizes.append(
                    max(npnt // max(ds.part_counts[i], 1), 1) if npnt else 5000
                )
            plans = plan_batches(
                part_counts,
                sizes,
                self.cfg.max_points_per_batch,
                shuffle=self.cfg.shuffle,
                seed=self.cfg.seed + epoch,
                s_multiple=self.cfg.s_multiple,
            )
            # map plan-local indices back to dataset indices
            for p in plans:
                p.indices = [int(indices[j]) for j in p.indices]
                all_plans.append((d_idx, p))
        if self.cfg.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.cfg.seed, epoch, 999])
            )
            order = rng.permutation(len(all_plans))
            all_plans = [all_plans[i] for i in order]
        # shard by process: stride over the agreed plan order
        mine = all_plans[self.cfg.process_index :: self.cfg.process_count]
        # equalize batch counts across processes (reference repeats the last
        # batch, datamodule.py:132-142)
        if not self.cfg.drop_last and self.cfg.process_count > 1 and all_plans:
            n_max = -(-len(all_plans) // self.cfg.process_count)
            while len(mine) < n_max:
                mine.append(mine[-1])
        return mine

    def _load_batch(self, d_idx: int, plan: BatchPlan, epoch: int):
        ds = self.datasets[d_idx]
        samples: list[Sample] = [ds.get(i, epoch=epoch) for i in plan.indices]
        # plan sizes are estimates (precomputed num_points or a default); the
        # actual bucketed shape comes from the loaded data so padding is tight
        from .packer import N_BUCKETS, _bucket

        true_n = max(s.max_part_points for s in samples)
        N = _bucket(true_n, N_BUCKETS)
        batch, names = collate_to_part_batch(samples, N, plan.P, plan.S)
        return batch, names, ds.cfg.dataset_name

    def epoch(self, epoch: int = 0) -> Iterator:
        """Yield batches with background prefetch."""
        plans = self._epoch_plan(epoch)
        if not plans:
            return
        q: queue.Queue = queue.Queue(maxsize=max(self.cfg.prefetch, 1))
        stop = threading.Event()

        def worker():
            try:
                for d_idx, plan in plans:
                    if stop.is_set():
                        return
                    q.put(self._load_batch(d_idx, plan, epoch))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def num_batches(self, epoch: int = 0) -> int:
        return len(self._epoch_plan(epoch))
