"""Batch loader: multi-dataset iteration with prefetch and multi-process sharding.

Replaces the reference's PointCloudDataModule + torch DataLoader machinery
(/root/reference/rectified_point_flow/data/datamodule.py): per-epoch shuffled
shape-aware packing, per-dataset random subset caps for balancing
(RandomSampledDataset, datamodule.py:201-253), and background-thread prefetch
(hides PLY/HDF5 + augmentation latency behind TPU steps).

Multi-process contract (differs from the reference's DDP rank-striding,
datamodule.py:104-142): under pjit every process must feed its shard of the
SAME global batch. So every process computes the identical deterministic plan
list and loads only its contiguous slice of each batch's sample axis
(parallel/distributed.py stitches the slices into global jax.Arrays). Batch
shapes are therefore taken from the plan, never re-derived from loaded data,
when process_count > 1 — different processes load different samples and would
disagree on a data-derived bucket.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import Iterator

import numpy as np

from .dataset import PointCloudDataset, Sample
from .packer import BatchPlan, N_BUCKETS, _bucket, collate_to_part_batch, plan_batches

logger = logging.getLogger(__name__)


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
    s_multiple: int = 1   # pad each batch's S to a multiple (DP device shards)
    # "slice": every process loads its contiguous S-slice of the SAME global
    #   batch (pjit training — see module docstring).
    # "stride": each process takes whole batches plan[index::count] and runs
    #   them independently (eval: embarrassingly parallel, metrics reduced
    #   across hosts at the end by MetricsMeter).
    shard_mode: str = "slice"


@dataclasses.dataclass
class PaddingStats:
    """Padded-vs-valid token accounting for one epoch (SURVEY §7.2(1))."""

    valid_tokens: int = 0
    padded_tokens: int = 0
    batches: int = 0

    @property
    def waste(self) -> float:
        tot = self.valid_tokens + self.padded_tokens
        return self.padded_tokens / tot if tot else 0.0

    def add(self, batch) -> None:
        valid = int(np.asarray(batch.point_mask).sum())
        self.valid_tokens += valid
        self.padded_tokens += batch.num_tokens - valid
        self.batches += 1

    def summary(self) -> str:
        return (
            f"{self.batches} batches, {self.valid_tokens} valid tokens, "
            f"{self.padded_tokens} padded ({100 * self.waste:.1f}% waste)"
        )


class BatchLoader:
    """Iterates (PartBatch, names, dataset_name) over one or more datasets.

    With ``process_count > 1`` each yielded PartBatch is this process's local
    sample-axis slice of the global batch (pass it through
    ``parallel.distributed.make_global_batch`` before the jitted step);
    ``names`` are the local slice's sample names.
    """

    def __init__(self, datasets: list[PointCloudDataset], cfg: LoaderConfig):
        self.datasets = datasets
        self.cfg = cfg
        assert cfg.shard_mode in ("slice", "stride")
        if cfg.process_count > 1 and cfg.shard_mode == "slice":
            assert cfg.s_multiple % cfg.process_count == 0, (
                "s_multiple must be a multiple of process_count so every "
                "process owns an equal S slice"
            )
        self.padding_stats = PaddingStats()

    def _epoch_plan(self, epoch: int) -> list[tuple[int, BatchPlan]]:
        """[(dataset_idx, plan)] — IDENTICAL on every process (seeded)."""
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
        if self.cfg.shard_mode == "stride" and self.cfg.process_count > 1:
            all_plans = all_plans[self.cfg.process_index :: self.cfg.process_count]
        return all_plans

    def _load_batch(self, d_idx: int, plan: BatchPlan, epoch: int):
        """Load this process's S-slice of one planned batch.

        Returns a list of (batch, names, dataset_name): normally one element;
        single-process tight rebucketing may split a batch whose true point
        counts blow the token budget (plan sizes are estimates).
        """
        ds = self.datasets[d_idx]
        multi = self.cfg.process_count > 1 and self.cfg.shard_mode == "slice"
        if multi:
            per = plan.S // self.cfg.process_count
            lo = self.cfg.process_index * per
            idx = plan.indices[lo : lo + per]
            samples = [ds.get(i, epoch=epoch) for i in idx]
            # shapes MUST come from the plan: other processes hold other
            # samples and a data-derived bucket would diverge across hosts.
            # Plan sizes are estimates (num_points files store fragment
            # TOTALS; total/parts undershoots the max part of imbalanced
            # fragments), so an oversized part is degraded — truncated to the
            # planned bucket — rather than crashing the epoch. Parts arrive
            # point-shuffled from the augmentation (ref dataset.py:826), so
            # keeping the first N is a uniform subsample.
            oversized = [s.name for s in samples if s.max_part_points > plan.N]
            if oversized:
                logger.warning(
                    "planned bucket N=%d < true max part size of %s; "
                    "truncating to fit (slice mode cannot rebucket — shapes "
                    "must agree across hosts). Accurate per-part sizes need "
                    "smaller fragments or a larger max_points_per_batch.",
                    plan.N, oversized[:3],
                )
                samples = [self._truncate_parts(s, plan.N) for s in samples]
            batch, names = collate_to_part_batch(
                samples, plan.N, plan.P, per, sample_offset=lo,
                feat_dim=ds.cfg.feat_dim,
            )
            # the no_padding static flag branches the compiled program
            # (mask-free vs masked attention). It was computed from THIS
            # process's slice; other hosts may disagree (e.g. the tail pad
            # slots live on one host) and a locally-dense slice of a
            # globally-padded batch is wrong anyway — force the conservative
            # masked program so every host traces identical HLO.
            if batch.no_padding:
                batch = batch.replace(no_padding=False)
            self.padding_stats.add(batch)
            return [(batch, names, ds.cfg.dataset_name)]

        samples: list[Sample] = [ds.get(i, epoch=epoch) for i in plan.indices]
        out = []
        for group in self._rebucket(samples, plan):
            true_n = max(s.max_part_points for s in group)
            N = _bucket(true_n, N_BUCKETS)
            S = -(-len(group) // self.cfg.s_multiple) * self.cfg.s_multiple
            batch, names = collate_to_part_batch(
                group, N, plan.P, S, feat_dim=ds.cfg.feat_dim
            )
            self.padding_stats.add(batch)
            out.append((batch, names, ds.cfg.dataset_name))
        return out

    @staticmethod
    def _truncate_parts(s: Sample, n: int) -> Sample:
        if s.max_part_points <= n:
            return s
        return dataclasses.replace(
            s,
            points=[p[:n] for p in s.points],
            points_gt=[p[:n] for p in s.points_gt],
            features=[f[:n] for f in s.features],
        )

    def _rebucket(self, samples: list[Sample], plan: BatchPlan):
        """Split a loaded batch if true (not estimated) sizes exceed the
        token budget (plan sizes come from num_points files or a default)."""
        true_n = max(s.max_part_points for s in samples)
        N = _bucket(true_n, N_BUCKETS)
        S = -(-len(samples) // self.cfg.s_multiple) * self.cfg.s_multiple
        if S * plan.P * N <= self.cfg.max_points_per_batch or len(samples) == 1:
            return [samples]
        max_s = max(
            self.cfg.max_points_per_batch // (plan.P * N), 1
        ) // self.cfg.s_multiple * self.cfg.s_multiple
        max_s = max(max_s, 1)
        logger.warning(
            "batch of %d samples exceeds token budget at true N=%d "
            "(estimated sizes were too small); splitting into chunks of %d",
            len(samples), N, max_s,
        )
        groups = [samples[i : i + max_s] for i in range(0, len(samples), max_s)]
        # recurse: a chunk's own max may allow a smaller bucket
        out = []
        for g in groups:
            out.extend(self._rebucket(g, plan) if len(g) < len(samples) else [g])
        return out

    def epoch(self, epoch: int = 0) -> Iterator:
        """Yield batches with background prefetch."""
        plans = self._epoch_plan(epoch)
        self.padding_stats = PaddingStats()
        if not plans:
            return
        q: queue.Queue = queue.Queue(maxsize=max(self.cfg.prefetch, 1))
        stop = threading.Event()

        def put(item) -> bool:
            """put that aborts when the consumer is gone (early exit from
            epoch() sets `stop` while the bounded queue may be full — a plain
            q.put would pin this thread plus its loaded batches forever)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for d_idx, plan in plans:
                    if stop.is_set():
                        return
                    for item in self._load_batch(d_idx, plan, epoch):
                        if not put(item):
                            return
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            finally:
                put(None)

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
        """Number of *planned* batches (single-process rebucketing may add a
        few more at iteration time when size estimates undershoot)."""
        return len(self._epoch_plan(epoch))
