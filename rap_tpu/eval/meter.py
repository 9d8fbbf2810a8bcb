"""Per-dataset metric accumulation + rich result tables.

Parity with /root/reference/rectified_point_flow/utils/logging.py
(MetricsMeter :306-524, print_eval_table :81-303): per-dataset running
sums/counts with an overall split, sample counts, part-count ranges, and a
console table with avg / best-of-N / rigidity-selected sections.

TPU-native distributed note: the reference reduces across DDP ranks with
``all_gather_object`` on dataset-name lists + float64 ``all_reduce``
(logging.py:397-424). Here datasets form a *static registry* (names known
up front), so cross-host reduction is a fixed-size float array psum via
``jax.experimental.multihost_utils`` (see reduce_across_hosts) — gathering
Python objects is not TPU-idiomatic.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def _encode_metric_keys(keys: list[str], n_max: int, klen: int) -> np.ndarray:
    """Encode metric-key strings into fixed-width uint8 rows for the
    cross-host gather. A key longer than ``klen`` would silently merge/rename
    with others after the union rebuild, corrupting aggregates — fail loudly
    instead (the longest shipped key is 60 bytes at klen=64)."""
    names = np.zeros((n_max, klen), np.uint8)
    for j, k in enumerate(keys):
        b = k.encode()
        if len(b) > klen:
            raise ValueError(
                f"metric key {k!r} is {len(b)} bytes; the cross-host reduce "
                f"encodes keys into {klen}-byte rows — shorten the key or "
                "raise KLEN on every host"
            )
        names[j, : len(b)] = np.frombuffer(b, np.uint8)
    return names


class MetricsMeter:
    def __init__(self):
        self._sums: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
        self._counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        self._samples: dict[str, int] = defaultdict(int)
        self._part_ranges: dict[str, tuple[int, int]] = {}

    def add_metrics(
        self,
        dataset_name: str | list[str],
        metrics: dict[str, np.ndarray],
        valid: np.ndarray,
        num_parts: np.ndarray | None = None,
    ) -> None:
        """Accumulate per-sample metric arrays (S,) under their dataset names."""
        valid = np.asarray(valid, bool)
        S = int(valid.shape[0])
        names = (
            [dataset_name] * S if isinstance(dataset_name, str) else list(dataset_name)
        )
        for key, vals in metrics.items():
            vals = np.asarray(vals, np.float64).reshape(-1)
            for s in range(S):
                if not valid[s]:
                    continue
                v = vals[s]
                if not np.isfinite(v):
                    continue
                self._sums[names[s]][key] += float(v)
                self._counts[names[s]][key] += 1
        # sample/part-range bookkeeping only for the PRIMARY add (the one
        # that passes num_parts) — the best-of-N / rigidity-selected adds for
        # the same batch must not recount samples
        if num_parts is None:
            return
        for s in range(S):
            if valid[s]:
                self._samples[names[s]] += 1
                if num_parts is not None:
                    p = int(np.asarray(num_parts).reshape(-1)[s])
                    lo, hi = self._part_ranges.get(names[s], (p, p))
                    self._part_ranges[names[s]] = (min(lo, p), max(hi, p))

    def compute_average(self) -> dict[str, dict[str, float]]:
        """{dataset: {metric: mean}} plus an 'overall' entry."""
        out: dict[str, dict[str, float]] = {}
        total_sums: dict[str, float] = defaultdict(float)
        total_counts: dict[str, int] = defaultdict(int)
        for ds, sums in self._sums.items():
            out[ds] = {}
            for k, sm in sums.items():
                c = self._counts[ds][k]
                out[ds][k] = sm / max(c, 1)
                total_sums[k] += sm
                total_counts[k] += c
        out["overall"] = {
            k: total_sums[k] / max(total_counts[k], 1) for k in total_sums
        }
        return out

    def get_sample_counts(self) -> dict[str, int]:
        return dict(self._samples)

    def get_part_count_ranges(self) -> dict[str, tuple[int, int]]:
        return dict(self._part_ranges)

    def reset(self) -> None:
        self.__init__()

    # ---- cross-host reduction (multi-process TPU) --------------------------
    def reduce_across_hosts(self, dataset_registry: list[str]) -> None:
        """Sum sums/counts (+ sample counts, part ranges) across jax processes.

        Metric keys can differ per host (stride-mode eval gives each host
        different batches; correspondence metrics only appear for pair
        samples, and a host may get zero batches), so the key list itself is
        part of the gather: phase 1 agrees on the max key count, phase 2
        gathers fixed-width key names alongside the padded value matrices and
        each host rebuilds the union. Datasets remain a static registry.
        """
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        KLEN = 64
        D = len(dataset_registry)
        keys = sorted({k for d in self._sums.values() for k in d})
        n_local = np.array([len(keys)], np.int32)
        n_max = int(
            np.asarray(multihost_utils.process_allgather(n_local)).max()
        )
        if n_max == 0:
            return

        names = _encode_metric_keys(keys, n_max, KLEN)
        # float64 sums cross the (x64-disabled) gather as (hi, lo) float32
        # pairs — hi = f32(x), lo = f32(x - hi) — and counts as exact int32;
        # summation happens in float64 on the host (reference gathers float64
        # directly, logging.py:397-424)
        sums = np.zeros((D, n_max), np.float64)
        counts = np.zeros((D, n_max), np.int32)
        for i, ds in enumerate(dataset_registry):
            for j, k in enumerate(keys):
                sums[i, j] = self._sums[ds].get(k, 0.0)
                counts[i, j] = self._counts[ds].get(k, 0)
        hi = sums.astype(np.float32)
        lo = (sums - hi.astype(np.float64)).astype(np.float32)
        samp = np.array(
            [self._samples.get(ds, 0) for ds in dataset_registry], np.int32
        )
        # part ranges: +inf/-inf sentinels for datasets this host never saw
        pr = np.zeros((D, 2), np.int32)
        for i, ds in enumerate(dataset_registry):
            lo_p, hi_p = self._part_ranges.get(ds, (np.iinfo(np.int32).max, -1))
            pr[i] = (lo_p, hi_p)

        g_names = np.asarray(multihost_utils.process_allgather(names))
        g_hi = np.asarray(multihost_utils.process_allgather(hi), np.float64)
        g_lo = np.asarray(multihost_utils.process_allgather(lo), np.float64)
        g_cnt = np.asarray(multihost_utils.process_allgather(counts), np.int64)
        g_samp = np.asarray(multihost_utils.process_allgather(samp), np.int64)
        g_pr = np.asarray(multihost_utils.process_allgather(pr))

        self._sums.clear()
        self._counts.clear()
        for p in range(g_names.shape[0]):
            for j in range(n_max):
                raw = bytes(g_names[p, j]).rstrip(b"\x00")
                if not raw:
                    continue
                k = raw.decode()
                for i, ds in enumerate(dataset_registry):
                    if g_cnt[p, i, j]:
                        self._sums[ds][k] += float(g_hi[p, i, j] + g_lo[p, i, j])
                        self._counts[ds][k] += int(g_cnt[p, i, j])
        for i, ds in enumerate(dataset_registry):
            total = int(g_samp[:, i].sum())
            if total:
                self._samples[ds] = total
            lo_r = int(g_pr[:, i, 0].min())
            hi_r = int(g_pr[:, i, 1].max())
            if hi_r >= 0:
                self._part_ranges[ds] = (lo_r, hi_r)


def print_eval_table(
    sections: dict[str, dict[str, dict[str, float]]],
    sample_counts: dict[str, int] | None = None,
    part_ranges: dict[str, tuple[int, int]] | None = None,
    console=None,
) -> None:
    """Rich console tables: one per section (avg / best_of_N / ...).

    sections: {section: {dataset: {metric: value}}}.
    """
    try:
        from rich.console import Console
        from rich.table import Table
    except ImportError:  # plain-text fallback
        for sec, per_ds in sections.items():
            print(f"== {sec} ==")
            for ds, md in per_ds.items():
                for k, v in md.items():
                    print(f"  {ds:<20s} {k:<42s} {v:.4f}")
        return

    console = console or Console()
    for sec, per_ds in sections.items():
        datasets = list(per_ds.keys())
        metric_keys = sorted({k for md in per_ds.values() for k in md})
        table = Table(title=f"Evaluation — {sec}")
        table.add_column("metric", justify="left")
        for ds in datasets:
            label = ds
            if sample_counts and ds in sample_counts:
                label += f" (n={sample_counts[ds]})"
            if part_ranges and ds in part_ranges:
                lo, hi = part_ranges[ds]
                label += f" [{lo}-{hi}p]"
            table.add_column(label, justify="right")
        for k in metric_keys:
            row = [k]
            for ds in datasets:
                v = per_ds[ds].get(k)
                row.append("-" if v is None else f"{v:.4f}")
            table.add_row(*row)
        console.print(table)
