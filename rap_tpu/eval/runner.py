"""Small shared eval loop: full ODE sampling + pose fit + metric suite.

Used by scripts/train_synthetic_demo.py and scripts/reflow_distill.py so both
report registration metrics through the exact same protocol (the reference's
test path, modeling.py:336-426): generate with the configured sampler, fit
per-part poses with Kabsch, aggregate with MetricsMeter.
"""

from __future__ import annotations

import jax
import numpy as np

from ..data import BatchLoader, LoaderConfig
from ..registration import RPFConfig, predict_poses, refine_poses_icp, sample
from .evaluator import EvalConfig, Evaluator
from .meter import MetricsMeter, print_eval_table


def evaluate_split(
    params,
    pipe: RPFConfig,
    ds,
    *,
    batch_tokens: int = 32_768,
    num_steps: int | None = None,
    schedule: str | None = None,
    seed: int = 100,
    tag: str = "val",
    dataset_key: str = "synth",
    n_generations: int = 1,
    use_icp: bool = False,
    icp_refine: bool = False,
    icp_refine_trim: float = 0.7,
    icp_refine_restarts: int = 1,
) -> dict[str, float]:
    """Run the full sampling+metrics protocol over one dataset; returns the
    per-dataset averaged metric dict (floats).

    With ``n_generations`` > 1 the reference benchmark protocol applies
    (scripts/test_script_example.sh: n_generations=3, rigidity-selected):
    each sample is generated N times and avg / best-of-N / rigidity-selected
    sections are reported, keyed ``best_of_N/<metric>`` etc.

    ``use_icp`` switches the error *measurement* to the reference's
    available-but-off ICP protocol (ref eval/metrics.py:177-261
    ``use_icp=True``: the ICP delta between GT and prediction IS the error,
    factoring out part symmetry).

    ``icp_refine`` post-refines the predicted poses themselves with batched
    trimmed ICP against the anchor (registration.refine_poses_icp) before
    any metric is computed — a TPU-native pipeline capability the reference
    does not have; report refined numbers alongside raw ones. Note that
    under refinement ``rigidity_rmse`` measures the size of the ICP
    correction (poses no longer exactly equal the Kabsch fit of the
    generated points), so rigidity-selection picks the generation needing
    the least correction."""
    evaluator = Evaluator(EvalConfig(use_icp=use_icp))

    @jax.jit
    def generate(params, batch, key):
        o = sample(
            params, pipe, batch, key,
            return_trajectory=False, num_steps=num_steps, schedule=schedule,
        )
        R, t = predict_poses(batch, o["points"])
        if icp_refine:
            R, t = refine_poses_icp(
                batch, R, t, iters=50, trim_fraction=icp_refine_trim,
                yaw_restarts=icp_refine_restarts,
            )
        return o["points"], R, t

    meter = MetricsMeter()
    loader = BatchLoader(
        [ds], LoaderConfig(max_points_per_batch=batch_tokens, shuffle=False)
    )
    for b_idx, (batch, names, ds_name) in enumerate(loader.epoch(0)):
        gen_results = []
        for g in range(n_generations):
            gkey = jax.random.fold_in(jax.random.key(seed + b_idx), g)
            pts, R, t = generate(params, batch, gkey)
            gen_results.append(evaluator.compute_metrics(batch, pts, R, t))
        valid = np.asarray(batch.sample_valid)
        nparts = np.asarray(batch.part_valid).reshape(batch.S, -1).sum(1)
        if n_generations == 1:
            meter.add_metrics(ds_name, gen_results[0], valid, nparts)
        else:
            agg = evaluator.aggregate_generations(batch, gen_results)
            meter.add_metrics(ds_name, agg["avg"], valid, nparts)
            for section in (f"best_of_{n_generations}", "rigidity_selected"):
                if section in agg:
                    meter.add_metrics(
                        ds_name,
                        {f"{section}/{k}": v for k, v in agg[section].items()},
                        valid,
                    )
    results = meter.compute_average()
    print_eval_table({tag: results})
    return {k: float(v) for k, v in results.get(dataset_key, {}).items()}
