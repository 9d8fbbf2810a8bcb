#!/usr/bin/env bash
# Benchmark-evaluation example — the rap_tpu equivalent of the reference's
# scripts/test_script_example.sh: batch evaluation over several datasets with
# 3 generations, 10 Euler steps, rigidity-selected best-of-N, artifacts on.
#
# Dataset roots follow the reference layout (HDF5 or PLY folders with
# data_split/); the checkpoint name auto-resolves (cache -> HF hub -> IPB zip).

DATA_ROOT=${DATA_ROOT:-./dataset}

python -m rap_tpu.apps.sample \
  --config configs/rap_inference.yaml \
  -o model_name=rap_10 \
  -o checkpoint=rap_model_10.ckpt \
  -o pipeline.inference_sampling_steps=10 \
  -o pipeline.n_generations=3 \
  -o pipeline.rigidity_forcing=true \
  -o data.max_points_per_batch=50000 \
  -o eval.save_results=true \
  -o eval.save_merged_pointcloud_steps=false \
  -o "data.datasets=[
        {'data_path': '${DATA_ROOT}/threedmatch', 'dataset_name': 'threedmatch', 'split': 'val', 'use_random_split': True, 'min_parts': 2, 'max_parts': 12},
        {'data_path': '${DATA_ROOT}/kitti',       'dataset_name': 'kitti',       'split': 'val', 'use_random_split': True, 'min_parts': 2, 'max_parts': 12}
      ]" \
  "$@"
