#!/bin/bash
# Train every deep/GP baseline on the full forest workload (10.8k train,
# seed-10 split) and log the q-error profiles for the BASELINE.md
# comparison table. Sequential: one TPU.
cd "$(dirname "$0")/.."
mkdir -p experiments/baseline_runs
for MT in ${MODELS:-DNN MCDropout DeepEnsemble Density DKL DKL-SKI MSCN RBF-GP KRR MLP GP}; do
  echo "=== $MT ==="
  timeout 3000 python -m nngp_tpu.cli.train_baselines --model_type "$MT" \
    --query_path workloads/forest_data \
    > "experiments/baseline_runs/${MT}.log" 2>&1
  echo "exit=$? $(grep -h 'symmetric q-error' experiments/baseline_runs/${MT}.log | tail -1)"
done
