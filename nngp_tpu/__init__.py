"""nngp_tpu — TPU-native NNGP/NTK cardinality-estimation framework.

A from-scratch JAX/Pallas rebuild of the capabilities of Kangfei/NNGP-src
("Lightweight and Accurate Cardinality Estimation by Neural Network Gaussian
Process", SIGMOD 2022). The reference delegates its kernel math to
neural-tangents and runs single-process fp64 on CPU; this framework computes
the infinite-width NNGP/NTK kernels with its own closed-form dual-activation
recursion, assembles Gram matrices as blocked fp32 kernels on the TPU MXU
(Pallas fused path available), and solves the exact GP posterior with
on-device Cholesky — shardable over a `jax.sharding.Mesh`.

Layer map (reference file:line citations in each module's docstring):
  ops/        dual-activation recursion, Gram assembly (XLA + Pallas), linalg
  models/     kernel "architecture" specs (Dense/Relu/Erf serial), RBF-GP baseline,
              finite-width baseline models (flax)
  gp/         exact GP posterior fit/predict (nngp + ntk semantics)
  featurize/  unified query featurization (replaces the reference's triplicated
              QuerySampler / JoinQuerySampler / neuroestimator encoders)
  data/       CSV table loaders + offline labeled-query generation
  eval/       splits, q-error statistics, calibration
  parallel/   mesh helpers, sharded Gram / posterior for multi-chip
  active/     posterior-variance active learning
  serve/      Estimator serving API (PostgreSQL-facing) + aux-query feedback
  utils/      timing, memory, structured config
"""

__version__ = "0.1.0"
