"""TPU-native stacked-hourglass / multi-stage pose-estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
minhhoangbui/hourglass-pose-estimation (top-down 2D human pose estimation
with stacked-hourglass and MSPN heatmap regressors on MPII/COCO-style
datasets), built TPU-first:

  * models compute in NHWC bfloat16 on the MXU (flax.linen),
  * Gaussian target rendering, affine augmentation warps and heatmap
    decoding run on device as vectorized XLA / Pallas programs,
  * parallelism is a `jax.sharding.Mesh` (data / model / spatial axes)
    with XLA-inserted collectives over ICI — not host-side replication,
  * checkpointing via Orbax, export via jax.export / StableHLO.

Layer map (mirrors SURVEY.md §1 of the reference):
  utils/     geometry + eval numerics        (ref: src/utils/)
  ops/       device kernels (XLA + Pallas)   (ref: none — Python loops)
  data/      datasets + input pipeline       (ref: src/datasets/)
  loss/      heatmap losses                  (ref: src/loss/)
  models/    hourglass + MSPN                (ref: src/models/)
  parallel/  mesh + sharded train/eval steps (ref: torch DataParallel)
  runner/    Trainer / Evaluator / Estimator (ref: src/runner/)
  export/    StableHLO / TF SavedModel       (ref: scripts/export.py)
"""

__version__ = "0.1.0"
