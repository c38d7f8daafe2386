"""pytorch_video_action_tpu — a TPU-native JAX framework for frame-level video
action classification on the Breakfast-actions dataset.

A ground-up rebuild of the capabilities of ``mrqorib/pytorch-video-action``
(reference mounted read-only at /root/reference) designed TPU-first:

* pure-functional models (plain pytrees) with ``init``/``apply`` pairs,
* fixed-shape length-bucketed batches (few XLA compilations, full masking),
* ``jax.lax.scan`` recurrence with precomputed input projections so the large
  matmuls hit the MXU once per sequence instead of once per step,
* Pallas TPU kernels for the hot recurrent cells and dilated temporal convs,
* ``jax.sharding``-based data/sequence parallelism over a device ``Mesh``,
* host-side decoding (majority voting, scene aggregation, ARPA n-gram beam
  search) over device-computed log-probabilities.

Layer map (mirrors reference layering, SURVEY.md §1):
  data/      <- reference data_utils.py      (L1)
  models/    <- reference networks.py        (L2)
  train/     <- reference train.py           (L3)
  infer/     <- reference inference*.py      (L4)
  lm/        <- reference kenlm usage + lm_generation.py (L5)
  ops/, parallel/  -> new, TPU-native compute + sharding layers
"""

__version__ = "0.1.0"

N_FEAT = 400  # I3D feature dimension (reference data_utils.py:147 loadtxt width)
TARGET_PAD = -1  # padding label (reference train.py:12)
