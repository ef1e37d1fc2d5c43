"""vidsum_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-summarization framework.

A from-scratch rebuild of the capabilities of the reference PyTorch repo
(BerserkerMother/Video-Summarization): a transformer frame-importance scorer
trained in two stages (DINO-style self-supervised pretraining + supervised
masked-MSE finetuning) over precomputed CNN frame features, evaluated with the
canonical KTS shot segmentation + 0/1-knapsack summary pipeline on the DSNet
SumMe/TVSum 5-fold splits.

Layout
------
- ``vidsum_tpu.ops``       : pure compute ops — knapsack/summary/metrics/KTS,
  Pallas attention kernels, losses (reference: ``src/evaluation/``, hot loops).
- ``vidsum_tpu.models``    : SimNet scorer + pretrain objective as pure
  functions over param pytrees (reference: ``src/model/``).
- ``vidsum_tpu.data``      : HDF5 datasets, DSNet split configs, padded-bucket
  collation (reference: ``src/data/``).
- ``vidsum_tpu.train``     : jitted train/eval steps, LR schedules,
  checkpointing, finetune/pretrain drivers (reference: ``src/train.py``,
  ``src/pretrain.py``, ``src/schedular.py``).
- ``vidsum_tpu.parallel``  : device meshes + sharding rules (dp/tp) for
  ``jax.jit`` over ``jax.sharding.Mesh`` (no reference analogue — the
  reference is single-GPU).
- ``vidsum_tpu.preprocess``: offline dataset creation — fps reduction, CNN
  feature extraction, KTS/uniform segmentation (reference:
  ``src/data/preprocess/``).
- ``vidsum_tpu.native``    : C++ host-side eval runtime (knapsack + KTS
  scatter DP) loaded via ctypes.
"""

__version__ = "0.1.0"

from vidsum_tpu import config  # noqa: F401
