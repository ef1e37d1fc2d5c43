from vidsum_tpu.ops.knapsack import knapsack, knapsack_jax
from vidsum_tpu.ops.summary import generate_summary, upsample
from vidsum_tpu.ops.metrics import evaluate_summary, evaluate_scores, eval_metrics
from vidsum_tpu.ops.segmentation import uniform_segmentation
from vidsum_tpu.ops.kts import calc_scatters, cpd_nonlin, kts_segmentation

__all__ = [
    "knapsack", "knapsack_jax",
    "generate_summary", "upsample",
    "evaluate_summary", "evaluate_scores", "eval_metrics",
    "uniform_segmentation",
    "calc_scatters", "cpd_nonlin", "kts_segmentation",
]
