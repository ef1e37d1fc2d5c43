from vidsum_tpu.export.summary_json import write_summary_json, summaries_for_dataset
from vidsum_tpu.export.attention import (
    collect_attention_weights, save_attention_weights,
)
from vidsum_tpu.export.frames import generate_video_frames, reduce_fps_and_save

__all__ = [
    "write_summary_json", "summaries_for_dataset",
    "collect_attention_weights", "save_attention_weights",
    "generate_video_frames", "reduce_fps_and_save",
]
