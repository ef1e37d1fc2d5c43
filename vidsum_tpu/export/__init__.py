from vidsum_tpu.export.summary_json import write_summary_json, summaries_for_dataset

__all__ = ["write_summary_json", "summaries_for_dataset"]
