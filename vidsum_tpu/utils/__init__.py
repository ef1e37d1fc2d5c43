from vidsum_tpu.utils.meters import AverageMeter
from vidsum_tpu.utils.io import load_json, load_yaml

__all__ = ["AverageMeter", "load_json", "load_yaml"]
