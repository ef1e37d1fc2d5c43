from vidsum_tpu.preprocess.googlenet import (
    googlenet_apply, init_googlenet, googlenet_from_torch_state,
    fold_googlenet,
)
from vidsum_tpu.preprocess.r3d import (
    r3d18_apply, init_r3d18, r3d18_from_torch_state, fold_r3d18,
)
from vidsum_tpu.preprocess.transforms import (
    imagenet_normalize, video_normalize, resize_shorter_side,
)
from vidsum_tpu.preprocess.reduce_fps import reduce_fps
from vidsum_tpu.preprocess.extract import (
    get_google_net_features, get_video_feature, FeatureExtractor,
)

__all__ = [
    "googlenet_apply", "init_googlenet", "googlenet_from_torch_state",
    "fold_googlenet",
    "r3d18_apply", "init_r3d18", "r3d18_from_torch_state", "fold_r3d18",
    "imagenet_normalize", "video_normalize", "resize_shorter_side",
    "reduce_fps", "get_google_net_features", "get_video_feature",
    "FeatureExtractor",
]
