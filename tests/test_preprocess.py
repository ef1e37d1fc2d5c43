import numpy as np
import pytest
import torch

from vidsum_tpu.preprocess.googlenet import (
    googlenet_apply, googlenet_from_torch_state, init_googlenet,
)
from vidsum_tpu.preprocess.r3d import (
    init_r3d18, r3d18_apply, r3d18_from_torch_state,
)
from vidsum_tpu.preprocess.nn import maxpool2d_ceil
from vidsum_tpu.preprocess.transforms import (
    imagenet_normalize, prepare_video, resize_shorter_side, video_normalize,
)
from tests.torch_mirrors import GoogLeNetMirror, R3D18Mirror, randomize_bn_stats


def to_numpy_state(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def test_googlenet_matches_torch_mirror():
    """JAX GoogLeNet + converter must reproduce the torch forward exactly
    (same arch as torchvision, random weights, nontrivial BN stats)."""
    torch.manual_seed(0)
    mirror = GoogLeNetMirror().eval()
    randomize_bn_stats(mirror, 1)
    params = googlenet_from_torch_state(to_numpy_state(mirror))

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = mirror(x).numpy()
    got = np.asarray(googlenet_apply(params, x.permute(0, 2, 3, 1).numpy()))
    assert got.shape == (2, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_googlenet_224_shape():
    params = init_googlenet(__import__("jax").random.PRNGKey(0))
    x = np.zeros((1, 224, 224, 3), np.float32)
    out = googlenet_apply(params, x)
    assert out.shape == (1, 1024)


def test_r3d18_matches_torch_mirror():
    torch.manual_seed(2)
    mirror = R3D18Mirror().eval()
    randomize_bn_stats(mirror, 3)
    params = r3d18_from_torch_state(to_numpy_state(mirror))

    x = torch.randn(1, 3, 8, 64, 64)
    with torch.no_grad():
        want = mirror(x).numpy()
    got = np.asarray(r3d18_apply(params, x.permute(0, 2, 3, 4, 1).numpy()))
    assert got.shape == (1, 512)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_r3d18_random_init_shape():
    params = init_r3d18(__import__("jax").random.PRNGKey(1))
    out = r3d18_apply(params, np.zeros((1, 4, 32, 32, 3), np.float32))
    assert out.shape == (1, 512)


@pytest.mark.parametrize("hw,k,s,p", [((112, 112), 3, 2, 0),
                                      ((55, 67), 3, 2, 0),
                                      ((14, 14), 2, 2, 0),
                                      ((28, 30), 3, 1, 1)])
def test_maxpool_ceil_matches_torch(hw, k, s, p):
    x = torch.randn(1, 5, *hw)
    want = torch.nn.functional.max_pool2d(x, k, stride=s, padding=p,
                                          ceil_mode=True).numpy()
    got = np.asarray(maxpool2d_ceil(x.permute(0, 2, 3, 1).numpy(), k, s, p))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-6)


def test_resize_shorter_side():
    frame = np.random.default_rng(0).integers(0, 255, (120, 240, 3),
                                              dtype=np.uint8)
    out = resize_shorter_side(frame, 60)
    assert out.shape == (60, 120, 3)
    out = resize_shorter_side(frame.transpose(1, 0, 2), 60)
    assert out.shape == (120, 60, 3)


def test_normalization_values():
    x = np.full((2, 2, 3), 255, np.uint8)
    out = imagenet_normalize(x)
    np.testing.assert_allclose(out[0, 0], (1 - np.array([0.485, 0.456, 0.406]))
                               / np.array([0.229, 0.224, 0.225]), rtol=1e-5)
    out = video_normalize(x)
    np.testing.assert_allclose(
        out[0, 0], (1 - np.array([0.43216, 0.394666, 0.37645]))
        / np.array([0.22803, 0.22145, 0.216989]), rtol=1e-5)


def test_prepare_video():
    video = np.random.default_rng(1).integers(0, 255, (3, 48, 64, 3),
                                              dtype=np.uint8)
    out = prepare_video(video, 32, "google")
    assert out.shape == (3, 32, 43, 3) and out.dtype == np.float32
