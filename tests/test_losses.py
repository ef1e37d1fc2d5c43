import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import ModelConfig, PretrainConfig
from vidsum_tpu.models.pretrain import init_pretrain_model, pretrain_apply
from vidsum_tpu.ops.losses import (
    entropy_centering, mse_with_mask_loss, repelling_loss, soft_cross_entropy,
)


def test_masked_mse_hand_case():
    # two videos, lengths 2 and 3 → the reference pads both to 3
    # (pad_sequence) and loss.mean() divides by B·3 (utils.py:54)
    out = jnp.array([[[1.0], [2.0], [5.0]],
                     [[3.0], [1.0], [2.0]]])     # (2, 3, 1)
    tgt = jnp.array([[0.0, 1.0, 7.0],
                     [2.0, 1.0, 2.0]])           # (2, 3)
    mask = jnp.array([[False, False, True],
                      [False, False, False]])
    want = ((1 - 0) ** 2 + (2 - 1) ** 2 + 0
            + (3 - 2) ** 2 + 0 + 0) / (2 * 3)
    assert abs(float(mse_with_mask_loss(out, tgt, mask)) - want) < 1e-6


def test_masked_mse_bucket_padding_invariant():
    """The SAME videos padded to the reference's max-in-batch length vs our
    128-style bucket must give the identical loss — the denominator is the
    reference pad length, not the padded width (round-3 fix; the reference's
    loss.mean() runs over max-in-batch-padded tensors, utils.py:45-56)."""
    rng = np.random.default_rng(40)
    lens = [5, 9, 7]
    outs = [rng.normal(size=(n, 1)).astype(np.float32) for n in lens]
    tgts = [rng.random(n).astype(np.float32) for n in lens]

    def padded(width):
        o = np.zeros((3, width, 1), np.float32)
        t = np.full((3, width), 1000.0, np.float32)
        m = np.ones((3, width), bool)
        for i, n in enumerate(lens):
            o[i, :n] = outs[i]
            t[i, :n] = tgts[i]
            m[i, :n] = False
        return jnp.asarray(o), jnp.asarray(t), jnp.asarray(m)

    ref = float(mse_with_mask_loss(*padded(9)))     # reference padding
    bucket = float(mse_with_mask_loss(*padded(16)))  # our bucket padding
    assert abs(ref - bucket) < 1e-7
    # and the value equals the torch-semantics mean over B·max_len
    num = sum(((o[:, 0] - t[:n]) ** 2).sum()
              for o, t, n in zip(outs, tgts, lens))
    assert abs(ref - num / (3 * 9)) < 1e-6


def test_masked_mse_sum_reduction():
    out = jnp.array([[[1.0], [2.0]]])
    tgt = jnp.array([[0.0, 0.0]])
    mask = jnp.zeros((1, 2), bool)
    assert abs(float(mse_with_mask_loss(out, tgt, mask, "sum")) - 5.0) < 1e-6


def test_masked_mse_pad_target_ignored():
    """Padded targets (sentinel 1000) must not leak into the loss."""
    out = jnp.array([[[1.0], [99.0]]])
    tgt = jnp.array([[1.0, 1000.0]])
    mask = jnp.array([[False, True]])
    assert abs(float(mse_with_mask_loss(out, tgt, mask))) < 1e-6


def test_soft_cross_entropy_vs_numpy():
    rng = np.random.default_rng(30)
    x1 = rng.normal(size=(4, 6)).astype(np.float32)
    x2 = rng.normal(size=(4, 6)).astype(np.float32)

    def softmax(a):
        e = np.exp(a - a.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    want = (-softmax(x2) * np.log(softmax(x1))).mean()
    got = float(soft_cross_entropy(jnp.asarray(x1), jnp.asarray(x2)))
    assert abs(got - want) < 1e-5


def test_entropy_centering_uniform_vs_peaked():
    # entropy term x·log(x) is minimized (most negative) for uniform scores
    uniform = jnp.full((1, 4, 1), 0.25) + 1e-9
    peaked = jnp.array([0.97, 0.01, 0.01, 0.01]).reshape(1, 4, 1) + 1e-9
    assert float(entropy_centering(uniform, None)) < \
        float(entropy_centering(peaked, None))


def test_repelling_loss_identical_vs_orthogonal():
    identical = jnp.ones((1, 3, 4))
    eye = jnp.eye(3, 4)[None]
    assert float(repelling_loss(identical, None)) > \
        float(repelling_loss(eye, None)) + 0.5


def test_repelling_loss_vs_numpy_oracle():
    rng = np.random.default_rng(31)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    mask = np.zeros((2, 5), bool)
    mask[1, 3:] = True
    xm = x * (~mask)[..., None]
    xn = xm / (np.linalg.norm(xm, axis=2, keepdims=True) + 1e-9)
    sim = np.einsum("bnd,bmd->bnm", xn, xn)
    sim = sim * (np.eye(5) == 0)[None]
    want = sim.mean(axis=1).mean()
    got = float(repelling_loss(jnp.asarray(x), jnp.asarray(mask)))
    assert abs(got - want) < 1e-5


def test_pretrain_losses_finite_and_grads_flow():
    mcfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                       max_len=64)
    pcfg = PretrainConfig()
    params = init_pretrain_model(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(32)
    x = jnp.asarray(rng.normal(size=(2, 10, 1024)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(2, 512)), jnp.float32)
    mask = jnp.zeros((2, 10), bool).at[1, 7:].set(True)

    def total(p):
        m, c, r = pretrain_apply(p, mcfg, pcfg, x, vid, mask)
        return m + 0.5 * c + 1.0 * r

    loss, grads = jax.value_and_grad(total)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_pretrain_mask_blocks_padded_frames():
    """Fully padded frames must not change the three losses."""
    mcfg = ModelConfig(d_model=32, num_heads=4, num_layers=1, dropout=0.0,
                       max_len=64)
    pcfg = PretrainConfig()
    params = init_pretrain_model(jax.random.PRNGKey(1), mcfg)
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.normal(size=(1, 8, 1024)), jnp.float32)
    vid = jnp.asarray(rng.normal(size=(1, 512)), jnp.float32)
    m0 = jnp.zeros((1, 8), bool)
    a = pretrain_apply(params, mcfg, pcfg, x, vid, m0)

    x_pad = jnp.concatenate([x, jnp.full((1, 4, 1024), 1000.0)], axis=1)
    m_pad = jnp.concatenate([m0, jnp.ones((1, 4), bool)], axis=1)
    b = pretrain_apply(params, mcfg, pcfg, x_pad, vid, m_pad)
    # ALL THREE losses must be invariant to extra bucket padding: center and
    # repel divide by the reference pad length (max true length), not the
    # padded width (round-3 denominator fix, ops/losses.py docstring).
    for la, lb, name in zip(a, b, ("main", "center", "repel")):
        assert abs(float(la) - float(lb)) < 1e-5, name


def test_pretrain_losses_match_torch_semantics():
    """The three pretrain losses computed with torch ops (reference
    semantics: masked -inf softmax over frames, sharpening 0.4, entropy of
    mixture+1e-9, off-diagonal cosine mean, softmax-vs-softmax CE) must equal
    the JAX implementation on identical inputs."""
    import torch

    rng = np.random.default_rng(60)
    B, N, D, R = 2, 7, 6, 5
    scores_np = rng.normal(size=(B, N, 1)).astype(np.float32)
    feats_np = rng.normal(size=(B, N, R)).astype(np.float32)
    vid_np = rng.normal(size=(B, R)).astype(np.float32)
    mask_np = np.zeros((B, N), bool)
    mask_np[1, 5:] = True
    t_sharp = 0.4

    # torch-side computation
    scores = torch.tensor(scores_np)
    feats = torch.tensor(feats_np)
    vid = torch.tensor(vid_np)
    mask = torch.tensor(mask_np)

    x = feats * (~mask).unsqueeze(2)
    xn = x / (x.norm(dim=2, keepdim=True) + 1e-9)
    sim = torch.matmul(xn, xn.transpose(1, 2))
    sim = sim * (torch.eye(N) == 0).float().unsqueeze(0)
    want_repel = sim.mean(dim=1).mean().item()

    s = scores.masked_fill(mask.unsqueeze(2), float("-inf"))
    mixture = torch.softmax(s / t_sharp, dim=1)
    ent = (mixture + 1e-9) * torch.log(mixture + 1e-9)
    ent = ent.masked_fill(mask.unsqueeze(2), 0.0)
    want_center = ent.mean(dim=1).mean().item()

    agg = torch.matmul(mixture.transpose(1, 2), feats).squeeze(1)
    p1 = torch.softmax(agg, dim=1)
    p2 = torch.softmax(vid, dim=1)
    want_main = (-p2 * torch.log(p1)).mean().item()

    # JAX-side
    got_repel = float(repelling_loss(jnp.asarray(feats_np),
                                     jnp.asarray(mask_np)))
    sj = jnp.where(jnp.asarray(mask_np)[..., None], -jnp.inf,
                   jnp.asarray(scores_np))
    mixture_j = jax.nn.softmax(sj / t_sharp, axis=1)
    got_center = float(entropy_centering(mixture_j + 1e-9,
                                         jnp.asarray(mask_np)))
    agg_j = jnp.einsum("bnc,bnd->bcd", mixture_j,
                       jnp.asarray(feats_np)).squeeze(1)
    got_main = float(soft_cross_entropy(agg_j, jnp.asarray(vid_np)))

    assert abs(got_repel - want_repel) < 1e-5
    assert abs(got_center - want_center) < 1e-5
    assert abs(got_main - want_main) < 1e-5
