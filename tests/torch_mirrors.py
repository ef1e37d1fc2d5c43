"""Plain-torch mirrors of the torchvision GoogLeNet / R3D-18 structures
(attribute names chosen so ``state_dict()`` keys match torchvision's layout).

torchvision itself is not installed in this environment; these mirrors let
the tests validate the JAX implementations + weight converters numerically:
random torch weights → converter → JAX forward must equal torch forward.
"""

import torch
from torch import nn


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class Inception(nn.Module):
    def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.branch1 = BasicConv2d(cin, c1, kernel_size=1)
        self.branch2 = nn.Sequential(
            BasicConv2d(cin, c3r, kernel_size=1),
            BasicConv2d(c3r, c3, kernel_size=3, padding=1))
        self.branch3 = nn.Sequential(
            BasicConv2d(cin, c5r, kernel_size=1),
            BasicConv2d(c5r, c5, kernel_size=3, padding=1))
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(cin, pp, kernel_size=1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x), self.branch3(x),
                          self.branch4(x)], 1)


class GoogLeNetMirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
        self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)

    def forward(self, x):
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        x = self.maxpool3(self.inception3b(self.inception3a(x)))
        x = self.inception4e(self.inception4d(self.inception4c(
            self.inception4b(self.inception4a(x)))))
        x = self.maxpool4(x)
        x = self.inception5b(self.inception5a(x))
        return x.mean(dim=(2, 3))  # pool5


def conv3x3x3(cin, cout, stride=1):
    return nn.Conv3d(cin, cout, 3, stride=stride, padding=1, bias=False)


class VideoBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(conv3x3x3(cin, cout, stride),
                                   nn.BatchNorm3d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(conv3x3x3(cout, cout),
                                   nn.BatchNorm3d(cout))
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm3d(cout))

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        sc = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + sc)


class R3D18Mirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3),
                      bias=False),
            nn.BatchNorm3d(64), nn.ReLU())
        self.layer1 = nn.Sequential(VideoBasicBlock(64, 64),
                                    VideoBasicBlock(64, 64))
        self.layer2 = nn.Sequential(VideoBasicBlock(64, 128, 2),
                                    VideoBasicBlock(128, 128))
        self.layer3 = nn.Sequential(VideoBasicBlock(128, 256, 2),
                                    VideoBasicBlock(256, 256))
        self.layer4 = nn.Sequential(VideoBasicBlock(256, 512, 2),
                                    VideoBasicBlock(512, 512))

    def forward(self, x):
        x = self.stem(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3, 4))


def randomize_bn_stats(model, seed=0):
    """Give BN layers nontrivial running stats so parity tests are strict."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def _keep_drop(x, keep_mask, rate):
    """Dropout with an externally supplied boolean keep mask (mirrors
    vidsum_tpu.models.simnet._apply_keep for lockstep parity tests)."""
    if rate == 0.0:
        return x
    return torch.where(keep_mask, x / (1.0 - rate), torch.zeros_like(x))


class ScorerAttention(nn.Module):
    """Reference-semantics MHA: separate q/k/v, scale d_model**-0.5,
    key-mask -inf fill, weight dropout, output projection."""

    def __init__(self, d_model, num_heads, dropout):
        super().__init__()
        self.h = num_heads
        self.scale = d_model ** -0.5
        self.q = nn.Linear(d_model, d_model)
        self.k = nn.Linear(d_model, d_model)
        self.v = nn.Linear(d_model, d_model)
        self.dropout = nn.Dropout(dropout)
        self.feature_projection = nn.Linear(d_model, d_model)

    def forward(self, x, mask=None, attn_keep=None):
        B, N, D = x.shape
        q = self.q(x).view(B, N, self.h, -1).transpose(1, 2)
        k = self.k(x).view(B, N, self.h, -1).transpose(1, 2)
        v = self.v(x).view(B, N, self.h, -1).transpose(1, 2)
        s = q @ k.transpose(2, 3) * self.scale
        if mask is not None:
            s = s.masked_fill(mask[:, None, None, :], float("-inf"))
        w = torch.softmax(s, dim=3)
        if attn_keep is not None:
            w = _keep_drop(w, attn_keep, self.dropout.p)
        else:
            w = self.dropout(w)
        out = (w @ v).transpose(1, 2).reshape(B, N, D)
        return self.feature_projection(out)


class ScorerBlock(nn.Module):
    """Post-LN transformer block with reference naming (sa/mlp/norm1/norm2)."""

    def __init__(self, d_model, num_heads, dropout):
        super().__init__()
        self.sa = ScorerAttention(d_model, num_heads, dropout)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(d_model, 4 * d_model)
        self.mlp.fc2 = nn.Linear(4 * d_model, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.drop = nn.Dropout(dropout)

    def forward(self, x, mask=None, masks=None):
        if masks is None:
            x = self.norm1(self.drop(self.sa(x, mask)) + x)
            h = self.mlp.fc2(self.drop(torch.relu(self.mlp.fc1(x))))
            return self.norm2(self.drop(h) + x)
        p = self.drop.p
        sa = self.sa(x, mask, attn_keep=masks["attn"])
        x = self.norm1(_keep_drop(sa, masks["res1"], p) + x)
        h = _keep_drop(torch.relu(self.mlp.fc1(x)), masks["mlp"], p)
        h = self.mlp.fc2(h)
        return self.norm2(_keep_drop(h, masks["res2"], p) + x)


class ScorerMirror(nn.Module):
    """Reference-keyed SimNet mirror (embedding_layer.feature_transform,
    encoder.module_list.N, final_layer) for checkpoint-converter tests."""

    def __init__(self, d_model=64, num_heads=4, num_layers=2, dropout=0.1,
                 max_len=256, in_features=1024):
        super().__init__()
        import math as _math
        self.embedding_layer = nn.Module()
        self.embedding_layer.feature_transform = nn.Linear(in_features,
                                                           d_model)
        pos = torch.arange(max_len).unsqueeze(1)
        ang = torch.exp(-torch.arange(0, d_model, 2)
                        * _math.log(10000.0) / d_model)
        pe = torch.zeros(max_len, d_model)
        pe[:, 0::2] = torch.sin(pos * ang)
        pe[:, 1::2] = torch.cos(pos * ang)
        self.register_buffer("pe", pe)
        self.encoder = nn.Module()
        self.encoder.module_list = nn.ModuleList(
            [ScorerBlock(d_model, num_heads, dropout)
             for _ in range(num_layers)])
        self.final_layer = nn.Linear(d_model, 1)

    def forward(self, x, mask=None, dropout_masks=None):
        h = self.embedding_layer.feature_transform(x)
        h = h + self.pe[: h.shape[1]].unsqueeze(0)
        for i, block in enumerate(self.encoder.module_list):
            h = block(h, mask,
                      dropout_masks[i] if dropout_masks is not None else None)
        return self.final_layer(h), h


class PretrainMirror(nn.Module):
    """Reference-semantics PretrainModel mirror: ScorerMirror encoder +
    Linear d_model→512 video transform, the three losses of
    ``src/model/simnet_pretrain.py:35-100`` (masked -inf softmax over frames,
    sharpening temperature, entropy of mixture+1e-9, off-diagonal cosine
    repelling, softmax-vs-softmax cross-entropy)."""

    def __init__(self, d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                 max_len=256, in_features=1024, sharpening_t=0.4,
                 video_dim=512):
        super().__init__()
        self.encoder = ScorerMirror(d_model, num_heads, num_layers, dropout,
                                    max_len, in_features)
        self.video_transform = nn.Linear(d_model, video_dim)
        self.t = sharpening_t

    def forward(self, x, video_rep, mask):
        scores, feats = self.encoder(x, mask)
        feats = self.video_transform(feats)

        xm = feats * (~mask).unsqueeze(2)
        xn = xm / (xm.norm(dim=2, keepdim=True) + 1e-9)
        sim = torch.matmul(xn, xn.transpose(1, 2))
        eye = (torch.eye(x.shape[1]) == 0).float().unsqueeze(0)
        repel = (sim * eye).mean(dim=1).mean()

        s = scores.masked_fill(mask.unsqueeze(2), float("-inf"))
        mixture = torch.softmax(s / self.t, dim=1)
        ent = (mixture + 1e-9) * torch.log(mixture + 1e-9)
        ent = ent.masked_fill(mask.unsqueeze(2), 0.0)
        center = ent.mean(dim=1).mean()

        agg = torch.matmul(mixture.transpose(1, 2), feats).squeeze(1)
        p1 = torch.softmax(agg, dim=1)
        p2 = torch.softmax(video_rep, dim=1)
        main = (-p2 * torch.log(p1)).mean()
        return main, center, repel
