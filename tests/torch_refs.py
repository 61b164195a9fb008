"""Independent PyTorch reference implementations used ONLY by tests.

These mirror the torchvision/smp architectures (and their state-dict naming)
so we can validate that our flax models + checkpoint converter reproduce the
numerics of torch checkpoints, without torchvision/smp being installed.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TResNet34Encoder(nn.Module):
    """torchvision resnet34 layout, smp-encoder forward (6 features)."""

    def __init__(self, in_channels=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def make_layer(cin, cout, n, stride):
            blocks = [TBasicBlock(cin, cout, stride)]
            blocks += [TBasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(64, 128, 4, 2)
        self.layer3 = make_layer(128, 256, 6, 2)
        self.layer4 = make_layer(256, 512, 3, 2)
        self.out_channels = (in_channels, 64, 64, 128, 256, 512)

    def forward(self, x):
        feats = [x]
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.layer1(self.maxpool(x))
        feats.append(x)
        x = self.layer2(x)
        feats.append(x)
        x = self.layer3(x)
        feats.append(x)
        x = self.layer4(x)
        feats.append(x)
        return feats


class TConv2dReLU(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(
            nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )


class TUnetDecoderBlock(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.conv1 = TConv2dReLU(cin + cskip, cout)
        self.conv2 = TConv2dReLU(cout, cout)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class TUnetDecoder(nn.Module):
    """smp UnetDecoder layout for encoder depth 5."""

    def __init__(self, encoder_channels, decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        head = enc[0]
        skips = enc[1:] + [0]
        ins = [head] + list(decoder_channels[:-1])
        self.blocks = nn.ModuleList(
            [TUnetDecoderBlock(i, s, o) for i, s, o in zip(ins, skips, decoder_channels)]
        )

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x = feats[0]
        skips = feats[1:]
        for i, b in enumerate(self.blocks):
            x = b(x, skips[i] if i < len(skips) else None)
        return x


class TSegmentationHead(nn.Sequential):
    def __init__(self, cin, classes, kernel_size=3):
        super().__init__(nn.Conv2d(cin, classes, kernel_size, padding=kernel_size // 2))


class TUnetResNet34(nn.Module):
    """smp ``Unet(encoder_name='resnet34')`` equivalent: encoder/decoder/head."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        self.decoder = TUnetDecoder(self.encoder.out_channels)
        self.segmentation_head = TSegmentationHead(16, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# Swin Transformer v1 (timm 1.x layout) reference
# ---------------------------------------------------------------------------


def _t_rel_pos_index(ws, table_w=None):
    table_w = table_w or ws
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij"))
    coords = coords.flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += table_w - 1
    rel[:, :, 1] += table_w - 1
    rel[:, :, 0] *= 2 * table_w - 1
    return rel.sum(-1)


def _t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _t_window_reverse(x, ws, H, W):
    C = x.shape[-1]
    x = x.view(-1, H // ws, W // ws, ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


class TWindowAttention(nn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02
        )
    def forward(self, x, mask=None):
        B_, N, C = x.shape
        wa = int(N ** 0.5)
        rpi = _t_rel_pos_index(wa, self.ws)
        qkv = self.qkv(x).reshape(B_, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[rpi.view(-1)].view(
            N, N, -1
        ).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) + mask[None, :, None]
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class TSwinBlock(nn.Module):
    def __init__(self, dim, num_heads, ws, shift):
        super().__init__()
        self.dim, self.ws_target, self.shift_flag = dim, ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, num_heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        ws = min(self.ws_target, H, W)
        ss = ws // 2 if (self.shift_flag and min(H, W) > ws) else 0
        shortcut = x
        y = self.norm1(x)
        if ss:
            y = torch.roll(y, (-ss, -ss), dims=(1, 2))
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            y = F.pad(y, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        windows = _t_window_partition(y, ws)
        mask = None
        if ss:
            img_mask = torch.zeros(Hp, Wp)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                    img_mask[hs, wsl] = cnt
                    cnt += 1
            mw = img_mask.view(Hp // ws, ws, Wp // ws, ws).permute(0, 2, 1, 3).reshape(-1, ws * ws)
            mask = mw[:, None, :] - mw[:, :, None]
            mask = torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))
        aw = self.attn(windows, mask)
        y = _t_window_reverse(aw, ws, Hp, Wp)
        y = y[:, :H, :W, :]
        if ss:
            y = torch.roll(y, (ss, ss), dims=(1, 2))
        x = shortcut + y
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
            B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).permute(0, 1, 3, 4, 2, 5).flatten(3)
        return self.reduction(self.norm(x))


class TSwinEncoder(nn.Module):
    """timm-1.x-style swin; smp TimmUniversalEncoder feature output."""

    def __init__(self, in_channels=3, embed_dim=32, depths=(2, 2, 2, 2),
                 num_heads=(2, 4, 8, 16), ws=4):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(in_channels, embed_dim, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(embed_dim)
        self.layers = nn.ModuleList()
        for i, (d, h) in enumerate(zip(depths, num_heads)):
            dim = embed_dim * 2 ** i
            layer = nn.Module()
            if i > 0:
                layer.downsample = TPatchMerging(dim // 2)
            layer.blocks = nn.ModuleList(
                [TSwinBlock(dim, h, ws, shift=(j % 2 == 1)) for j in range(d)]
            )
            self.layers.append(layer)

    def forward(self, x):  # NCHW in, list of NCHW features out
        feats = [x]
        B, C, H, W = x.shape
        feats.append(torch.zeros(B, 0, H // 2, W // 2))
        y = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        y = self.patch_embed.norm(y)
        for layer in self.layers:
            if hasattr(layer, "downsample"):
                y = layer.downsample(y)
            for blk in layer.blocks:
                y = blk(y)
            feats.append(y.permute(0, 3, 1, 2))
        return feats


# ---------------------------------------------------------------------------
# U-TAE reference (independent implementation of the utae-paps architecture)
# ---------------------------------------------------------------------------
import numpy as np


class TConvLayer(nn.Module):
    def __init__(self, nkernels, norm="batch", k=3, s=1, p=1, n_groups=4,
                 last_relu=True, padding_mode="reflect"):
        super().__init__()
        layers = []
        if norm == "batch":
            nl = nn.BatchNorm2d
        elif norm == "instance":
            nl = nn.InstanceNorm2d
        elif norm == "group":
            nl = lambda c: nn.GroupNorm(num_channels=c, num_groups=n_groups)
        else:
            nl = None
        for i in range(len(nkernels) - 1):
            layers.append(nn.Conv2d(nkernels[i], nkernels[i + 1], k, s, p,
                                    padding_mode=padding_mode))
            if nl is not None:
                layers.append(nl(nkernels[i + 1]))
            if last_relu or i < len(nkernels) - 2:
                layers.append(nn.ReLU())
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return self.conv(x)


class TShared(nn.Module):
    def __init__(self, pad_value=None):
        super().__init__()
        self.pad_value = pad_value

    def smart_forward(self, x):
        if x.dim() == 4:
            return self.forward(x)
        b, t, c, h, w = x.shape
        out = x.view(b * t, c, h, w)
        if self.pad_value is not None:
            pad_mask = (out == self.pad_value).all(-1).all(-1).all(-1)
            res = self.forward(out)
            res[pad_mask] = self.pad_value
            out = res
        else:
            out = self.forward(out)
        return out.view(b, t, *out.shape[1:])


class TConvBlock(TShared):
    def __init__(self, nkernels, pad_value=None, norm="batch", last_relu=True,
                 padding_mode="reflect"):
        super().__init__(pad_value)
        self.conv = TConvLayer(nkernels, norm=norm, last_relu=last_relu,
                               padding_mode=padding_mode)

    def forward(self, x):
        return self.conv(x)


class TDownConvBlock(TShared):
    def __init__(self, d_in, d_out, k, s, p, pad_value=None, norm="batch",
                 padding_mode="reflect"):
        super().__init__(pad_value)
        self.down = TConvLayer([d_in, d_in], norm, k, s, p, padding_mode=padding_mode)
        self.conv1 = TConvLayer([d_in, d_out], norm, padding_mode=padding_mode)
        self.conv2 = TConvLayer([d_out, d_out], norm, padding_mode=padding_mode)

    def forward(self, x):
        out = self.down(x)
        out = self.conv1(out)
        return out + self.conv2(out)


class TUpConvBlock(nn.Module):
    def __init__(self, d_in, d_out, k, s, p, d_skip=None, norm="batch",
                 padding_mode="reflect"):
        super().__init__()
        d = d_out if d_skip is None else d_skip
        self.skip_conv = nn.Sequential(nn.Conv2d(d, d, 1), nn.BatchNorm2d(d), nn.ReLU())
        self.up = nn.Sequential(
            nn.ConvTranspose2d(d_in, d_out, k, s, p), nn.BatchNorm2d(d_out), nn.ReLU()
        )
        self.conv1 = TConvLayer([d_out + d, d_out], norm, padding_mode=padding_mode)
        self.conv2 = TConvLayer([d_out, d_out], norm, padding_mode=padding_mode)

    def forward(self, x, skip):
        out = self.up(x)
        out = torch.cat([out, self.skip_conv(skip)], dim=1)
        out = self.conv1(out)
        return out + self.conv2(out)


class TPositionalEncoder(nn.Module):
    def __init__(self, d, T=1000, repeat=None):
        super().__init__()
        self.d, self.T, self.repeat = d, T, repeat
        self.denom = torch.pow(
            T, 2 * torch.div(torch.arange(d).float(), 2, rounding_mode="floor") / d
        )

    def forward(self, bp):
        table = bp[:, :, None] / self.denom[None, None, :]
        table[:, :, 0::2] = torch.sin(table[:, :, 0::2])
        table[:, :, 1::2] = torch.cos(table[:, :, 1::2])
        if self.repeat is not None:
            table = torch.cat([table] * self.repeat, dim=-1)
        return table


class TLTAE2d(nn.Module):
    def __init__(self, in_channels=128, n_head=16, d_k=4, mlp=(256, 128),
                 dropout=0.2, d_model=256, T=1000):
        super().__init__()
        self.n_head, self.d_k, self.d_model = n_head, d_k, d_model
        self.inconv = nn.Conv1d(in_channels, d_model, 1)
        self.positional_encoder = TPositionalEncoder(d_model // n_head, T, repeat=n_head)
        self.in_norm = nn.GroupNorm(n_head, in_channels)
        self.out_norm = nn.GroupNorm(n_head, mlp[-1])
        attn = nn.Module()
        attn.Q = nn.Parameter(torch.randn(n_head, d_k) * np.sqrt(2.0 / d_k))
        attn.fc1_k = nn.Linear(d_model, n_head * d_k)
        self.attention_heads = attn
        self.mlp = nn.Sequential(nn.Linear(mlp[0], mlp[1]), nn.BatchNorm1d(mlp[1]), nn.ReLU())
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, batch_positions=None, pad_mask=None):
        b, t, d, h, w = x.shape
        nh, dk, dm = self.n_head, self.d_k, self.d_model
        if pad_mask is not None:
            pm = pad_mask.unsqueeze(-1).repeat(1, 1, h).unsqueeze(-1).repeat(1, 1, 1, w)
            pm = pm.permute(0, 2, 3, 1).reshape(b * h * w, t)
        out = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, t, d)
        out = self.in_norm(out.permute(0, 2, 1)).permute(0, 2, 1)
        out = self.inconv(out.permute(0, 2, 1)).permute(0, 2, 1)
        bp = batch_positions.unsqueeze(-1).repeat(1, 1, h).unsqueeze(-1).repeat(1, 1, 1, w)
        bp = bp.permute(0, 2, 3, 1).reshape(b * h * w, t)
        out = out + self.positional_encoder(bp)
        # attention
        q = self.attention_heads.Q  # (nh, dk)
        k = self.attention_heads.fc1_k(out).view(b * h * w, t, nh, dk)
        logits = torch.einsum("hd,nthd->nht", q, k) / np.sqrt(dk)
        if pad_mask is not None:
            logits = logits.masked_fill(pm[:, None, :], -1e3)
        attn = torch.softmax(logits, dim=-1)
        v = out.view(b * h * w, t, nh, dm // nh)
        o = torch.einsum("nht,nthd->nhd", attn, v).reshape(b * h * w, dm)
        o = self.dropout(self.mlp(o))
        o = self.out_norm(o)
        o = o.view(b, h, w, -1).permute(0, 3, 1, 2)
        attn = attn.permute(1, 0, 2).reshape(nh, b, h, w, t).permute(0, 1, 4, 2, 3)
        return o, attn


class TTemporalAggregator(nn.Module):
    def __init__(self, mode="att_group"):
        super().__init__()
        self.mode = mode

    def forward(self, x, pad_mask=None, attn_mask=None):
        use_mask = pad_mask is not None and pad_mask.any()
        if self.mode == "att_group":
            nh, b, t, h, w = attn_mask.shape
            attn = attn_mask.reshape(nh * b, t, h, w)
            if x.shape[-2] > w:
                attn = nn.Upsample(size=x.shape[-2:], mode="bilinear",
                                   align_corners=False)(attn)
            else:
                attn = nn.AvgPool2d(kernel_size=w // x.shape[-2])(attn)
            attn = attn.view(nh, b, t, *x.shape[-2:])
            if use_mask:
                attn = attn * (~pad_mask).float()[None, :, :, None, None]
            out = torch.stack(x.chunk(nh, dim=2))  # (nh, B, T, C/nh, H, W)
            out = (attn[:, :, :, None, :, :] * out).sum(dim=2)
            return torch.cat([g for g in out], dim=1)
        if self.mode == "mean":
            if use_mask:
                out = x * (~pad_mask).float()[:, :, None, None, None]
                return out.sum(1) / (~pad_mask).sum(1)[:, None, None, None]
            return x.mean(1)
        raise ValueError(self.mode)


class TUTAE(nn.Module):
    def __init__(self, input_dim, encoder_widths=(64, 64, 64, 128),
                 decoder_widths=(32, 32, 64, 128), out_conv=(32, 20),
                 str_conv_k=4, str_conv_s=2, str_conv_p=1, agg_mode="att_group",
                 encoder_norm="group", n_head=16, d_model=256, d_k=4,
                 pad_value=0, padding_mode="reflect"):
        super().__init__()
        ew, dw = list(encoder_widths), list(decoder_widths)
        self.n_stages = len(ew)
        self.pad_value = pad_value
        self.in_conv = TConvBlock([input_dim, ew[0], ew[0]], pad_value,
                                  encoder_norm, padding_mode=padding_mode)
        self.down_blocks = nn.ModuleList(
            TDownConvBlock(ew[i], ew[i + 1], str_conv_k, str_conv_s, str_conv_p,
                           pad_value, encoder_norm, padding_mode)
            for i in range(self.n_stages - 1)
        )
        self.up_blocks = nn.ModuleList(
            TUpConvBlock(dw[i], dw[i - 1], str_conv_k, str_conv_s, str_conv_p,
                         d_skip=ew[i - 1], norm="batch", padding_mode=padding_mode)
            for i in range(self.n_stages - 1, 0, -1)
        )
        self.temporal_encoder = TLTAE2d(ew[-1], n_head=n_head, d_k=d_k,
                                        mlp=(d_model, ew[-1]), d_model=d_model)
        self.temporal_aggregator = TTemporalAggregator(agg_mode)
        self.out_conv = TConvBlock([dw[0]] + list(out_conv), padding_mode=padding_mode)

    def forward(self, x, batch_positions=None):
        pad_mask = (x == self.pad_value).all(-1).all(-1).all(-1)
        out = self.in_conv.smart_forward(x)
        feature_maps = [out]
        for blk in self.down_blocks:
            out = blk.smart_forward(feature_maps[-1])
            feature_maps.append(out)
        out, att = self.temporal_encoder(feature_maps[-1], batch_positions, pad_mask)
        maps = [out]
        for i, blk in enumerate(self.up_blocks):
            skip = self.temporal_aggregator(feature_maps[-(i + 2)], pad_mask, att)
            out = blk(out, skip)
            maps.append(out)
        return self.out_conv(out), maps


# ---------------------------------------------------------------------------
# UPerNet decoder + head reference (smp-0.4.0 structure: PSP 1/2/3/6 with
# align_corners=True pyramid resizes, nearest FPN top-down, concat
# bottleneck, x4 UpsamplingBilinear2d head)
# ---------------------------------------------------------------------------


class TConvBNReLU(nn.Sequential):
    def __init__(self, cin, cout, k=1):
        super().__init__(
            nn.Conv2d(cin, cout, k, 1, k // 2, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )


class TPSPBlock(nn.Module):
    def __init__(self, cin, cout, size):
        super().__init__()
        self.pool = nn.Sequential(
            nn.AdaptiveAvgPool2d(size),
            TConvBNReLU(cin, cout, 1),
        )

    def forward(self, x):
        h, w = x.shape[-2:]
        return F.interpolate(self.pool(x), size=(h, w), mode="bilinear",
                             align_corners=True)


class TPSPModule(nn.Module):
    def __init__(self, cin, cout, sizes=(1, 2, 3, 6)):
        super().__init__()
        branch = cin // len(sizes)
        self.blocks = nn.ModuleList(
            [TPSPBlock(cin, branch, s) for s in sizes]
        )
        self.out_conv = TConvBNReLU(cin + branch * len(sizes), cout, 1)

    def forward(self, x):
        ys = [blk(x) for blk in self.blocks]
        return self.out_conv(torch.cat(ys + [x], dim=1))


class TFPNBlock(nn.Module):
    def __init__(self, cskip, pyramid):
        super().__init__()
        self.skip_conv = TConvBNReLU(cskip, pyramid, 1)

    def forward(self, x, skip):
        skip = self.skip_conv(skip)
        x = F.interpolate(x, size=skip.shape[-2:], mode="nearest")
        return x + skip


class TUPerNetDecoder(nn.Module):
    def __init__(self, encoder_channels, pyramid=256, seg_channels=64):
        super().__init__()
        chans = list(encoder_channels[2:])  # drop input + dummy
        self.psp = TPSPModule(chans[-1], pyramid)
        self.fpn_stages = nn.ModuleList(
            [TFPNBlock(c, pyramid) for c in chans[:-1]]
        )
        self.fpn_bottleneck = TConvBNReLU(
            pyramid * len(chans), seg_channels, 3
        )

    def forward(self, *features):
        feats = list(features[2:])
        fpn = [self.psp(feats[-1])]
        for i in range(len(feats) - 2, -1, -1):
            fpn.append(self.fpn_stages[i](fpn[-1], feats[i]))
        th, tw = feats[0].shape[-2:]
        resized = [
            F.interpolate(f, size=(th, tw), mode="bilinear",
                          align_corners=False) if f.shape[-2:] != (th, tw)
            else f
            for f in fpn
        ]
        return self.fpn_bottleneck(torch.cat(resized, dim=1))


class TUPerNetHead(nn.Sequential):
    def __init__(self, cin, classes, upsampling=4):
        super().__init__(
            nn.Conv2d(cin, classes, 3, 1, 1),
            nn.UpsamplingBilinear2d(scale_factor=upsampling),
        )


class TSwinUPerNet(nn.Module):
    """smp-style container: encoder.model.<timm>, decoder.<upernet>,
    segmentation_head.<head> — key-compatible with SmpModel's flax tree."""

    def __init__(self, in_channels=3, classes=19, embed_dim=128,
                 depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), ws=12):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.model = TSwinEncoder(
            in_channels=in_channels, embed_dim=embed_dim, depths=depths,
            num_heads=num_heads, ws=ws,
        )
        out_ch = (in_channels, 0,
                  *(embed_dim * 2 ** i for i in range(len(depths))))
        self.decoder = TUPerNetDecoder(out_ch)
        self.segmentation_head = TUPerNetHead(64, classes)

    def forward(self, x):
        feats = self.encoder.model(x)
        return self.segmentation_head(self.decoder(*feats))


# ---------------------------------------------------------------------------
# FLAIR_HUB_Model multimodal reference: fusion case 4 (mono swin + UTAE TS)
# (reference flair_hub/models/flair_model.py:88-435 — forward, FusionHandler,
# aux decoders; state-dict key-compatible with FlairHubModel's flax tree)
# ---------------------------------------------------------------------------


def _interp(x, size):
    return F.interpolate(x, size=(size, size), mode="bilinear",
                         align_corners=False)


class _TDecoderWrapper(nn.Module):
    """FLAIR_Monotemp(return_type='decoder'): seg_model.decoder +
    seg_model.segmentation_head (upernet)."""

    def __init__(self, out_ch, classes, pyramid=256, seg_channels=64):
        super().__init__()
        self.seg_model = nn.Module()
        self.seg_model.decoder = TUPerNetDecoder(out_ch, pyramid=pyramid,
                                                 seg_channels=seg_channels)
        self.seg_model.segmentation_head = TUPerNetHead(seg_channels, classes)

    def forward(self, *feats):
        return self.seg_model.segmentation_head(self.seg_model.decoder(*feats))


class TFlairHubModel(nn.Module):
    """Multimodal FLAIR-HUB oracle: one mono swin encoder + one Sentinel
    time series UTAE, full fusion (case 4), upernet main decoder, aux
    decoders on both modalities. Mirrors the reference forward exactly:
    fmaps order mono-then-multi, UTAE bottleneck paired with the mono
    stride-4 stage, double logits interpolation (idempotent), dummy 0-ch
    maps prepended to the fused pyramid."""

    def __init__(self, mono_mod="AERIAL_RGBI", multi_mod="SENTINEL2_TS",
                 tasks=("AERIAL_LABEL-COSIA",), nclasses=(19,),
                 in_channels=3, ts_channels=3,
                 embed_dim=32, depths=(2, 2, 2, 2), num_heads=(2, 4, 8, 16),
                 ws=4, mt_widths=(32, 32, 64, 64), out_conv=(32,),
                 n_head=4, d_model=32, d_k=4, str_conv_k=3, str_conv_s=1,
                 str_conv_p=1, aux_mono=True, aux_multi=True,
                 pyramid=256, seg_channels=64):
        super().__init__()
        self.mono_mod, self.multi_mod = mono_mod, multi_mod
        self.tasks, self.nclasses = list(tasks), list(nclasses)
        task_nclasses = sum(nclasses)
        self.aux_mono, self.aux_multi = aux_mono, aux_multi

        self.encoders = nn.ModuleDict()
        mono_wrap = nn.Module()
        mono_wrap.seg_model = nn.Module()
        mono_wrap.seg_model.model = TSwinEncoder(
            in_channels=in_channels, embed_dim=embed_dim, depths=depths,
            num_heads=num_heads, ws=ws,
        )
        self.encoders[mono_mod] = mono_wrap
        out_conv = list(out_conv)
        if out_conv[-1] != task_nclasses:
            out_conv = out_conv + [task_nclasses]
        self.encoders[multi_mod] = TUTAE(
            input_dim=ts_channels, encoder_widths=tuple(mt_widths),
            decoder_widths=tuple(mt_widths), out_conv=tuple(out_conv),
            str_conv_k=str_conv_k, str_conv_s=str_conv_s,
            str_conv_p=str_conv_p, n_head=n_head, d_model=d_model, d_k=d_k,
        )

        mono_oc = [in_channels, 0,
                   *(embed_dim * 2 ** i for i in range(len(depths)))]
        stage_oc = mono_oc[2:]
        reversed_dec = list(mt_widths)[::-1]
        backbones = [a + b for a, b in zip(stage_oc, reversed_dec)]
        self.fusion_handler = nn.Module()
        self.fusion_handler.conv_f = nn.ModuleList(
            [nn.Conv2d(cin, cout, 1) for cin, cout in zip(backbones, stage_oc)]
        )

        self.main_decoders = nn.ModuleDict({
            t: _TDecoderWrapper(mono_oc, k, pyramid, seg_channels)
            for t, k in zip(self.tasks, self.nclasses)
        })
        self.aux_decoders = nn.ModuleDict()
        for t, k in zip(self.tasks, self.nclasses):
            if aux_mono:
                self.aux_decoders[f"{mono_mod}__{t}"] = _TDecoderWrapper(
                    mono_oc, k, pyramid, seg_channels)
            if aux_multi:
                self.aux_decoders[f"{multi_mod}__{t}"] = nn.Conv2d(
                    task_nclasses, k, 1)

    def forward(self, batch):
        img_size = batch[self.tasks[0]].shape[-1]
        fmaps, logits_tasks, logits_aux = {}, {}, {}

        feats = self.encoders[self.mono_mod].seg_model.model(
            batch[self.mono_mod])
        fmaps[self.mono_mod] = feats
        if self.aux_mono:
            for t in self.tasks:
                logits_aux[f"aux_{self.mono_mod}_{t}"] = _interp(
                    self.aux_decoders[f"{self.mono_mod}__{t}"](*feats),
                    img_size)

        logits, maps = self.encoders[self.multi_mod](
            batch[self.multi_mod],
            batch_positions=batch.get(self.multi_mod.replace("TS", "DATES")))
        logits = _interp(logits, img_size)
        logits_tasks[self.multi_mod] = _interp(logits, img_size)
        fmaps[self.multi_mod] = maps
        if self.aux_multi:
            for t in self.tasks:
                logits_aux[f"aux_{self.multi_mod}_{t}"] = _interp(
                    self.aux_decoders[f"{self.multi_mod}__{t}"](logits),
                    img_size)

        # FusionHandler case 4 (reference flair_model.py:504-547)
        target = fmaps[self.mono_mod]
        target_shapes = [fm.shape for fm in target][2:]  # drop 0-ch dummies
        dummy_maps = list(target[:2])
        aligned = []
        for mod in fmaps:
            mod_fmaps = list(fmaps[mod])
            if mod_fmaps[0].shape[1] == 0 or mod_fmaps[1].shape[1] == 0:
                mod_fmaps = mod_fmaps[2:]
            if len(mod_fmaps) != len(target_shapes):
                mod_fmaps = [mod_fmaps[0]] * (len(target_shapes)
                                              - len(mod_fmaps)) + mod_fmaps
            aligned.append([
                fm if fm.shape[-2:] == ts[-2:]
                else F.interpolate(fm, size=ts[-2:], mode="bilinear",
                                   align_corners=False)
                for fm, ts in zip(mod_fmaps, target_shapes)
            ])
        stacked = [torch.cat(fms, dim=1) for fms in zip(*aligned)]
        fused = [conv(fm) for conv, fm
                 in zip(self.fusion_handler.conv_f, stacked)]
        fused = dummy_maps + fused

        for t in self.tasks:
            logits_tasks[t] = _interp(self.main_decoders[t](*fused), img_size)
        del logits_tasks[self.multi_mod]
        return logits_tasks, logits_aux


# ---------------------------------------------------------------------------
# ConvNeXt v1 reference (timm 1.x structure + naming)
# ---------------------------------------------------------------------------


class TConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # NCHW
        y = self.conv_dw(x).permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return x + y


class _TLayerNorm2d(nn.LayerNorm):
    def forward(self, x):  # NCHW
        return super().forward(
            x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class TConvNeXtEncoder(nn.Module):
    """timm-1.x-style convnext; smp TimmUniversalEncoder feature output."""

    def __init__(self, in_channels=3, dims=(96, 192, 384, 768),
                 depths=(3, 3, 9, 3)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(in_channels, dims[0], 4, 4),
            _TLayerNorm2d(dims[0], eps=1e-6),
        )
        self.stages = nn.ModuleList()
        for i, (dim, d) in enumerate(zip(dims, depths)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    _TLayerNorm2d(dims[i - 1], eps=1e-6),
                    nn.Conv2d(dims[i - 1], dim, 2, 2),
                )
            stage.blocks = nn.ModuleList(
                [TConvNeXtBlock(dim) for _ in range(d)])
            self.stages.append(stage)

    def forward(self, x):  # NCHW in, list of NCHW features out
        B, C, H, W = x.shape
        feats = [x, torch.zeros(B, 0, H // 2, W // 2)]
        y = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                y = stage.downsample(y)
            for blk in stage.blocks:
                y = blk(y)
            feats.append(y)
        return feats


class TConvNeXtUPerNet(nn.Module):
    """smp-style container, key-compatible with SmpModel('convnext_*')."""

    def __init__(self, in_channels=3, classes=19, dims=(96, 192, 384, 768),
                 depths=(3, 3, 9, 3)):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.model = TConvNeXtEncoder(in_channels, dims, depths)
        self.decoder = TUPerNetDecoder((in_channels, 0, *dims))
        self.segmentation_head = TUPerNetHead(64, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder.model(x)))


# ---------------------------------------------------------------------------
# EfficientNet (MBConv) reference (timm gen_efficientnet structure + naming)
# ---------------------------------------------------------------------------


class TSqueezeExcite(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1)
        self.conv_expand = nn.Conv2d(rd, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TDsBlock(nn.Module):
    """timm DepthwiseSeparableConv (expansion 1)."""

    def __init__(self, cin, cout, k, s):
        super().__init__()
        self.conv_dw = nn.Conv2d(cin, cin, k, s, k // 2, groups=cin, bias=False)
        self.bn1 = nn.BatchNorm2d(cin)
        self.se = TSqueezeExcite(cin, max(1, round(cin * 0.25)))
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_dw(x)))
        y = self.bn2(self.conv_pw(self.se(y)))
        return y + x if self.residual else y


class TIrBlock(nn.Module):
    """timm InvertedResidual (MBConv)."""

    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, s, k // 2, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = TSqueezeExcite(mid, max(1, round(cin * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(self.se(y)))
        return y + x if self.residual else y


class TEfficientNetEncoder(nn.Module):
    """timm-layout EfficientNet; smp TimmUniversalEncoder feature output
    (real stride-2 feature, no zero-channel dummy)."""

    def __init__(self, in_channels, stem, stages):
        super().__init__()
        self.conv_stem = nn.Conv2d(in_channels, stem, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem)
        self.blocks = nn.ModuleList()
        taps, red = {}, 2
        cin = stem
        for i, (k, s, e, c, r) in enumerate(stages):
            stage = nn.ModuleList()
            for j in range(r):
                stride = s if j == 0 else 1
                if e == 1:
                    stage.append(TDsBlock(cin, c, k, stride))
                else:
                    stage.append(TIrBlock(cin, c, k, stride, e))
                cin = c
            self.blocks.append(stage)
            red *= s
            taps[red] = i
        self.taps = sorted(taps.values())

    def forward(self, x):
        feats = [x]
        y = F.silu(self.bn1(self.conv_stem(x)))
        for i, stage in enumerate(self.blocks):
            for blk in stage:
                y = blk(y)
            if i in self.taps:
                feats.append(y)
        return feats


class TEfficientNetUnet(nn.Module):
    """smp-style container, key-compatible with SmpModel('efficientnet_*')."""

    def __init__(self, in_channels, classes, stem, stages):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.model = TEfficientNetEncoder(in_channels, stem, stages)
        taps = self.encoder.model.taps
        chs = (in_channels, *(stages[i][3] for i in taps))
        self.decoder = TUnetDecoder(chs)
        self.segmentation_head = TSegmentationHead(16, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder.model(x)))


# ---------------------------------------------------------------------------
# FPN decoder reference (smp FPNDecoder structure + naming)
# ---------------------------------------------------------------------------


class TConv3x3GNReLU(nn.Module):
    def __init__(self, cin, cout, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.GroupNorm(32, cout),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
        return x


class TFPNSegBlock(nn.Module):
    def __init__(self, cin, cout, n_upsamples=0):
        super().__init__()
        blocks = [TConv3x3GNReLU(cin, cout, upsample=bool(n_upsamples))]
        for _ in range(1, n_upsamples):
            blocks.append(TConv3x3GNReLU(cout, cout, upsample=True))
        self.block = nn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class TFPNLateral(nn.Module):
    def __init__(self, pyramid, cskip):
        super().__init__()
        self.skip_conv = nn.Conv2d(cskip, pyramid, 1)

    def forward(self, x, skip):
        return F.interpolate(x, scale_factor=2, mode="nearest") \
            + self.skip_conv(skip)


class TFPNDecoder(nn.Module):
    def __init__(self, encoder_channels, pyramid=256, seg=128):
        super().__init__()
        c5, c4, c3, c2 = encoder_channels[::-1][:4]
        self.p5 = nn.Conv2d(c5, pyramid, 1)
        self.p4 = TFPNLateral(pyramid, c4)
        self.p3 = TFPNLateral(pyramid, c3)
        self.p2 = TFPNLateral(pyramid, c2)
        self.seg_blocks = nn.ModuleList(
            [TFPNSegBlock(pyramid, seg, n) for n in (3, 2, 1, 0)])
        self.dropout = nn.Dropout2d(0.2)

    def forward(self, *features):
        c2, c3, c4, c5 = features[-4:]
        p5 = self.p5(c5)
        p4 = self.p4(p5, c4)
        p3 = self.p3(p4, c3)
        p2 = self.p2(p3, c2)
        x = sum(b(p) for b, p in zip(self.seg_blocks, (p5, p4, p3, p2)))
        return self.dropout(x)


class TFPNHead(nn.Sequential):
    def __init__(self, cin, classes, upsampling=4):
        super().__init__(
            nn.Conv2d(cin, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=upsampling),
        )


class TResNet34FPN(nn.Module):
    """smp ``FPN(encoder_name='resnet34')`` equivalent."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        self.decoder = TFPNDecoder(self.encoder.out_channels)
        self.segmentation_head = TFPNHead(128, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# DeepLabV3+ decoder reference (smp structure + naming, dilated resnet)
# ---------------------------------------------------------------------------


class TSeparableConv2d(nn.Sequential):
    def __init__(self, cin, cout, k=3, padding=1, dilation=1, bias=True):
        super().__init__(
            nn.Conv2d(cin, cin, k, 1, padding, dilation, groups=cin,
                      bias=False),
            nn.Conv2d(cin, cout, 1, bias=bias),
        )


class TASPPPooling(nn.Sequential):
    """smp ASPPPooling: a Sequential appended to convs, so its conv/BN get
    torch keys convs.4.1 / convs.4.2 (index 0 is the param-less pool)."""

    def __init__(self, cin, cout):
        super().__init__(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(cin, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class TASPP(nn.Module):
    def __init__(self, cin, cout=256, rates=(12, 24, 36)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                              nn.BatchNorm2d(cout), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                TSeparableConv2d(cin, cout, 3, padding=r, dilation=r,
                                 bias=False),
                nn.BatchNorm2d(cout), nn.ReLU()))
        mods.append(TASPPPooling(cin, cout))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * cout, cout, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = [conv(x) for conv in self.convs]
        return self.project(torch.cat(res, dim=1))


class TDeepLabV3PlusDecoder(nn.Module):
    def __init__(self, encoder_channels, cout=256):
        super().__init__()
        self.aspp = nn.Sequential(
            TASPP(encoder_channels[-1], cout),
            TSeparableConv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )
        self.up = nn.UpsamplingBilinear2d(scale_factor=4)
        self.block1 = nn.Sequential(
            nn.Conv2d(encoder_channels[-4], 48, 1, bias=False),
            nn.BatchNorm2d(48), nn.ReLU())
        self.block2 = nn.Sequential(
            TSeparableConv2d(48 + cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, *features):
        x = self.up(self.aspp(features[-1]))
        hi = self.block1(features[-4])
        return self.block2(torch.cat([x, hi], dim=1))


class TResNet34DeepLab(nn.Module):
    """smp ``DeepLabV3Plus(encoder_name='resnet34')`` equivalent: the
    encoder is dilated to output_stride 16 (layer4 stride->1, 3x3
    dilation/padding->2 on every conv, per replace_strides_with_dilation)."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        for mod in self.encoder.layer4.modules():
            if isinstance(mod, nn.Conv2d):
                mod.stride = (1, 1)
                if mod.kernel_size == (3, 3):
                    mod.dilation = (2, 2)
                    mod.padding = (2, 2)
        self.decoder = TDeepLabV3PlusDecoder(self.encoder.out_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=4),
        )

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# U-Net++ decoder reference (smp UnetPlusPlusDecoder structure + naming)
# ---------------------------------------------------------------------------


class TUnetPlusPlusDecoder(nn.Module):
    """smp UnetPlusPlusDecoder (dense nested skips), ModuleDict keys
    x_{depth}_{layer}; blocks are the Unet DecoderBlock."""

    def __init__(self, encoder_channels, decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        in_ch = [enc[0]] + list(decoder_channels[:-1])
        skip_ch = list(enc[1:]) + [0]
        out_ch = list(decoder_channels)
        blocks = {}
        for layer_idx in range(len(in_ch) - 1):
            for depth_idx in range(layer_idx + 1):
                if depth_idx == 0:
                    i, s, o = (in_ch[layer_idx],
                               skip_ch[layer_idx] * (layer_idx + 1),
                               out_ch[layer_idx])
                else:
                    i = skip_ch[layer_idx - 1]
                    s = skip_ch[layer_idx] * (layer_idx + 1 - depth_idx)
                    o = skip_ch[layer_idx]
                blocks[f"x_{depth_idx}_{layer_idx}"] = TUnetDecoderBlock(i, s, o)
        blocks[f"x_0_{len(in_ch) - 1}"] = TUnetDecoderBlock(
            in_ch[-1], 0, out_ch[-1])
        self.blocks = nn.ModuleDict(blocks)
        self.depth = len(in_ch) - 1

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        dense = {}
        for layer_idx in range(self.depth):
            for depth_idx in range(self.depth - layer_idx):
                li = depth_idx + layer_idx
                if layer_idx == 0:
                    dense[f"x_{depth_idx}_{li}"] = self.blocks[
                        f"x_{depth_idx}_{li}"](feats[depth_idx],
                                               feats[depth_idx + 1])
                else:
                    cat = [dense[f"x_{i}_{li}"]
                           for i in range(depth_idx + 1, li + 1)]
                    skip = torch.cat(cat + [feats[li + 1]], dim=1)
                    dense[f"x_{depth_idx}_{li}"] = self.blocks[
                        f"x_{depth_idx}_{li}"](dense[f"x_{depth_idx}_{li - 1}"],
                                               skip)
        return self.blocks[f"x_0_{self.depth}"](dense[f"x_0_{self.depth - 1}"])


class TResNet34UnetPlusPlus(nn.Module):
    """smp ``UnetPlusPlus(encoder_name='resnet34')`` equivalent."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        self.decoder = TUnetPlusPlusDecoder(self.encoder.out_channels)
        self.segmentation_head = TSegmentationHead(16, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# LinkNet decoder reference (smp structure + naming)
# ---------------------------------------------------------------------------


class TConv1x1BNReLU(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(
            nn.Conv2d(cin, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )


class TTransposeX2(nn.Sequential):
    def __init__(self, cin, cout):
        super().__init__(
            nn.ConvTranspose2d(cin, cout, kernel_size=4, stride=2, padding=1),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )


class TLinknetDecoderBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = nn.Sequential(
            TConv1x1BNReLU(cin, cin // 4),
            TTransposeX2(cin // 4, cin // 4),
            TConv1x1BNReLU(cin // 4, cout),
        )

    def forward(self, x, skip=None):
        x = self.block(x)
        if skip is not None:
            x = x + skip
        return x


class TLinknetDecoder(nn.Module):
    """smp LinknetDecoder layout for encoder depth 5."""

    def __init__(self, encoder_channels, prefinal_channels=32, n_blocks=5):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        channels = enc + [prefinal_channels]
        self.blocks = nn.ModuleList(
            [TLinknetDecoderBlock(channels[i], channels[i + 1])
             for i in range(n_blocks)]
        )

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x = feats[0]
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            skip = skips[i] if i < len(skips) else None
            x = block(x, skip)
        return x


class TResNet34Linknet(nn.Module):
    """smp ``Linknet(encoder_name='resnet34')`` equivalent (head kernel 1,
    upsampling 1)."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        self.decoder = TLinknetDecoder(self.encoder.out_channels)
        self.segmentation_head = nn.Sequential(nn.Conv2d(32, classes, 1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# PSPNet decoder reference (smp structure + naming, encoder_depth=3)
# ---------------------------------------------------------------------------


class TResNet34EncoderDepth3(nn.Module):
    """smp resnet34 encoder at encoder_depth=3: the state dict LACKS
    layer3/layer4 (4 features, deepest stride 8)."""

    def __init__(self, in_channels=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def make_layer(cin, cout, n, stride):
            blocks = [TBasicBlock(cin, cout, stride)]
            blocks += [TBasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = make_layer(64, 64, 3, 1)
        self.layer2 = make_layer(64, 128, 4, 2)
        self.out_channels = (in_channels, 64, 64, 128)

    def forward(self, x):
        feats = [x]
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.layer1(self.maxpool(x))
        feats.append(x)
        x = self.layer2(x)
        feats.append(x)
        return feats


class TPSPNetBlock(nn.Module):
    """smp PSPNet's pooling block — distinct from the UPerNet TPSPBlock
    above (which always uses Conv(bias=False)+BN); do NOT reuse that name
    at module scope or the UPerNet oracle silently picks this one up."""

    def __init__(self, cin, cout, pool_size):
        super().__init__()
        use_bn = pool_size != 1  # smp: no BN on the 1x1 branch
        conv = [nn.Conv2d(cin, cout, 1, bias=not use_bn)]
        if use_bn:
            conv.append(nn.BatchNorm2d(cout))
        conv.append(nn.ReLU(inplace=True))
        self.pool = nn.Sequential(
            nn.AdaptiveAvgPool2d(output_size=(pool_size, pool_size)),
            nn.Sequential(*conv),
        )

    def forward(self, x):
        h, w = x.size(2), x.size(3)
        return F.interpolate(self.pool(x), size=(h, w), mode="bilinear",
                             align_corners=True)


class TPSPDecoder(nn.Module):
    def __init__(self, encoder_channels, out_channels=512, sizes=(1, 2, 3, 6)):
        super().__init__()
        cin = encoder_channels[-1]

        class _PSP(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [TPSPNetBlock(cin, cin // len(sizes), s) for s in sizes])

            def forward(self, x):
                return torch.cat([b(x) for b in self.blocks] + [x], dim=1)

        self.psp = _PSP()
        self.conv = nn.Sequential(
            nn.Conv2d(cin * 2, out_channels, 1, bias=False),
            nn.BatchNorm2d(out_channels),
            nn.ReLU(inplace=True),
        )
        self.dropout = nn.Dropout2d(p=0.2)

    def forward(self, *features):
        return self.dropout(self.conv(self.psp(features[-1])))


class TPSPHead(nn.Sequential):
    def __init__(self, cin, classes, upsampling=8):
        super().__init__(
            nn.Conv2d(cin, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=upsampling),
        )


class TResNet34PSPNet(nn.Module):
    """smp ``PSPNet(encoder_name='resnet34')`` equivalent (encoder_depth 3,
    psp_out_channels 512, head x8)."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34EncoderDepth3(in_channels)
        self.decoder = TPSPDecoder(self.encoder.out_channels)
        self.segmentation_head = TPSPHead(512, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# DeepLabV3 (non-plus) decoder reference (smp structure + naming)
# ---------------------------------------------------------------------------


class TASPPPlain(nn.Module):
    """TASPP with non-separable atrous branches (smp separable=False)."""

    def __init__(self, cin, cout=256, rates=(12, 24, 36)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                              nn.BatchNorm2d(cout), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU()))
        mods.append(TASPPPooling(cin, cout))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(5 * cout, cout, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = [conv(x) for conv in self.convs]
        return self.project(torch.cat(res, dim=1))


class TDeepLabV3Decoder(nn.Sequential):
    def __init__(self, cin, cout=256):
        super().__init__(
            TASPPPlain(cin, cout),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )

    def forward(self, *features):
        x = features[-1]
        for mod in self:
            x = mod(x)
        return x


class TResNet34DeepLabV3(nn.Module):
    """smp ``DeepLabV3(encoder_name='resnet34')`` equivalent: encoder
    dilated to output_stride 8 (layer3 rate 2, layer4 rate 4), head
    kernel 1 + x8 bilinear."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        for layer, rate in ((self.encoder.layer3, 2),
                            (self.encoder.layer4, 4)):
            for mod in layer.modules():
                if isinstance(mod, nn.Conv2d):
                    mod.stride = (1, 1)
                    if mod.kernel_size == (3, 3):
                        mod.dilation = (rate, rate)
                        mod.padding = (rate, rate)
        self.decoder = TDeepLabV3Decoder(self.encoder.out_channels[-1])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(256, classes, 1),
            nn.UpsamplingBilinear2d(scale_factor=8),
        )

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# MAnet decoder reference (smp structure + naming, incl. the PAB
# flattened-softmax and reshape quirks)
# ---------------------------------------------------------------------------


class TPAB(nn.Module):
    def __init__(self, in_channels, pab_channels=64):
        super().__init__()
        self.in_channels = in_channels
        self.top_conv = nn.Conv2d(in_channels, pab_channels, 1)
        self.center_conv = nn.Conv2d(in_channels, pab_channels, 1)
        self.bottom_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)
        self.map_softmax = nn.Softmax(dim=1)
        self.out_conv = nn.Conv2d(in_channels, in_channels, 3, padding=1)

    def forward(self, x):
        bsize, _, h, w = x.shape
        x_top = self.top_conv(x).flatten(2)                     # B,pab,hw
        x_center = self.center_conv(x).flatten(2).transpose(1, 2)
        x_bottom = self.bottom_conv(x).flatten(2).transpose(1, 2)
        sp_map = torch.matmul(x_center, x_top)                  # B,hw,hw
        # smp quirk: softmax over the flattened hw*hw axis
        sp_map = self.map_softmax(sp_map.view(bsize, -1)).view(
            bsize, h * w, h * w)
        sp_map = torch.matmul(sp_map, x_bottom)                 # B,hw,C
        # smp quirk: reshape (not transpose) to B,C,h,w
        sp_map = sp_map.reshape(bsize, self.in_channels, h, w)
        return self.out_conv(x + sp_map)


class TMFAB(nn.Module):
    def __init__(self, cin, cskip, cout, reduction=16):
        super().__init__()
        self.hl_conv = nn.Sequential(
            TConv2dReLU(cin, cin),
            nn.Sequential(nn.Conv2d(cin, cskip, 1, bias=False),
                          nn.BatchNorm2d(cskip), nn.ReLU(inplace=True)),
        )
        red = max(1, cskip // reduction)
        self.SE_ll = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(cskip, red, 1),
            nn.ReLU(inplace=True), nn.Conv2d(red, cskip, 1), nn.Sigmoid())
        self.SE_hl = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(cskip, red, 1),
            nn.ReLU(inplace=True), nn.Conv2d(red, cskip, 1), nn.Sigmoid())
        self.conv1 = TConv2dReLU(cskip + cskip, cout)
        self.conv2 = TConv2dReLU(cout, cout)

    def forward(self, x, skip):
        x = self.hl_conv(x)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        gate = self.SE_hl(x) + self.SE_ll(skip)
        x = torch.cat([x * gate, skip], dim=1)
        return self.conv2(self.conv1(x))


class TMAnetDecoder(nn.Module):
    def __init__(self, encoder_channels,
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        enc = list(encoder_channels[1:])[::-1]
        in_ch = [enc[0]] + list(decoder_channels[:-1])
        skip_ch = list(enc[1:]) + [0]
        self.center = TPAB(enc[0])
        self.blocks = nn.ModuleList([
            TMFAB(i, s, o) if s else TUnetDecoderBlock(i, 0, o)
            for i, s, o in zip(in_ch, skip_ch, decoder_channels)
        ])

    def forward(self, *features):
        feats = list(features[1:])[::-1]
        x = self.center(feats[0])
        skips = feats[1:]
        for i, block in enumerate(self.blocks):
            if i < len(skips):
                x = block(x, skips[i])
            else:
                x = block(x)
        return x


class TResNet34MAnet(nn.Module):
    """smp ``MAnet(encoder_name='resnet34')`` equivalent."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        self.decoder = TMAnetDecoder(self.encoder.out_channels)
        self.segmentation_head = TSegmentationHead(16, classes)

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


# ---------------------------------------------------------------------------
# PAN decoder reference (smp structure + naming)
# ---------------------------------------------------------------------------


class TConvBnRelu(nn.Module):
    def __init__(self, cin, cout, k, padding=0, add_relu=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, 1, padding)
        self.bn = nn.BatchNorm2d(cout)
        self.add_relu = add_relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.add_relu else x


class TFPABlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.branch1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), TConvBnRelu(cin, cout, 1))
        self.mid = nn.Sequential(TConvBnRelu(cin, cout, 1))
        self.down1 = nn.Sequential(
            nn.MaxPool2d(2, 2), TConvBnRelu(cin, 1, 7, 3))
        self.down2 = nn.Sequential(
            nn.MaxPool2d(2, 2), TConvBnRelu(1, 1, 5, 2))
        self.down3 = nn.Sequential(
            nn.MaxPool2d(2, 2), TConvBnRelu(1, 1, 3, 1),
            TConvBnRelu(1, 1, 3, 1))
        self.conv2 = TConvBnRelu(1, 1, 5, 2)
        self.conv1 = TConvBnRelu(1, 1, 7, 3)

    def forward(self, x):
        h, w = x.size(2), x.size(3)
        up = dict(mode="bilinear", align_corners=True)
        b1 = F.interpolate(self.branch1(x), size=(h, w), **up)
        mid = self.mid(x)
        x1 = self.down1(x)
        x2 = self.down2(x1)
        x3 = self.down3(x2)
        x3 = F.interpolate(x3, size=(h // 4, w // 4), **up)
        x2 = self.conv2(x2)
        y = F.interpolate(x2 + x3, size=(h // 2, w // 2), **up)
        x1 = self.conv1(x1)
        y = F.interpolate(y + x1, size=(h, w), **up)
        return y * mid + b1


class TGAUBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            TConvBnRelu(cout, cout, 1, add_relu=False),
            nn.Sigmoid())
        self.conv2 = TConvBnRelu(cin, cout, 3, 1)

    def forward(self, x, y):
        h, w = x.size(2), x.size(3)
        y_up = F.interpolate(y, size=(h, w), mode="bilinear",
                             align_corners=True)
        return y_up + self.conv2(x) * self.conv1(y)


class TPANDecoder(nn.Module):
    def __init__(self, encoder_channels, decoder_channels=32):
        super().__init__()
        self.fpa = TFPABlock(encoder_channels[-1], decoder_channels)
        self.gau3 = TGAUBlock(encoder_channels[-2], decoder_channels)
        self.gau2 = TGAUBlock(encoder_channels[-3], decoder_channels)
        self.gau1 = TGAUBlock(encoder_channels[-4], decoder_channels)

    def forward(self, *features):
        x5 = self.fpa(features[-1])
        x4 = self.gau3(features[-2], x5)
        x3 = self.gau2(features[-3], x4)
        return self.gau1(features[-4], x3)


class TResNet34PAN(nn.Module):
    """smp ``PAN(encoder_name='resnet34')`` equivalent: encoder dilated to
    output_stride 16, decoder_channels 32, head Conv3x3 + x4."""

    def __init__(self, in_channels=3, classes=19):
        super().__init__()
        self.encoder = TResNet34Encoder(in_channels)
        for mod in self.encoder.layer4.modules():
            if isinstance(mod, nn.Conv2d):
                mod.stride = (1, 1)
                if mod.kernel_size == (3, 3):
                    mod.dilation = (2, 2)
                    mod.padding = (2, 2)
        self.decoder = TPANDecoder(self.encoder.out_channels)
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(32, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=4),
        )

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
