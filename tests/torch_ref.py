"""Torch re-implementation of the reference U-Net, built FROM THE SURVEY SPEC
(SURVEY.md §2 #1–#5, §3.3) — the reference mount was empty (SURVEY.md §0), so
per §4.1 this reimplementation IS the golden-parity oracle. It is written from
the behavioral description, not copied from any source.

Spec: DoubleConv = (Conv2d 3×3 pad=1 bias=False → BatchNorm2d → ReLU) × 2 with
optional mid_channels; Down = MaxPool2d(2) + DoubleConv; Up = bilinear
align-corners 2× upsample + DoubleConv(in, out, in//2) or ConvTranspose2d(in,
in//2, 2, 2) + DoubleConv(in, out), with floor/ceil F.pad of the upsampled
tensor to the skip and concat [skip, up]; OutConv = Conv2d 1×1; channel plan
64/128/256/512/1024//factor down, 512//f..64 up, factor = 2 if bilinear.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class RefDoubleConv(nn.Module):
    def __init__(self, in_ch, out_ch, mid_ch=None):
        super().__init__()
        mid_ch = mid_ch or out_ch
        self.net = nn.Sequential(
            nn.Conv2d(in_ch, mid_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(mid_ch),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid_ch, out_ch, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.net(x)


class RefDown(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.pool = nn.MaxPool2d(2)
        self.conv = RefDoubleConv(in_ch, out_ch)

    def forward(self, x):
        return self.conv(self.pool(x))


class RefUp(nn.Module):
    def __init__(self, in_ch, out_ch, bilinear=True):
        super().__init__()
        if bilinear:
            self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
            self.conv = RefDoubleConv(in_ch, out_ch, in_ch // 2)
        else:
            self.up = nn.ConvTranspose2d(in_ch, in_ch // 2, kernel_size=2, stride=2)
            self.conv = RefDoubleConv(in_ch, out_ch)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        dy = x2.size(2) - x1.size(2)
        dx = x2.size(3) - x1.size(3)
        x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv(torch.cat([x2, x1], dim=1))


class RefOutConv(nn.Module):
    def __init__(self, in_ch, n_classes):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, n_classes, 1)

    def forward(self, x):
        return self.conv(x)


class RefUNet(nn.Module):
    def __init__(self, n_channels, n_classes, bilinear=False, base=64):
        super().__init__()
        self.n_channels, self.n_classes, self.bilinear = n_channels, n_classes, bilinear
        c = base
        factor = 2 if bilinear else 1
        self.inc = RefDoubleConv(n_channels, c)
        self.down1 = RefDown(c, 2 * c)
        self.down2 = RefDown(2 * c, 4 * c)
        self.down3 = RefDown(4 * c, 8 * c)
        self.down4 = RefDown(8 * c, 16 * c // factor)
        self.up1 = RefUp(16 * c, 8 * c // factor, bilinear)
        self.up2 = RefUp(8 * c, 4 * c // factor, bilinear)
        self.up3 = RefUp(4 * c, 2 * c // factor, bilinear)
        self.up4 = RefUp(2 * c, c, bilinear)
        self.outc = RefOutConv(c, n_classes)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return self.outc(x)


def torch_state_to_jax(model: RefUNet):
    """Translate a RefUNet state_dict into tpu_unet (params, state) pytrees.

    Layout translation: torch conv OIHW → HWIO; ConvTranspose (I,O,kH,kW) →
    HWIO; BN γ/β → scale/bias params, running stats → BNState.
    """
    import jax.numpy as jnp

    from tpu_unet.ops.batchnorm import BNState

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def conv_w(prefix):
        return jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))

    def convt_w(prefix):  # torch ConvT weight (I, O, kH, kW) -> (kH, kW, I, O)
        return jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 0, 1))

    def bn(prefix):
        p = {
            "scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }
        s = BNState(
            mean=jnp.asarray(sd[prefix + ".running_mean"]),
            var=jnp.asarray(sd[prefix + ".running_var"]),
        )
        return p, s

    def double_conv(prefix):
        bn1p, bn1s = bn(prefix + ".net.1")
        bn2p, bn2s = bn(prefix + ".net.4")
        params = {
            "conv1": {"w": conv_w(prefix + ".net.0")},
            "bn1": bn1p,
            "conv2": {"w": conv_w(prefix + ".net.3")},
            "bn2": bn2p,
        }
        return params, {"bn1": bn1s, "bn2": bn2s}

    params, state = {}, {}
    params["inc"], state["inc"] = double_conv("inc")
    for i in range(1, 5):
        params[f"down{i}"], state[f"down{i}"] = double_conv(f"down{i}.conv")
    for i in range(1, 5):
        conv_p, conv_s = double_conv(f"up{i}.conv")
        p = {"conv": conv_p}
        if not model.bilinear:
            p["up"] = {
                "w": convt_w(f"up{i}.up"),
                "b": jnp.asarray(sd[f"up{i}.up.bias"]),
            }
        params[f"up{i}"], state[f"up{i}"] = p, {"conv": conv_s}
    params["outc"] = {
        "w": conv_w("outc.conv"),
        "b": jnp.asarray(sd["outc.conv.bias"]),
    }
    return params, state
