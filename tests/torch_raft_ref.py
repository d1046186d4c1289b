"""Pure-torch RAFT (raft_large) oracle with torchvision's module naming.

The reference's default flow provider is
``torchvision.models.optical_flow.raft_large(pretrained=True)``
(/root/reference/configs/config_multiframe.py:75, loaded at
/root/reference/scripts/train_multiframe_detection.py:77-83). torchvision
is not installed here, so this file re-creates the architecture with the
EXACT state_dict key layout of torchvision's implementation
(Conv2dNormActivation -> Sequential indices 0/1; module attributes
feature_encoder / context_encoder / update_block.{motion_encoder,
recurrent_block, flow_head} / mask_predictor) so that
``compat.torch_convert.convert_raft`` is validated against authentic
checkpoint naming.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvNormAct(nn.Sequential):
    """Mimics torchvision Conv2dNormActivation: [conv, norm?, relu?].

    Conv bias is present iff norm is None (torchvision's default rule)."""

    def __init__(self, cin, cout, k, stride=1, norm=None, act=True):
        if isinstance(k, int):
            k = (k, k)
        pad = ((k[0] - 1) // 2, (k[1] - 1) // 2)
        layers = [
            nn.Conv2d(cin, cout, k, stride, pad, bias=norm is None)
        ]
        if norm is not None:
            layers.append(norm(cout))
        if act:
            layers.append(nn.ReLU(inplace=True))
        super().__init__(*layers)


class ResidualBlockT(nn.Module):
    def __init__(self, cin, cout, norm, stride=1):
        super().__init__()
        self.convnormrelu1 = ConvNormAct(cin, cout, 3, stride, norm)
        self.convnormrelu2 = ConvNormAct(cout, cout, 3, 1, norm)
        if stride == 1 and cin == cout:
            self.downsample = nn.Identity()
        else:
            self.downsample = ConvNormAct(
                cin, cout, 1, stride, norm, act=False
            )
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        y = self.convnormrelu2(self.convnormrelu1(x))
        return self.relu(self.downsample(x) + y)


class FeatureEncoderT(nn.Module):
    def __init__(self, norm, layers=(64, 64, 96, 128, 256)):
        super().__init__()
        self.convnormrelu = ConvNormAct(3, layers[0], 7, 2, norm)
        self.layer1 = nn.Sequential(
            ResidualBlockT(layers[0], layers[1], norm, 1),
            ResidualBlockT(layers[1], layers[1], norm, 1),
        )
        self.layer2 = nn.Sequential(
            ResidualBlockT(layers[1], layers[2], norm, 2),
            ResidualBlockT(layers[2], layers[2], norm, 1),
        )
        self.layer3 = nn.Sequential(
            ResidualBlockT(layers[2], layers[3], norm, 2),
            ResidualBlockT(layers[3], layers[3], norm, 1),
        )
        self.conv = nn.Conv2d(layers[3], layers[4], 1)

    def forward(self, x):
        x = self.convnormrelu(x)
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv(x)


def _grid_sample_abs(img, absolute_grid):
    """torchvision _utils.grid_sample: absolute pixel coords -> normalized
    (align_corners=True), zeros padding."""
    h, w = img.shape[-2:]
    xg = 2 * absolute_grid[..., 0] / (w - 1) - 1
    yg = 2 * absolute_grid[..., 1] / (h - 1) - 1
    grid = torch.stack([xg, yg], dim=-1)
    return F.grid_sample(img, grid, mode="bilinear", align_corners=True)


class CorrBlockT:
    """torchvision CorrBlock: all-pairs volume pyramid + windowed lookup."""

    def __init__(self, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        self.corr_pyramid = []

    def build_pyramid(self, f1, f2):
        b, c, h, w = f1.shape
        corr = torch.einsum(
            "bci,bcj->bij", f1.reshape(b, c, h * w), f2.reshape(b, c, h * w)
        ) / torch.sqrt(torch.tensor(float(c)))
        corr = corr.reshape(b * h * w, 1, h, w)
        self.corr_pyramid = [corr]
        for _ in range(self.num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.corr_pyramid.append(corr)

    def index_pyramid(self, centroids_coords):
        s = 2 * self.radius + 1
        di = torch.linspace(-self.radius, self.radius, s)
        dj = torch.linspace(-self.radius, self.radius, s)
        delta = torch.stack(
            torch.meshgrid(di, dj, indexing="ij"), dim=-1
        ).view(1, s, s, 2)
        b, _, h, w = centroids_coords.shape
        centroids_coords = centroids_coords.permute(0, 2, 3, 1).reshape(
            b * h * w, 1, 1, 2
        )
        indexed = []
        for corr in self.corr_pyramid:
            sampling_coords = centroids_coords + delta
            indexed.append(
                _grid_sample_abs(corr, sampling_coords).view(b, h, w, -1)
            )
            centroids_coords = centroids_coords / 2
        return (
            torch.cat(indexed, dim=-1).permute(0, 3, 1, 2).contiguous()
        )


class MotionEncoderT(nn.Module):
    def __init__(self, in_channels_corr=324):
        super().__init__()
        self.convcorr1 = ConvNormAct(in_channels_corr, 256, 1)
        self.convcorr2 = ConvNormAct(256, 192, 3)
        self.convflow1 = ConvNormAct(2, 128, 7)
        self.convflow2 = ConvNormAct(128, 64, 3)
        self.conv = ConvNormAct(192 + 64, 126, 3)

    def forward(self, flow, corr):
        c = self.convcorr2(self.convcorr1(corr))
        f = self.convflow2(self.convflow1(flow))
        cf = self.conv(torch.cat([c, f], dim=1))
        return torch.cat([cf, flow], dim=1)


class ConvGRUT(nn.Module):
    def __init__(self, input_size, hidden_size, kernel_size, padding):
        super().__init__()
        self.convz = nn.Conv2d(
            hidden_size + input_size, hidden_size, kernel_size,
            padding=padding,
        )
        self.convr = nn.Conv2d(
            hidden_size + input_size, hidden_size, kernel_size,
            padding=padding,
        )
        self.convq = nn.Conv2d(
            hidden_size + input_size, hidden_size, kernel_size,
            padding=padding,
        )

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class RecurrentBlockT(nn.Module):
    def __init__(self, input_size=256, hidden_size=128):
        super().__init__()
        self.convgru1 = ConvGRUT(input_size, hidden_size, (1, 5), (0, 2))
        self.convgru2 = ConvGRUT(input_size, hidden_size, (5, 1), (2, 0))

    def forward(self, h, x):
        return self.convgru2(self.convgru1(h, x), x)


class FlowHeadT(nn.Module):
    def __init__(self, in_channels=128, hidden_size=256):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, hidden_size, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_size, 2, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class UpdateBlockT(nn.Module):
    def __init__(self):
        super().__init__()
        self.motion_encoder = MotionEncoderT()
        self.recurrent_block = RecurrentBlockT()
        self.flow_head = FlowHeadT()

    def forward(self, hidden_state, context, corr, flow):
        motion = self.motion_encoder(flow, corr)
        x = torch.cat([context, motion], dim=1)
        hidden_state = self.recurrent_block(hidden_state, x)
        return hidden_state, self.flow_head(hidden_state)


class MaskPredictorT(nn.Module):
    def __init__(self, in_channels=128, hidden_size=256, multiplier=0.25):
        super().__init__()
        self.convrelu = ConvNormAct(in_channels, hidden_size, 3)
        self.conv = nn.Conv2d(hidden_size, 8 * 8 * 9, 1, padding=0)
        self.multiplier = multiplier

    def forward(self, x):
        return self.multiplier * self.conv(self.convrelu(x))


def _make_coords_grid(b, h, w):
    ys, xs = torch.meshgrid(
        torch.arange(h), torch.arange(w), indexing="ij"
    )
    return (
        torch.stack([xs, ys], dim=0).float().unsqueeze(0).repeat(b, 1, 1, 1)
    )


def _upsample_flow(flow, up_mask, factor=8):
    b, c, h, w = flow.shape
    up_mask = up_mask.view(b, 1, 9, factor, factor, h, w)
    up_mask = torch.softmax(up_mask, dim=2)
    up_flow = F.unfold(factor * flow, kernel_size=3, padding=1).view(
        b, c, 9, 1, 1, h, w
    )
    up_flow = torch.sum(up_mask * up_flow, dim=2)
    return up_flow.permute(0, 1, 4, 2, 5, 3).reshape(
        b, c, factor * h, factor * w
    )


class RAFTTorch(nn.Module):
    """raft_large with torchvision state_dict naming; forward mirrors
    torchvision RAFT.forward and returns the list of upsampled flows."""

    def __init__(self, num_levels=4, radius=4):
        super().__init__()
        self.feature_encoder = FeatureEncoderT(nn.InstanceNorm2d)
        self.context_encoder = FeatureEncoderT(nn.BatchNorm2d)
        self.corr_block = CorrBlockT(num_levels, radius)
        self.update_block = UpdateBlockT()
        self.mask_predictor = MaskPredictorT()

    def forward(self, image1, image2, num_flow_updates=12):
        fmaps = self.feature_encoder(
            torch.cat([image1, image2], dim=0)
        )
        b = image1.shape[0]
        f1, f2 = fmaps[:b], fmaps[b:]
        self.corr_block.build_pyramid(f1, f2)

        context_out = self.context_encoder(image1)
        hidden_state, context = torch.split(context_out, [128, 128], dim=1)
        hidden_state = torch.tanh(hidden_state)
        context = F.relu(context)

        _, _, h8, w8 = f1.shape
        coords0 = _make_coords_grid(b, h8, w8)
        coords1 = _make_coords_grid(b, h8, w8)

        flow_predictions = []
        for _ in range(num_flow_updates):
            corr = self.corr_block.index_pyramid(coords1)
            flow = coords1 - coords0
            hidden_state, delta_flow = self.update_block(
                hidden_state, context, corr, flow
            )
            coords1 = coords1 + delta_flow
            up_mask = self.mask_predictor(hidden_state)
            flow_predictions.append(
                _upsample_flow(coords1 - coords0, up_mask)
            )
        return flow_predictions
