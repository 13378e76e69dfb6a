"""Minimal torch reference networks for numeric-parity testing.

Hand-written equivalents of torchvision ResNet50 and facenet-pytorch
InceptionResnetV1 (architecture transcribed from their published
specifications) with state-dict key layouts matching what
`facerecognition_tpu.models.port_torch` expects. Used only by tests, on CPU,
to prove the Flax models reproduce torch numerics through weight porting.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


# ----------------------------- ResNet50 -----------------------------------


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, width, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(nn.Module):
    def __init__(self, stage_sizes=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, stage_sizes[0], 1)
        self.layer2 = self._make_layer(128, stage_sizes[1], 2)
        self.layer3 = self._make_layer(256, stage_sizes[2], 2)
        self.layer4 = self._make_layer(512, stage_sizes[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def _make_layer(self, width, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, width * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(width * 4),
        )
        layers = [TorchBottleneck(self.inplanes, width, stride, downsample)]
        self.inplanes = width * 4
        layers += [TorchBottleneck(self.inplanes, width) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return torch.flatten(self.avgpool(x), 1)


# ------------------------- InceptionResnetV1 -------------------------------


class TBasicConv2d(nn.Module):
    def __init__(self, cin, cout, kernel, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride=stride, padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001, momentum=0.1)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TBlock35(nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.scale = scale
        self.branch0 = TBasicConv2d(256, 32, 1)
        self.branch1 = nn.Sequential(
            TBasicConv2d(256, 32, 1), TBasicConv2d(32, 32, 3, padding=1)
        )
        self.branch2 = nn.Sequential(
            TBasicConv2d(256, 32, 1),
            TBasicConv2d(32, 32, 3, padding=1),
            TBasicConv2d(32, 32, 3, padding=1),
        )
        self.conv2d = nn.Conv2d(96, 256, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock17(nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.scale = scale
        self.branch0 = TBasicConv2d(896, 128, 1)
        self.branch1 = nn.Sequential(
            TBasicConv2d(896, 128, 1),
            TBasicConv2d(128, 128, (1, 7), padding=(0, 3)),
            TBasicConv2d(128, 128, (7, 1), padding=(3, 0)),
        )
        self.conv2d = nn.Conv2d(256, 896, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock8(nn.Module):
    def __init__(self, scale=1.0, no_relu=False):
        super().__init__()
        self.scale = scale
        self.no_relu = no_relu
        self.branch0 = TBasicConv2d(1792, 192, 1)
        self.branch1 = nn.Sequential(
            TBasicConv2d(1792, 192, 1),
            TBasicConv2d(192, 192, (1, 3), padding=(0, 1)),
            TBasicConv2d(192, 192, (3, 1), padding=(1, 0)),
        )
        self.conv2d = nn.Conv2d(384, 1792, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        out = x + self.scale * self.conv2d(up)
        return out if self.no_relu else F.relu(out)


class TMixed6a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TBasicConv2d(256, 384, 3, stride=2)
        self.branch1 = nn.Sequential(
            TBasicConv2d(256, 192, 1),
            TBasicConv2d(192, 192, 3, padding=1),
            TBasicConv2d(192, 256, 3, stride=2),
        )
        self.branch2 = nn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)


class TMixed7a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(
            TBasicConv2d(896, 256, 1), TBasicConv2d(256, 384, 3, stride=2)
        )
        self.branch1 = nn.Sequential(
            TBasicConv2d(896, 256, 1), TBasicConv2d(256, 256, 3, stride=2)
        )
        self.branch2 = nn.Sequential(
            TBasicConv2d(896, 256, 1),
            TBasicConv2d(256, 256, 3, padding=1),
            TBasicConv2d(256, 256, 3, stride=2),
        )
        self.branch3 = nn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1
        )


class TorchInceptionResnetV1(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv2d_1a = TBasicConv2d(3, 32, 3, stride=2)
        self.conv2d_2a = TBasicConv2d(32, 32, 3)
        self.conv2d_2b = TBasicConv2d(32, 64, 3, padding=1)
        self.maxpool_3a = nn.MaxPool2d(3, stride=2)
        self.conv2d_3b = TBasicConv2d(64, 80, 1)
        self.conv2d_4a = TBasicConv2d(80, 192, 3)
        self.conv2d_4b = TBasicConv2d(192, 256, 3, stride=2)
        self.repeat_1 = nn.Sequential(*[TBlock35(0.17) for _ in range(5)])
        self.mixed_6a = TMixed6a()
        self.repeat_2 = nn.Sequential(*[TBlock17(0.10) for _ in range(10)])
        self.mixed_7a = TMixed7a()
        self.repeat_3 = nn.Sequential(*[TBlock8(0.20) for _ in range(5)])
        self.block8 = TBlock8(no_relu=True)
        self.avgpool_1a = nn.AdaptiveAvgPool2d(1)
        self.last_linear = nn.Linear(1792, 512, bias=False)
        self.last_bn = nn.BatchNorm1d(512, eps=0.001, momentum=0.1)

    def forward(self, x):
        x = self.conv2d_1a(x)
        x = self.conv2d_2a(x)
        x = self.conv2d_2b(x)
        x = self.maxpool_3a(x)
        x = self.conv2d_3b(x)
        x = self.conv2d_4a(x)
        x = self.conv2d_4b(x)
        x = self.repeat_1(x)
        x = self.mixed_6a(x)
        x = self.repeat_2(x)
        x = self.mixed_7a(x)
        x = self.repeat_3(x)
        x = self.block8(x)
        x = torch.flatten(self.avgpool_1a(x), 1)
        x = self.last_linear(x)
        return self.last_bn(x)
