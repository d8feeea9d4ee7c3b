"""Deep-stem multigrid ResNet-101 trunk parity vs a torch golden.

Covers the reference's Cityscapes backbone option (``ResNet_Stem``,
resnet.py:142-291): three-conv stem to 128ch, ceil-mode max pool,
replace_stride_with_dilation=[False, True, True] with multi-grid [2, 2, 4]
in layer4 (block dilations [4, 8, 16]), verified through weight conversion.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from css_tpu.models.convert import convert_resnet_backbone
from css_tpu.models.resnet import resnet101_stem
from tests.test_model_parity import TorchBottleneck, _torch_layer


class TorchDeepStem101(nn.Module):
    def __init__(self):
        super().__init__()
        def c3(cin, cout, s=1):
            return nn.Conv2d(cin, cout, 3, stride=s, padding=1, bias=False)

        self.conv1 = nn.Sequential(
            c3(3, 64, 2), nn.BatchNorm2d(64), nn.ReLU(),
            c3(64, 64), nn.BatchNorm2d(64), nn.ReLU(),
            c3(64, 128),
        )
        self.bn1 = nn.BatchNorm2d(128)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1, ceil_mode=True)
        self.layer1 = _torch_layer(128, 64, 3, 1, 1, 1)
        self.layer2 = _torch_layer(256, 128, 4, 2, 1, 1)
        self.layer3 = _torch_layer(512, 256, 23, 1, 1, 2)
        # multigrid [2,2,4] on base dilation 4 -> per-block [4, 8, 16]
        down = nn.Sequential(nn.Conv2d(1024, 2048, 1, bias=False),
                             nn.BatchNorm2d(2048))
        self.layer4 = nn.Sequential(
            TorchBottleneck(1024, 512, 1, 4, down),
            TorchBottleneck(2048, 512, 1, 8),
            TorchBottleneck(2048, 512, 1, 16),
        )

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        low = self.layer1(x)
        return low, self.layer4(self.layer3(self.layer2(low)))


@pytest.mark.slow
def test_deepstem_trunk_parity():
    torch.manual_seed(1)
    golden = TorchDeepStem101().eval()
    with torch.no_grad():
        for m in golden.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    trunk = resnet101_stem(output_stride=8)
    params, stats = convert_resnet_backbone(sd, trunk)

    # input 64: conv/2 -> 32, ceil-mode pool -> 17 (floor mode would give 16)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    low, feat = trunk.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        tlow, tfeat = golden(torch.from_numpy(x).permute(0, 3, 1, 2))
    tlow = tlow.permute(0, 2, 3, 1).numpy()
    tfeat = tfeat.permute(0, 2, 3, 1).numpy()
    assert low.shape == tlow.shape == (1, 17, 17, 256)
    assert feat.shape == tfeat.shape
    np.testing.assert_allclose(np.asarray(low), tlow, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feat), tfeat, atol=5e-3, rtol=1e-3)
