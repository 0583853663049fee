"""ResNet-34 feature extractor: numerical parity against a torch fixture
wired to the torchvision resnet34 spec (reference backbone,
processing_blocks.py:236-285; torchvision itself is not installed here —
pretrained IMAGENET1K_V1 weights convert via the same state-dict keys)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from image_segmentation_tpu.models import resnet as rn

jax.config.update("jax_default_matmul_precision", "highest")


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.bn1(self.conv1(x)).relu()
        out = self.bn2(self.conv2(out))
        return (out + identity).relu()


class TorchResNet34Features(tnn.Module):
    """torchvision resnet34 minus avgpool/fc, with torchvision's state-dict
    key layout (layer{1..4}.{i}.*)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        layers = (3, 4, 6, 3)
        cin = 64
        for s, (n, w) in enumerate(zip(layers, widths), start=1):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 1) else 1
                blocks.append(TorchBasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{s}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    m = TorchResNet34Features()
    m.eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_parity_eval_mode(torch_resnet):
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = torch_resnet(x).numpy()
    params, stats = rn.resnet34_params_from_torch(
        {k: v.numpy() for k, v in torch_resnet.state_dict().items()}
    )
    model = rn.ResNet34Features(dtype=jnp.float32)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
        train=False,
    )
    out = np.moveaxis(np.asarray(out), -1, 1)
    assert out.shape == ref.shape == (1, 512, 2, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_output_stride_32(torch_resnet):
    model = rn.ResNet34Features(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 2, 2, 512)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    ref_params = sum(p.numel() for p in torch_resnet.parameters())
    assert n_params == ref_params
