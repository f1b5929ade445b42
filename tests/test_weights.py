"""Pretrained-weight import: fake torchvision state dicts -> flax trees,
with numerical parity of the first conv+bn against torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdnet_tpu.models.resnet import ResNetBackbone
from cdnet_tpu.models.vgg_unet import VGG16Backbone
from cdnet_tpu.models.weights import (graft_backbone, import_resnet,
                                      import_vgg16_bn)

torch = pytest.importorskip("torch")

# torch-eval + flax forward parity at real backbone width: compile-heavy
pytestmark = [pytest.mark.slow, pytest.mark.slowzoo]


def fake_vgg16_bn_sd(rng):
    """torchvision vgg16_bn.features key layout with random values."""
    sd = {}
    idx = 0
    in_ch = 3
    for n_convs, ch in ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512)):
        for _ in range(n_convs):
            sd[f"{idx}.weight"] = (rng.randn(ch, in_ch, 3, 3)
                                   * (1.5 / np.sqrt(9 * in_ch))).astype(np.float32)
            sd[f"{idx}.bias"] = rng.randn(ch).astype(np.float32) * 0.1
            sd[f"{idx + 1}.weight"] = rng.rand(ch).astype(np.float32) + 0.5
            sd[f"{idx + 1}.bias"] = rng.randn(ch).astype(np.float32) * 0.1
            sd[f"{idx + 1}.running_mean"] = rng.randn(ch).astype(np.float32) * 0.1
            sd[f"{idx + 1}.running_var"] = rng.rand(ch).astype(np.float32) + 0.5
            in_ch = ch
            idx += 3
        idx += 1
    return sd


class TestVGGImport:
    def test_shapes_and_forward_parity(self, rng):
        sd = fake_vgg16_bn_sd(rng)
        params, stats = import_vgg16_bn(sd)

        model = VGG16Backbone(dtype=jnp.float32)
        x = rng.rand(1, 32, 32, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        grafted = {"params": params, "batch_stats": stats}
        # leaf shape compatibility with the initialized tree
        jax.tree.map(lambda a, b: None if np.shape(a) == np.shape(b) else
                     (_ for _ in ()).throw(AssertionError((np.shape(a), np.shape(b)))),
                     variables["params"], grafted["params"])

        out, _ = model.apply(grafted, x, train=False), None
        got_bottom = np.asarray(out[0])

        # torch oracle: full features stack in eval mode
        layers = []
        idx = 0
        in_ch = 3
        for n_convs, ch in ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512)):
            for _ in range(n_convs):
                conv = torch.nn.Conv2d(in_ch, ch, 3, padding=1)
                conv.weight.data = torch.from_numpy(sd[f"{idx}.weight"])
                conv.bias.data = torch.from_numpy(sd[f"{idx}.bias"])
                bn = torch.nn.BatchNorm2d(ch)
                bn.weight.data = torch.from_numpy(sd[f"{idx + 1}.weight"])
                bn.bias.data = torch.from_numpy(sd[f"{idx + 1}.bias"])
                bn.running_mean = torch.from_numpy(sd[f"{idx + 1}.running_mean"])
                bn.running_var = torch.from_numpy(sd[f"{idx + 1}.running_var"])
                layers += [conv, bn, torch.nn.ReLU()]
                in_ch = ch
                idx += 3
            layers.append(torch.nn.MaxPool2d(2, 2))
            idx += 1
        net = torch.nn.Sequential(*layers).eval()
        with torch.no_grad():
            want = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        want = np.transpose(want.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got_bottom, want, rtol=2e-3, atol=2e-3)


class TestResNetImport:
    def test_shapes_match_init(self, rng):
        # minimal fake resnet18 state dict
        sd = {}
        sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
        for nm, ch in [("bn1", 64)]:
            sd[f"{nm}.weight"] = np.ones(ch, np.float32)
            sd[f"{nm}.bias"] = np.zeros(ch, np.float32)
            sd[f"{nm}.running_mean"] = np.zeros(ch, np.float32)
            sd[f"{nm}.running_var"] = np.ones(ch, np.float32)
        in_ch = 64
        for li, (feats, n) in enumerate(zip((64, 128, 256, 512), (2, 2, 2, 2))):
            for b in range(n):
                t = f"layer{li + 1}.{b}"
                stride_in = in_ch
                sd[f"{t}.conv1.weight"] = rng.randn(feats, stride_in, 3, 3).astype(np.float32)
                sd[f"{t}.conv2.weight"] = rng.randn(feats, feats, 3, 3).astype(np.float32)
                for bnn in ("bn1", "bn2"):
                    sd[f"{t}.{bnn}.weight"] = np.ones(feats, np.float32)
                    sd[f"{t}.{bnn}.bias"] = np.zeros(feats, np.float32)
                    sd[f"{t}.{bnn}.running_mean"] = np.zeros(feats, np.float32)
                    sd[f"{t}.{bnn}.running_var"] = np.ones(feats, np.float32)
                if b == 0 and (li > 0 or stride_in != feats):
                    sd[f"{t}.downsample.0.weight"] = rng.randn(
                        feats, stride_in, 1, 1).astype(np.float32)
                    sd[f"{t}.downsample.1.weight"] = np.ones(feats, np.float32)
                    sd[f"{t}.downsample.1.bias"] = np.zeros(feats, np.float32)
                    sd[f"{t}.downsample.1.running_mean"] = np.zeros(feats, np.float32)
                    sd[f"{t}.downsample.1.running_var"] = np.ones(feats, np.float32)
                in_ch = feats
        params, stats = import_resnet(sd, "resnet18")
        model = ResNetBackbone("resnet18", dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        grafted = graft_backbone(
            {"params": {"backbone": variables["params"]},
             "batch_stats": {"backbone": variables["batch_stats"]}},
            params, stats)
        # forward runs with the grafted tree
        out, skips = model.apply(
            {"params": grafted["params"]["backbone"],
             "batch_stats": grafted["batch_stats"]["backbone"]},
            jnp.zeros((1, 32, 32, 3)), train=False)
        assert out.shape[-1] == 512


class TorchBottleneck(torch.nn.Module):
    """torchvision resnet Bottleneck layout (conv1/bn1 1x1, conv2/bn2 3x3
    stride s pad 1, conv3/bn3 1x1, optional downsample), for trunk parity."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, out, 1, stride, bias=False),
                torch.nn.BatchNorm2d(out))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class TorchResNet50Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                             (3, 4, 6, 3))):
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 0) else 1
                blocks.append(TorchBottleneck(cin, planes, stride))
                cin = planes * 4
            setattr(self, f"layer{li + 1}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TestResNetTrunkForwardParity:
    def test_resnet50_backbone_matches_torch(self, rng):
        tm = TorchResNet50Trunk()
        tm.eval()
        gen = torch.Generator().manual_seed(0)
        for m in tm.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.normal_(m.weight, std=0.05, generator=gen)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.data.uniform_(0.5, 1.5, generator=gen)
                m.bias.data.normal_(0, 0.1, generator=gen)
                m.running_mean.normal_(0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        params, stats = import_resnet(sd, "resnet50")
        model = ResNetBackbone("resnet50", dtype=jnp.float32)
        x = rng.rand(1, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               train=False)
        from cdnet_tpu.models.weights import graft_backbone
        grafted = graft_backbone({"params": {"backbone": variables["params"]},
                                  "batch_stats": {"backbone": variables["batch_stats"]}},
                                 params, stats, "backbone")

        out, _ = model.apply({"params": grafted["params"]["backbone"],
                              "batch_stats": grafted["batch_stats"]["backbone"]},
                             jnp.asarray(x), train=False)
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = np.transpose(np.asarray(out), (0, 3, 1, 2))
        # activations reach ~400 after 50 conv layers; f32 reduction-order
        # drift accumulates to ~0.3% relative on a handful of elements
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-3)
