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
