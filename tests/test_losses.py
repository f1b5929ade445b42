"""Loss numerics vs torch oracles re-implementing /root/reference/loss.py."""
import numpy as np
import pytest

from cdnet_tpu import losses
from cdnet_tpu.config import Config

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def rand_logits(rng, n=2, h=8, w=8, c=3):
    return rng.randn(n, h, w, c).astype(np.float32)


class TestCE:
    def test_weighted_nll_vs_torch(self, rng):
        logits = rand_logits(rng)
        target = rng.randint(0, 3, (2, 8, 8))
        weight = (rng.rand(2, 8, 8) * 5).astype(np.float32)
        got = float(losses.weighted_nll(logits, target, weight))
        tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
        lp = F.log_softmax(tl, dim=1)
        nll = F.nll_loss(lp, torch.from_numpy(target).long(), reduction="none")
        want = float((nll * torch.from_numpy(weight)).mean())
        assert got == pytest.approx(want, rel=1e-5)


class TestDice:
    def test_multiclass_dice_vs_torch_oracle(self, rng):
        probs = rng.rand(2, 8, 8, 3).astype(np.float32)
        onehot = np.eye(3, dtype=np.float32)[rng.randint(0, 3, (2, 8, 8))]
        got = float(losses.multiclass_dice_loss(probs, onehot))
        # oracle: loss.py:131-176
        total = 0.0
        for i in range(3):
            p = torch.from_numpy(probs[..., i]).reshape(2, -1)
            t = torch.from_numpy(onehot[..., i]).reshape(2, -1)
            inter = (p * t).sum(1)
            dice = 2 * (inter + 1) / (p.sum(1) + t.sum(1) + 1)
            total += float(1 - dice.sum() / 2)
        assert got == pytest.approx(total, rel=1e-5)

    def test_weight_multiclass_dice_repulsion_oracle(self, rng):
        c = 5
        probs = rng.rand(2, 8, 8, c).astype(np.float32)
        onehot = np.eye(c, dtype=np.float32)[rng.randint(0, c, (2, 8, 8))]
        weights = (rng.rand(2, 8, 8)).astype(np.float32)
        got = float(losses.weight_multiclass_dice_loss(probs, onehot, weights))

        def wdice(pi, ti):
            p = torch.from_numpy(pi).reshape(2, -1)
            t = torch.from_numpy(ti).reshape(2, -1)
            w = torch.from_numpy(weights).reshape(2, -1)
            inter = (p * t * w).sum(1)
            dice = 2 * (inter + 1) / ((p * w).sum(1) + (t * w).sum(1) + 1)
            return float(1 - dice.sum() / 2)

        total = 0.0
        for i in range(c):
            if i == 0:
                total += wdice(probs[..., 0], onehot[..., 0]) * 2
            else:
                prev = c - 1 if i == 1 else i - 1
                nxt = 1 if i == c - 1 else i + 1
                d = wdice(probs[..., i], onehot[..., i])
                d -= 1 - wdice(probs[..., i], onehot[..., prev])
                d -= 1 - wdice(probs[..., i], onehot[..., nxt])
                total += d
        assert got == pytest.approx(total / c, rel=1e-4)


class TestVariance:
    def test_vs_torch_oracle(self, rng):
        probs = rng.rand(2, 8, 8, 3).astype(np.float32)
        inst = rng.randint(0, 4, (2, 8, 8))
        got = float(losses.variance_loss(probs, inst, max_instances=8))
        # oracle: loss.py:9-33
        tp = torch.from_numpy(np.transpose(probs, (0, 3, 1, 2)))
        tt = torch.from_numpy(inst)
        loss = 0.0
        for k in range(2):
            vals = tt[k].unique()
            vals = vals[vals != 0]
            sv = 0.0
            for v in vals:
                instance = tp[k][:, tt[k] == v]
                if instance.size(1) > 1:
                    sv += float(instance.var(dim=1).sum())
            loss += sv / (len(vals) + 1e-8)
        want = loss / 2
        assert got == pytest.approx(want, rel=1e-4)


class TestComposite:
    def test_all_components_present(self, rng):
        cfg = Config()
        n, h, w = 2, 8, 8
        outputs = {
            "mask": rng.randn(n, h, w, 3).astype(np.float32),
            "point": rng.randn(n, h, w, 1).astype(np.float32),
            "direction": rng.randn(n, h, w, 9).astype(np.float32),
        }
        mask_t = rng.randint(0, 3, (n, h, w))
        dir_t = rng.randint(0, 9, (n, h, w))
        targets = {
            "mask": mask_t,
            "mask_onehot": np.eye(3, dtype=np.float32)[mask_t],
            "weight": (rng.rand(n, h, w)).astype(np.float32),
            "point": rng.rand(n, h, w, 1).astype(np.float32),
            "direction": dir_t,
            "direction_onehot": np.eye(9, dtype=np.float32)[dir_t],
        }
        total, comps = losses.composite_loss(outputs, targets, cfg)
        for k in ("loss_CE", "loss_dice", "loss_direction_CE",
                  "loss_direction_dice", "loss_mse"):
            assert k in comps, k
        recon = (comps["loss_CE"] + comps["loss_dice"] + comps["loss_direction_CE"]
                 + comps["loss_direction_dice"] + comps["loss_mse"])
        assert float(total) == pytest.approx(float(recon), rel=1e-6)

    def test_alpha2_replaces_ce_but_keeps_later_terms(self, rng):
        """train_util_dam.py:182-189: alpha==2 sets loss = 2*loss_var and
        the boundary/dice/direction/mse terms are STILL added afterwards
        (the old code applied alpha after the composite, zeroing the
        direction/point gradients)."""
        cfg = Config()
        cfg.train.alpha = 2
        n, h, w = 2, 8, 8
        outputs = {
            "mask": rng.randn(n, h, w, 3).astype(np.float32),
            "point": rng.randn(n, h, w, 1).astype(np.float32),
            "direction": rng.randn(n, h, w, 9).astype(np.float32),
        }
        mask_t = rng.randint(0, 3, (n, h, w))
        dir_t = rng.randint(0, 9, (n, h, w))
        targets = {
            "mask": mask_t,
            "mask_onehot": np.eye(3, dtype=np.float32)[mask_t],
            "weight": (rng.rand(n, h, w)).astype(np.float32),
            "point": rng.rand(n, h, w, 1).astype(np.float32),
            "direction": dir_t,
            "direction_onehot": np.eye(9, dtype=np.float32)[dir_t],
        }
        total, comps = losses.composite_loss(outputs, targets, cfg)
        assert "loss_var" in comps
        recon = (2.0 * comps["loss_var"] + comps["loss_dice"]
                 + comps["loss_direction_CE"] + comps["loss_direction_dice"]
                 + comps["loss_mse"])
        assert float(total) == pytest.approx(float(recon), rel=1e-5)
        # loss_CE is reported but NOT part of the total under alpha==2
        assert float(total) != pytest.approx(
            float(recon + comps["loss_CE"]), rel=1e-3)

    def test_no_direction_config(self, rng):
        cfg = Config()
        cfg.model.direction = 0
        cfg.model.mseloss = 0
        outputs = {"mask": rng.randn(1, 8, 8, 3).astype(np.float32)}
        mask_t = rng.randint(0, 3, (1, 8, 8))
        targets = {"mask": mask_t,
                   "mask_onehot": np.eye(3, dtype=np.float32)[mask_t],
                   "weight": np.ones((1, 8, 8), np.float32)}
        total, comps = losses.composite_loss(outputs, targets, cfg)
        assert "loss_direction_CE" not in comps and "loss_mse" not in comps


class TestOptimizers:
    @pytest.mark.parametrize("name", ["sgd", "adam", "radam", "adamw", "ranger"])
    def test_step_runs(self, name):
        import jax, jax.numpy as jnp
        from cdnet_tpu import optimizers as O
        cfg = Config()
        cfg.train.optimizer = name
        opt = O.get_optimizer(cfg)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
        params = O.init_params_for(name, params)
        state = opt.init(params)
        # lookahead consumes gradients of the fast weights only
        grad_src = params.fast if name == "ranger" else params
        grads = jax.tree.map(jnp.ones_like, grad_src)
        updates, state = opt.update(grads, state, params)
        new_params = __import__("optax").apply_updates(params, updates)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape, params, new_params))

    def test_schedules(self):
        from cdnet_tpu import optimizers as O
        cfg = Config()
        cfg.train.scheduler = "StepLR"
        cfg.train.step = 5
        s = O.make_schedule(cfg, steps_per_epoch=10)
        assert s(0) == cfg.train.lr
        assert s(50) == pytest.approx(cfg.train.lr * cfg.train.lr_decay)
        cfg.train.scheduler = "ExponentialLR"
        s = O.make_schedule(cfg, steps_per_epoch=10)
        assert s(10) == pytest.approx(cfg.train.lr * cfg.train.lr_decay)
        cfg.train.scheduler = "CosineAnnealingWarmRestarts"
        s = O.make_schedule(cfg, steps_per_epoch=1)
        assert s(0) == pytest.approx(cfg.train.lr)
        assert s(5) == pytest.approx(cfg.train.lr)  # restart at T_0=5


class TestFocalSigmoid:
    @pytest.mark.parametrize("robust", [False, True])
    def test_vs_reference_module(self, rng, robust):
        """Element-wise SIGMOID binary focal — the reference constructs
        FocalLoss2d()/RobustFocalLoss2d() with the default type='sigmoid'
        (train_util_dam.py:31,34; loss.py:36-126). Oracle replicates the
        torch module verbatim (minus .cuda())."""
        logits = rand_logits(rng)
        mask_t = rng.randint(0, 3, (2, 8, 8))
        onehot = np.eye(3, dtype=np.float32)[mask_t]
        got = float(losses.focal_loss(logits, onehot, robust=robust))

        logit = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
        target = torch.from_numpy(
            np.transpose(onehot, (0, 3, 1, 2))).reshape(-1, 1).long()
        prob = torch.sigmoid(logit).reshape(-1, 1)
        prob = torch.cat((1 - prob, prob), 1)
        select = torch.zeros(len(prob), 2)
        select.scatter_(1, target, 1.0)
        p = (prob * select).sum(1).view(-1, 1)
        p = torch.clamp(p, 1e-8, 1 - 1e-8)
        focus = torch.pow(1 - p, 2)
        if robust:
            focus = torch.clamp(focus, 0, 2)
        want = float((-focus * p.log()).mean())
        assert got == pytest.approx(want, rel=1e-5)
