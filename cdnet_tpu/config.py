"""Configuration system: dataclasses with flag-name parity to the reference.

The reference's `Options` class (`/root/reference/options.py:31-199` defaults,
`:200-473` argparse overlay) keeps config in nested dicts and *encodes
experiment identity into directory-name strings* that are later parsed back.
Here config is data: typed dataclasses with the same flag names and defaults,
serialized as JSON next to checkpoints. Directory names are still derived for
artifact layout parity, but nothing is ever parsed back out of a path.

Intentionally dropped reference quirks (SURVEY.md §7): CE class weights built
then discarded (train.py:93-99), config-by-string-parsing (options.py:315-318),
`opt.model['dilations']` KeyError (options.py:52).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelConfig:
    """Model flags (reference `opt.model`, options.py:39-67)."""
    model_name: str = "UNet2RevA1_vgg16"
    backbone: str = "None"
    pretrained: bool = True
    multi_class: bool = True
    in_c: int = 3
    out_c: int = 3
    direction: int = 1            # 1: add direction head
    direction_classes: int = 9    # 8 directions + background (options.py:45)
    mseloss: int = 1              # 1: point-heatmap MSE head
    add_weight_map: int = 1
    dice: int = 1                 # 0/1/2 (2 = dice only)
    boundary_loss: int = 0        # 0 none, 1 boundary, 2 focal, 3 robust focal
    loss_name: str = "CE1_Dice1"
    # FullNet knobs (options.py:47-55)
    n_layers: int = 6
    growth_rate: int = 24
    drop_rate: float = 0.1
    compress_ratio: float = 0.5
    dilations: tuple[int, ...] = (1, 2, 4, 8, 16, 4, 1)
    is_hybrid: bool = True
    layer_type: str = "basic"
    # TPU-native additions (no reference equivalent)
    compute_dtype: str = "bfloat16"   # activations/conv compute dtype
    param_dtype: str = "float32"


@dataclass
class TrainConfig:
    """Training flags (reference `opt.train`, options.py:69-112)."""
    num_epochs: int = 300
    input_size: int = 256
    batch_size: int = 8
    val_overlap: int = 40
    seed: int = 2022
    early_stop: int = 7
    scheduler: str = "None"   # None|StepLR|ExponentialLR|ReduceLROnPlateau|CosineAnnealingWarmRestarts
    step: int = 5
    lr: float = 0.001
    lr_decay: float = 0.995
    weight_decay: float = 1e-4
    momentum: float = 0.95
    log_interval: int = 15
    workers: int = 8
    alpha: float = 0.0        # variance-loss weight
    optimizer: str = "adam"   # sgd|adam|radam|adamw|ranger
    validation: int = 0
    checkpoint_freq: int = 100
    start_epoch: int = 0
    checkpoint: str = ""
    branch: int = 5
    trans_train: tuple[str, ...] = (
        "random_color", "random_chooseAug", "horizontal_flip",
        "random_elastic", "random_crop", "label_encoding", "to_tensor",
    )
    data_dir: str = ""
    save_dir: str = ""
    weight_map_dir: str = ""
    # TPU-native additions
    mesh_shape: tuple[int, ...] = (-1,)   # -1 = all devices, 1-D data-parallel mesh
    mesh_axis_names: tuple[str, ...] = ("data",)


@dataclass
class TestConfig:
    """Inference flags (reference `opt.test`, options.py:152-199)."""
    filename: str = "test1"
    epoch: str = "best"
    branch: int = 5
    groundtruth: int = 0
    tta: bool = True
    save_flag: bool = True
    patch_size: int = 256
    overlap: int = 40
    all_img_test: int = 1
    img_dir: str = ""
    label_dir: str = ""
    annotation_dir: str = ""
    weight_map_dir: str = ""
    save_dir: str = ""
    model_path: str = ""


@dataclass
class PostConfig:
    """Post-processing flags (reference `opt.post`, options.py:147-151)."""
    postproc: int = 0     # 0: CC labeling; 1: watershed
    min_area: int = 20
    radius: int = 2


@dataclass
class Config:
    """Top-level config (reference `Options`)."""
    dataset: str = "MoNuSeg_oridata"
    is_train: bool = True
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    post: PostConfig = field(default_factory=PostConfig)

    def __post_init__(self):
        if not self.model.multi_class:
            self.model.out_c = 1
        if not self.train.data_dir:
            self.train.data_dir = f"./data/{self.dataset}"
        if not self.train.save_dir:
            self.train.save_dir = f"./experiments/{self.dataset}/{self.exp_filename()}"
        if not self.train.weight_map_dir:
            self.train.weight_map_dir = f"{self.train.data_dir}/weight_maps"
        if not self.test.img_dir:
            self.test.img_dir = f"{self.train.data_dir}/images/{self.test.filename}"
        if not self.test.label_dir:
            self.test.label_dir = f"{self.train.data_dir}/labels/{self.test.filename}"
        if not self.test.save_dir:
            self.test.save_dir = f"{self.train.save_dir}/{self.test_savefilename()}"
        if not self.test.model_path:
            self.test.model_path = (
                f"{self.train.save_dir}/checkpoints/checkpoint_{self.test.epoch}"
            )

    def exp_filename(self) -> str:
        """Experiment directory stem (artifact-layout parity, options.py:117-141)."""
        m, t = self.model, self.train
        s = f"0_{m.model_name}[{m.backbone}][{t.optimizer}]_sche[{t.scheduler}]"
        s += "_3c" if m.multi_class else "_2c"
        s += f"_input{t.input_size}over{t.val_overlap}bs{t.batch_size}_e{t.num_epochs}"
        return s

    def test_savefilename(self) -> str:
        t, p = self.test, self.post
        s = (f"br{t.branch}_{t.filename}_gt{t.groundtruth}_post{p.postproc}"
             f"_{t.epoch}_minarea{p.min_area}_ra{p.radius}")
        if not t.tta:
            s += "_notta"
        return s

    # ---- serialization -------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(dc_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                ft = fields[k].type
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc_cls(**kwargs)

        return cls(
            dataset=d.get("dataset", "MoNuSeg_oridata"),
            is_train=d.get("is_train", True),
            model=build(ModelConfig, d.get("model", {})),
            train=build(TrainConfig, d.get("train", {})),
            test=build(TestConfig, d.get("test", {})),
            post=build(PostConfig, d.get("post", {})),
        )

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def _add_args(parser: argparse.ArgumentParser) -> None:
    """CLI flags with reference argparse names (options.py:200-473)."""
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--model-name", "--modelName", dest="model_name", type=str, default=None)
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=None)
    parser.add_argument("--input-size", dest="input_size", type=int, default=None)
    parser.add_argument("--epochs", dest="num_epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--optimizer", type=str, default=None)
    parser.add_argument("--scheduler", type=str, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--direction", type=int, default=None)
    parser.add_argument("--mseloss", type=int, default=None)
    parser.add_argument("--dice", type=int, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--data-dir", dest="data_dir", type=str, default=None)
    parser.add_argument("--save-dir", dest="save_dir", type=str, default=None)
    parser.add_argument("--postproc", type=int, default=None)
    parser.add_argument("--min-area", dest="min_area", type=int, default=None)
    parser.add_argument("--radius", type=int, default=None)
    parser.add_argument("--tta", type=int, default=None)
    parser.add_argument("--test-filename", dest="test_filename", type=str, default=None)
    parser.add_argument("--config-json", type=str, default=None,
                        help="load a full Config from JSON before applying flags")


def parse_args(argv: list[str] | None = None, is_train: bool = True) -> Config:
    """Build a Config from CLI flags (reference `Options(isTrain).parse()`)."""
    parser = argparse.ArgumentParser(description="cdnet_tpu")
    _add_args(parser)
    ns = parser.parse_args(argv)
    cfg = Config.from_json(ns.config_json) if ns.config_json else Config()
    cfg.is_train = is_train
    if ns.dataset:
        cfg.dataset = ns.dataset
    for name, target in [
        ("model_name", (cfg.model, "model_name")),
        ("direction", (cfg.model, "direction")),
        ("mseloss", (cfg.model, "mseloss")),
        ("dice", (cfg.model, "dice")),
        ("batch_size", (cfg.train, "batch_size")),
        ("input_size", (cfg.train, "input_size")),
        ("num_epochs", (cfg.train, "num_epochs")),
        ("lr", (cfg.train, "lr")),
        ("optimizer", (cfg.train, "optimizer")),
        ("scheduler", (cfg.train, "scheduler")),
        ("seed", (cfg.train, "seed")),
        ("checkpoint", (cfg.train, "checkpoint")),
        ("data_dir", (cfg.train, "data_dir")),
        ("save_dir", (cfg.train, "save_dir")),
        ("postproc", (cfg.post, "postproc")),
        ("min_area", (cfg.post, "min_area")),
        ("radius", (cfg.post, "radius")),
        ("test_filename", (cfg.test, "filename")),
    ]:
        val = getattr(ns, name, None)
        if val is not None:
            setattr(target[0], target[1], val)
    if ns.tta is not None:
        cfg.test.tta = bool(ns.tta)
    # re-derive dependent paths from the final flag values, keeping any path
    # the user set explicitly (--data-dir / --save-dir)
    if ns.data_dir is None:
        cfg.train.data_dir = ""
    if ns.save_dir is None:
        cfg.train.save_dir = ""
    cfg.train.weight_map_dir = ""
    cfg.test.img_dir = cfg.test.label_dir = cfg.test.save_dir = cfg.test.model_path = ""
    cfg.__post_init__()
    return cfg
