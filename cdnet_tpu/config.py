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
    pretrained_path: str = ""     # torch .pth to import (no egress here)
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
    # stem of {data_dir}/{mean_std}.npy — a (2,3) array [mean, std] in [0,1]
    # units, applied after to_tensor when 'normalize' is in trans_train
    # (options.py:55,355,471)
    mean_std: str = "mean_std"
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
    # keep watershed-unreachable (marker-erased) components as their own
    # instances instead of the reference's silent drop — see
    # ops/postproc.instances_from_pred; 0 = output-exact reference parity
    ws_rescue: int = 1


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


# reference-style spellings that must keep working (options.py:200-473)
_ALIASES = {
    ("model", "model_name"): ["--modelName"],
    ("train", "num_epochs"): ["--epochs", "--num-epochs"],
    ("test", "filename"): ["--test-filename"],
    ("train", "trans_train"): ["--transform-train"],
}

# derived-path fields: blanked and recomputed by __post_init__ unless the
# user set them explicitly on the CLI
_PATH_FIELDS = [("train", "data_dir"), ("train", "save_dir"),
                ("train", "weight_map_dir"), ("test", "img_dir"),
                ("test", "label_dir"), ("test", "save_dir"),
                ("test", "model_path"), ("test", "weight_map_dir"),
                ("test", "annotation_dir")]


def _converter(default):
    if isinstance(default, bool):
        return lambda s: bool(int(s))
    if isinstance(default, int):
        return int
    if isinstance(default, float):
        return float
    if isinstance(default, tuple):
        elem = int if (default and isinstance(default[0], int)) else str
        return lambda s: tuple(elem(x) for x in s.split(",")) if s else ()
    return str


def build_parser(is_train: bool = True) -> tuple[argparse.ArgumentParser, dict]:
    """EVERY config field is a CLI flag (full options.py:200-473 surface).

    Flag name = kebab-case field name; when two sections share a field name
    (e.g. ``branch``), the bare flag goes to the section that matters for
    this entrypoint (train first when ``is_train``) and the other sections
    get ``--<section>-<name>``. Values are stored as strings and converted
    per-field (bool fields take 0/1, tuple fields comma lists).
    """
    parser = argparse.ArgumentParser(description="cdnet_tpu", allow_abbrev=False)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--config-json", type=str, default=None,
                        help="load a full Config from JSON before applying flags")
    template = Config()
    order = ("model", "train", "test", "post") if is_train else \
            ("model", "test", "train", "post")
    taken = {"dataset", "config-json", "help"}
    converters = {}
    for sec in order:
        dc = getattr(template, sec)
        for f in dataclasses.fields(dc):
            stem = f.name.replace("_", "-")
            dest = f"{sec}__{f.name}"
            names = []
            if stem not in taken:
                names.append(f"--{stem}")
                taken.add(stem)
            qual = f"{sec}-{stem}"
            if qual not in taken:
                names.append(f"--{qual}")
                taken.add(qual)
            for alias in _ALIASES.get((sec, f.name), []):
                if alias.lstrip("-") not in taken:
                    names.append(alias)
                    taken.add(alias.lstrip("-"))
            parser.add_argument(*names, dest=dest, type=str, default=None)
            converters[dest] = _converter(getattr(dc, f.name))
    return parser, converters


def parse_args(argv: list[str] | None = None, is_train: bool = True) -> Config:
    """Build a Config from CLI flags (reference `Options(isTrain).parse()`)."""
    parser, converters = build_parser(is_train)
    ns = parser.parse_args(argv)
    # paths carried by the JSON are as explicit as CLI flags — without this
    # the _PATH_FIELDS reset below silently re-derived e.g. data_dir to the
    # ./data/<dataset> default, reading the wrong dataset. Only keys actually
    # PRESENT in the JSON count: from_dict runs __post_init__, which fills
    # every empty path field, so the constructed Config can't distinguish
    # JSON-explicit paths from derived defaults.
    if ns.config_json:
        with open(ns.config_json) as f:
            raw = json.load(f)
        cfg = Config.from_dict(raw)
        json_paths = {(sec, name) for sec, name in _PATH_FIELDS
                      if raw.get(sec, {}).get(name)}
    else:
        cfg = Config()
        json_paths = set()
    cfg.is_train = is_train
    if ns.dataset:
        cfg.dataset = ns.dataset
    explicit = set()
    for dest, conv in converters.items():
        val = getattr(ns, dest, None)
        if val is None:
            continue
        sec, name = dest.split("__", 1)
        setattr(getattr(cfg, sec), name, conv(val))
        explicit.add((sec, name))
    # re-derive dependent paths from the final flag values, keeping any path
    # the user set explicitly (CLI flag or config-json value)
    for sec, name in _PATH_FIELDS:
        if (sec, name) not in explicit and (sec, name) not in json_paths:
            setattr(getattr(cfg, sec), name, "")
    cfg.__post_init__()
    return cfg
