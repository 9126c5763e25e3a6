"""Typed configuration tree.

The reference merges three ad-hoc sources (YAML -> EasyDict, 44 argparse
flags consulted directly, and a hard-coded ``opt_TPG`` dict — see reference
``main.py:22-145`` and ``config/super_resolution.yaml``).  Here the same
surface is a single typed tree: ``Config`` = ``TrainConfig`` + ``ValConfig``
+ ``ModelConfig`` + runtime flags, built from the same YAML schema plus the
same flag names, with explicit precedence (flags override YAML).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class ValConfig:
    val_data_dir: list[str] = field(default_factory=list)
    n_vis: int = 10
    vis_dir: str = "demo"
    valInterval: int = 400
    rec_pretrained: str = ""
    moran_pretrained: str = ""
    crnn_pretrained: str = ""
    # LPIPS eval metric inputs (reference downloads these via the lpips
    # package, super_resolution.py:41-43; here they are explicit paths)
    vgg16_pretrained: str = ""
    lpips_pretrained: str = ""


@dataclass
class TrainConfig:
    train_data_dir: list[str] = field(default_factory=list)
    batch_size: int = 64
    width: int = 128
    height: int = 32
    epochs: int = 500
    workers: int = 0
    resume: str = ""
    ckpt_dir: str = "./ckpt"
    voc_type: str = "all"  # digit | lower | upper | all | chinese
    saveInterval: int = 200
    displayInterval: int = 50
    lr: float = 1e-3
    optimizer: str = "Adam"
    beta1: float = 0.5
    manualSeed: int = 1234
    max_len: int = 100
    keep_ratio: bool = False
    down_sample_scale: int = 2
    VAL: ValConfig = field(default_factory=ValConfig)


@dataclass
class TestConfig:
    checkpoint: str = ""
    test_data_dir: list[str] = field(default_factory=list)


@dataclass
class ModelConfig:
    """Architecture hyperparameters (reference ``model/tsrn.py:576-604``)."""

    scale_factor: int = 2
    srb_nums: int = 5
    hidden_units: int = 32
    text_emb: int = 37        # CRNN class count (blank + 0-9 + a-z)
    out_text_channels: int = 64
    tp_encoder_layers: int = 1
    tp_decoder_layers: int = 2
    tp_nhead: int = 4
    dropout: float = 0.1
    # 'width' = intended query-GRU semantics; 'reference' = bit-faithful to
    # the reference's batch_first quirk — REQUIRED when importing reference
    # generator checkpoints (see TPInterpreter.query_gru_mode)
    query_gru_mode: str = "width"
    stn_ctrlpoints: int = 20
    tps_margins: tuple[float, float] = (0.05, 0.05)


@dataclass
class Flags:
    """CLI flags (reference ``main.py:23-69``), same names and defaults."""

    arch: str = "tatt"
    test_model: str = "CRNN"  # CRNN | ASTER | MORAN
    batch_size: Optional[int] = None
    val_batch_size: Optional[int] = None
    epochs: Optional[int] = None
    resume: Optional[str] = None
    vis_dir: Optional[str] = None
    rec: str = "crnn"
    STN: bool = False
    mask: bool = False
    gradient: bool = False
    use_distill: bool = False
    use_label: bool = False
    ssim_loss: bool = False
    tssim_loss: bool = False
    fused_tssim: bool = True
    color_loss: bool = False
    sr_share: bool = False
    tpg_share: bool = False
    for_cascading: bool = False
    y_domain: bool = False
    learning_STN: bool = False
    training_stablize: bool = False
    stu_iter: int = 1
    rotate_train: float = 0.0
    rotate_test: float = 0.0
    results_rotate: bool = False
    results_rotate_angle: float = 5.0
    syn: bool = False
    mixed: bool = False
    ic15sr: bool = False
    badset: bool = False
    tpg: str = "CRNN"          # CRNN | OPT (NAVER TPG for Chinese)
    text_focus: bool = False
    prob_insert: float = 1.0
    test_distorted_fusing: int = 0
    mse_fuse: bool = False
    BiSR: bool = False
    test: bool = False
    go_test: bool = False
    demo: bool = False
    demo_dir: str = "./demo"
    srb: int = 5
    hd_u: int = 32
    CHNSR: bool = False
    test_data_dir: Optional[str] = None
    lr: Optional[float] = None
    # TPU-specific additions (no reference counterpart):
    dp_devices: int = 0        # 0 = all visible devices
    steps_per_dispatch: int = 1  # K>1: K train steps per jitted dispatch
    # ship uint8 crops and normalize inside the jitted step (4x less H2D,
    # near-zero host arithmetic; see data/device_pipeline.py).  RGB path
    # only — y_domain/syn fall back to the host collate.
    device_collate: bool = False
    # per-replica BN batch stats under the mesh (DataParallel compat,
    # interfaces/base.py:390); default False = sync-BN (models/common.py)
    bn_per_replica: bool = False
    dtype: str = "float32"     # compute dtype for the model ("bfloat16" on TPU)
    log_dir: str = "tensorboard"
    tiny_tpg: bool = False     # shrink the CRNN for CPU smoke runs
    vis: bool = False          # dump LR/SR/HR triptychs during eval


@dataclass
class Config:
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    args: Flags = field(default_factory=Flags)
    MODEL: ModelConfig = field(default_factory=ModelConfig)

    # ---- resolved precedence helpers (reference base.py:168-182) ----
    @property
    def batch_size(self) -> int:
        return (
            self.args.batch_size
            if self.args.batch_size is not None
            else self.TRAIN.batch_size
        )

    @property
    def lr(self) -> float:
        return self.args.lr if self.args.lr is not None else self.TRAIN.lr

    @property
    def resume(self) -> str:
        return self.args.resume if self.args.resume is not None else self.TRAIN.resume

    @property
    def vis_dir(self) -> str:
        return (
            self.args.vis_dir
            if self.args.vis_dir is not None
            else self.TRAIN.VAL.vis_dir
        )

    @property
    def epochs(self) -> int:
        return self.args.epochs if self.args.epochs is not None else self.TRAIN.epochs

    @property
    def scale_factor(self) -> int:
        return self.TRAIN.down_sample_scale


def _coerce(dc_cls, data: dict) -> Any:
    """Build a dataclass from a dict, recursing into nested dataclasses and
    ignoring unknown keys (the reference YAML carries commented-out junk)."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(dc_cls)}
    for key, value in (data or {}).items():
        if key not in fields:
            continue
        f = fields[key]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _NESTED
        ):
            sub_cls = _NESTED[f.type] if isinstance(f.type, str) else f.type
            kwargs[key] = _coerce(sub_cls, value)
        elif value is not None:
            kwargs[key] = value
    return dc_cls(**kwargs)


_NESTED = {
    "ValConfig": ValConfig,
    "TrainConfig": TrainConfig,
    "TestConfig": TestConfig,
    "ModelConfig": ModelConfig,
    "Flags": Flags,
}


def load_config(
    yaml_path: Optional[str] = None,
    overrides: Optional[dict] = None,
    flags: Optional[Flags] = None,
) -> Config:
    """Load the reference YAML schema into the typed tree.

    ``overrides`` maps dotted paths (``TRAIN.lr``) to values; ``flags`` is
    the parsed CLI namespace.  Flags take precedence via the ``Config``
    properties, matching reference behavior (``main.py:72-76``).
    """
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as fh:
            raw = yaml.safe_load(fh) or {}
        cfg = Config(
            TRAIN=_coerce(TrainConfig, raw.get("TRAIN", {})),
            TEST=_coerce(TestConfig, raw.get("TEST", {})),
        )
    if flags is not None:
        cfg.args = flags
    for dotted, value in (overrides or {}).items():
        node: Any = cfg
        *path, leaf = dotted.split(".")
        for part in path:
            node = getattr(node, part)
        setattr(node, leaf, value)
    return cfg
