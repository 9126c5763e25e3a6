"""Arch-name -> generator factory.

The reference's ``TextBase.generator_init`` (``interfaces/base.py:255-444``)
maps ~25 arch flags to model + criterion.  Here each entry builds a flax
module with the same constructor knobs; the criterion configuration is
uniform (ImageLoss weights [1, 1e-4] for every TL arch, ``base.py:265``).

Registry entries are added as model families land; ``ABLATION_SET`` mirrors
``super_resolution.py:59-61`` (archs that take a text prior + 9-tuple data).
"""

from __future__ import annotations

from typing import Any, Callable

from tatt_tpu.core.config import Config

ABLATION_SET = [
    "tsrn_tl_cascade_sft",
    "tsrn_tl_cascade",
    "srcnn_tl",
    "srresnet_tl",
    "rdn_tl",
    "vdsr_tl",
    "tranSR_v4",
    "esrgan_tl",
    "scgan_tl",
    "tbsrn_tl",
    "tatt",
    "pcan_tl",
]

_REGISTRY: dict[str, Callable[[Config], Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build_generator(arch: str, cfg: Config):
    if arch not in _REGISTRY:
        raise ValueError(
            f"arch '{arch}' not implemented (have: {sorted(_REGISTRY)})"
        )
    return _REGISTRY[arch](cfg)


def available_archs() -> list[str]:
    return sorted(_REGISTRY)


@register("tatt")
def _tatt(cfg: Config):
    from tatt_tpu.models.tsrn import TATT

    return TATT(
        scale_factor=cfg.scale_factor,
        width=cfg.TRAIN.width,
        height=cfg.TRAIN.height,
        stn=cfg.args.STN,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
        # the TP decoder uses stem features as queries, so the prior width
        # must equal 2*hidden_units (64 at reference defaults)
        out_text_channels=2 * cfg.args.hd_u,
    )


@register("tsrn")
def _tsrn(cfg: Config):
    from tatt_tpu.models.tsrn import TSRN

    return TSRN(
        scale_factor=cfg.scale_factor,
        width=cfg.TRAIN.width,
        height=cfg.TRAIN.height,
        stn=cfg.args.STN,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("tsrn_tl_cascade")
def _tsrn_tl(cfg: Config):
    from tatt_tpu.models.tsrn import TSRN_TL

    return TSRN_TL(
        scale_factor=cfg.scale_factor,
        width=cfg.TRAIN.width,
        height=cfg.TRAIN.height,
        stn=cfg.args.STN,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
        out_text_channels=cfg.MODEL.out_text_channels,
    )
