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


def build_criterion(arch: str, cfg: Config):
    """Per-sample image criterion per arch, mirroring ``generator_init``
    (``interfaces/base.py:255-444``): ImageLoss([1,1e-4]) for the TL/TATT
    family, MSE / L1 / Charbonnier / EdgeImageLoss for the baselines."""
    from functools import partial

    from tatt_tpu.losses.image import (
        charbonnier_loss,
        edge_image_loss,
        image_loss,
        l1_loss,
        mse_loss,
    )

    mse_archs = {"srcnn", "vdsr", "srres", "han", "srcnn_tl", "srresnet_tl", "vdsr_tl", "bicubic"}
    l1_archs = {"esrgan", "scgan", "rdn", "edsr", "esrgan_tl", "scgan_tl", "rdn_tl"}
    if arch in mse_archs:
        return mse_loss
    if arch in l1_archs:
        return l1_loss
    if arch == "lapsrn":
        return charbonnier_loss
    if arch == "pcan":
        return edge_image_loss
    return partial(image_loss, gradient=cfg.args.gradient, loss_weight=(1.0, 1e-4))


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
        text_emb=cfg.MODEL.text_emb,
        # the TP decoder uses stem features as queries, so the prior width
        # must equal 2*hidden_units (64 at reference defaults)
        out_text_channels=2 * cfg.args.hd_u,
        query_gru_mode=getattr(cfg.MODEL, "query_gru_mode", "width"),
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


def _planes(cfg: Config) -> int:
    return 4 if cfg.args.mask else 3


@register("srcnn")
def _srcnn(cfg: Config):
    from tatt_tpu.models.zoo.simple import SRCNN

    # reference feeds srcnn/vdsr/rdn 3 channels regardless of --mask
    # (super_resolution.py:1038-1043)
    return SRCNN(scale_factor=cfg.scale_factor, in_planes=3)


@register("srcnn_tl")
def _srcnn_tl(cfg: Config):
    from tatt_tpu.models.zoo.simple import SRCNN_TL

    return SRCNN_TL(
        scale_factor=cfg.scale_factor,
        in_planes=_planes(cfg),
        height=cfg.TRAIN.height,
        width=cfg.TRAIN.width,
    )


@register("vdsr")
def _vdsr(cfg: Config):
    from tatt_tpu.models.zoo.simple import VDSR

    return VDSR(scale_factor=cfg.scale_factor, in_planes=3)


@register("vdsr_tl")
def _vdsr_tl(cfg: Config):
    from tatt_tpu.models.zoo.simple import VDSR_TL

    return VDSR_TL(
        scale_factor=cfg.scale_factor,
        in_planes=_planes(cfg),
        height=cfg.TRAIN.height,
        width=cfg.TRAIN.width,
    )


@register("scgan")
def _scgan(cfg: Config):
    from tatt_tpu.models.zoo.simple import SCGAN

    return SCGAN(scale_factor=cfg.scale_factor, in_planes=_planes(cfg))


@register("scgan_tl")
def _scgan_tl(cfg: Config):
    from tatt_tpu.models.zoo.simple import SCGAN_TL

    return SCGAN_TL(
        scale_factor=cfg.scale_factor,
        in_planes=_planes(cfg),
        height=cfg.TRAIN.height,
        width=cfg.TRAIN.width,
    )


@register("bicubic")
def _bicubic(cfg: Config):
    from tatt_tpu.models.zoo.simple import BICUBIC

    return BICUBIC(scale_factor=cfg.scale_factor)


@register("srres")
def _srres(cfg: Config):
    from tatt_tpu.models.zoo.resnets import SRResNet

    return SRResNet(scale_factor=cfg.scale_factor, mask=cfg.args.mask)


@register("srresnet_tl")
def _srresnet_tl(cfg: Config):
    from tatt_tpu.models.zoo.resnets import SRResNet_TL

    return SRResNet_TL(
        scale_factor=cfg.scale_factor,
        mask=cfg.args.mask,
        height=cfg.TRAIN.height,
        width=cfg.TRAIN.width,
    )


@register("edsr")
def _edsr(cfg: Config):
    from tatt_tpu.models.zoo.resnets import EDSR

    return EDSR(scale_factor=cfg.scale_factor)


@register("lapsrn")
def _lapsrn(cfg: Config):
    from tatt_tpu.models.zoo.resnets import LapSRN

    return LapSRN(scale_factor=cfg.scale_factor, in_planes=3)


@register("rdn")
def _rdn(cfg: Config):
    from tatt_tpu.models.zoo.resnets import RDN

    return RDN(scale_factor=cfg.scale_factor, in_planes=3)


@register("rdn_tl")
def _rdn_tl(cfg: Config):
    from tatt_tpu.models.zoo.resnets import RDN_TL

    return RDN_TL(scale_factor=cfg.scale_factor, in_planes=_planes(cfg))


@register("esrgan")
def _esrgan(cfg: Config):
    from tatt_tpu.models.zoo.esrgan import RRDBNet

    return RRDBNet(
        scale_factor=cfg.scale_factor, in_nc=_planes(cfg), out_nc=_planes(cfg)
    )


@register("esrgan_tl")
def _esrgan_tl(cfg: Config):
    from tatt_tpu.models.zoo.esrgan import RRDBNet_TL

    return RRDBNet_TL(
        scale_factor=cfg.scale_factor, in_nc=_planes(cfg), out_nc=_planes(cfg)
    )


@register("han")
def _han(cfg: Config):
    from tatt_tpu.models.zoo.han import HAN

    return HAN(scale=cfg.scale_factor)


@register("pcan")
def _pcan(cfg: Config):
    from tatt_tpu.models.zoo.pcan import PCAN

    return PCAN(
        scale_factor=cfg.scale_factor,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("pcan_tl")
def _pcan_tl(cfg: Config):
    from tatt_tpu.models.zoo.pcan import PCAN_TL

    return PCAN_TL(
        scale_factor=cfg.scale_factor,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("tbsrn")
def _tbsrn(cfg: Config):
    # NOTE: the reference CLI lists tbsrn but its factory lacks the branch
    # (base.py:368-369 raises) — we wire it up as evidently intended.
    from tatt_tpu.models.zoo.tbsrn import TBSRN

    return TBSRN(
        scale_factor=cfg.scale_factor,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("tbsrn_tl")
def _tbsrn_tl(cfg: Config):
    from tatt_tpu.models.zoo.tbsrn import TBSRN_TL

    return TBSRN_TL(
        scale_factor=cfg.scale_factor,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("tranSR_v4")
def _transr_v4(cfg: Config):
    from tatt_tpu.models.zoo.transformer_sr import SRTransformerV4

    return SRTransformerV4(
        scale_factor=cfg.scale_factor, in_planes=_planes(cfg)
    )


@register("tsrn_tl_cascade_sft")
def _tsrn_tl_sft(cfg: Config):
    from tatt_tpu.models.tsrn import TSRN_TL_SFT

    return TSRN_TL_SFT(
        scale_factor=cfg.scale_factor,
        width=cfg.TRAIN.width,
        height=cfg.TRAIN.height,
        stn=cfg.args.STN,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
        out_text_channels=2 * cfg.args.hd_u,
    )


@register("tsrn_c2f")
def _tsrn_c2f(cfg: Config):
    from tatt_tpu.models.tsrn import TSRN_C2F

    return TSRN_C2F(
        scale_factor=cfg.scale_factor,
        stn=cfg.args.STN,
        srb_nums=cfg.args.srb,
        mask=cfg.args.mask,
        hidden_units=cfg.args.hd_u,
    )


@register("sem_tsrn")
def _sem_tsrn(cfg: Config):
    from tatt_tpu.models.tsrn import SEM_TSRN

    return SEM_TSRN(
        scale_factor=cfg.scale_factor,
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
