"""Import reference PyTorch ``.pth`` weights into tatt_tpu flax trees.

The pretrained recognizers are *inputs* to the system, not retrained
(reference ``README.md:28-35``: crnn.pth, ASTER, MORAN demo weights).
This module maps their state dicts onto our module trees.  torch (CPU)
is only imported lazily here — the training/runtime path never needs it.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if isinstance(blob, dict) and "state_dict_G" in blob:
        blob = blob["state_dict_G"]
    return {k.replace("module.", ""): _np(v) for k, v in blob.items()}


def _to_device(variables: dict) -> dict:
    """numpy -> jax arrays: model code may eagerly fancy-index imported
    tables (e.g. embedding lookups) with traced ids, which numpy leaves
    cannot satisfy."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, variables)


def _conv(sd: Mapping[str, np.ndarray], name: str, bias: bool = True) -> dict:
    out = {"kernel": sd[f"{name}.weight"]}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _bn(sd: Mapping[str, np.ndarray], name: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _linear(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _birnn(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "w_ih": np.stack(
            [sd[f"{name}.weight_ih_l0"], sd[f"{name}.weight_ih_l0_reverse"]]
        ),
        "w_hh": np.stack(
            [sd[f"{name}.weight_hh_l0"], sd[f"{name}.weight_hh_l0_reverse"]]
        ),
        "b_ih": np.stack(
            [sd[f"{name}.bias_ih_l0"], sd[f"{name}.bias_ih_l0_reverse"]]
        ),
        "b_hh": np.stack(
            [sd[f"{name}.bias_hh_l0"], sd[f"{name}.bias_hh_l0_reverse"]]
        ),
    }


def _birnn_layer(sd: Mapping[str, np.ndarray], name: str, layer: int) -> dict:
    lx = f"l{layer}"
    return {
        f"w_ih_{lx}": np.stack(
            [sd[f"{name}.weight_ih_{lx}"], sd[f"{name}.weight_ih_{lx}_reverse"]]
        ),
        f"w_hh_{lx}": np.stack(
            [sd[f"{name}.weight_hh_{lx}"], sd[f"{name}.weight_hh_{lx}_reverse"]]
        ),
        f"b_ih_{lx}": np.stack(
            [sd[f"{name}.bias_ih_{lx}"], sd[f"{name}.bias_ih_{lx}_reverse"]]
        ),
        f"b_hh_{lx}": np.stack(
            [sd[f"{name}.bias_hh_{lx}"], sd[f"{name}.bias_hh_{lx}_reverse"]]
        ),
    }


def import_aster(path_or_sd, blocks=(3, 4, 6, 6, 3)) -> dict:
    """Reference ASTER checkpoint (``model/recognizer/``) -> flax variables
    for :class:`tatt_tpu.models.recognizers.aster.AsterRecognizer`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    # --- STN head: stn_convnet indices 0,2,4,6,8,10 hold conv blocks
    stn_p, stn_s = {}, {}
    block_ids = [0, 2, 4, 6, 8, 10]
    for i, bi in enumerate(block_ids):
        stn_p[f"conv{i}"] = _conv(sd, f"stn_head.stn_convnet.{bi}.0")
        p, s = _bn(sd, f"stn_head.stn_convnet.{bi}.1")
        stn_p[f"bn{i}"] = p
        stn_s[f"bn{i}"] = s
    stn_p["fc1"] = _linear(sd, "stn_head.stn_fc1.0")
    p, s = _bn(sd, "stn_head.stn_fc1.1")
    stn_p["fc1_bn"] = p
    stn_s["fc1_bn"] = s
    stn_p["fc2_kernel"] = sd["stn_head.stn_fc2.weight"].T
    stn_p["fc2_bias"] = sd["stn_head.stn_fc2.bias"]
    params["stn_head"] = stn_p
    stats["stn_head"] = stn_s

    # --- encoder
    enc_p: dict[str, Any] = {"conv0": _conv(sd, "encoder.layer0.0", bias=False)}
    enc_s: dict[str, Any] = {}
    p, s = _bn(sd, "encoder.layer0.1")
    enc_p["bn0"] = p
    enc_s["bn0"] = s
    for li, nblocks in enumerate(blocks):
        for bi in range(nblocks):
            pre = f"encoder.layer{li+1}.{bi}"
            bp: dict[str, Any] = {
                "conv1": _conv(sd, f"{pre}.conv1", bias=False),
                "conv2": _conv(sd, f"{pre}.conv2", bias=False),
            }
            bs: dict[str, Any] = {}
            for bn in ("bn1", "bn2"):
                p, s = _bn(sd, f"{pre}.{bn}")
                bp[bn] = p
                bs[bn] = s
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{pre}.downsample.0", bias=False)
                p, s = _bn(sd, f"{pre}.downsample.1")
                bp["downsample_bn"] = p
                bs["downsample_bn"] = s
            enc_p[f"layer{li+1}_{bi}"] = bp
            enc_s[f"layer{li+1}_{bi}"] = bs
    enc_p["rnn"] = {**_birnn_layer(sd, "encoder.rnn", 0), **_birnn_layer(sd, "encoder.rnn", 1)}
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    # --- decoder
    dec = "decoder.decoder"
    dparams: dict[str, Any] = {
        "tgt_embedding": sd[f"{dec}.tgt_embedding.weight"],
        "gru_w_ih": sd[f"{dec}.gru.weight_ih_l0"],
        "gru_w_hh": sd[f"{dec}.gru.weight_hh_l0"],
        "gru_b_ih": sd[f"{dec}.gru.bias_ih_l0"],
        "gru_b_hh": sd[f"{dec}.gru.bias_hh_l0"],
    }
    for ours, theirs in [
        ("sEmbed", f"{dec}.attention_unit.sEmbed"),
        ("xEmbed", f"{dec}.attention_unit.xEmbed"),
        ("wEmbed", f"{dec}.attention_unit.wEmbed"),
        ("fc", f"{dec}.fc"),
    ]:
        lin = _linear(sd, theirs)
        dparams[f"{ours}_kernel"] = lin["kernel"]
        dparams[f"{ours}_bias"] = lin["bias"]
    params["decoder"] = dparams
    return _to_device({"params": params, "batch_stats": stats})


def import_moran(path_or_sd) -> dict:
    """Reference MORAN demo checkpoint (``model/moran/``) -> flax variables
    for :class:`tatt_tpu.models.recognizers.moran.MORAN`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    # MORN cnn Sequential indices: convs at 1,5,9,12,15; BNs at 2,6,10,13,16
    morn_p, morn_s = {}, {}
    for i, (ci, bi) in enumerate([(1, 2), (5, 6), (9, 10), (12, 13), (15, 16)], 1):
        morn_p[f"conv{i}"] = _conv(sd, f"MORN.cnn.{ci}")
        p, s = _bn(sd, f"MORN.cnn.{bi}")
        morn_p[f"bn{i}"] = p
        morn_s[f"bn{i}"] = s
    params["MORN"] = {"offsets": morn_p}
    stats["MORN"] = {"offsets": morn_s}

    cnn_p: dict[str, Any] = {"block0_conv": _conv(sd, "ASRN.cnn.block0.0")}
    cnn_s: dict[str, Any] = {}
    p, s = _bn(sd, "ASRN.cnn.block0.1")
    cnn_p["block0_bn"] = p
    cnn_s["block0_bn"] = s
    plan = [3, 4, 6, 6, 3]
    for li, rep in enumerate(plan, start=1):
        for bi in range(rep):
            pre = f"ASRN.cnn.block{li}.{bi}"
            bp = {
                "conv1": _conv(sd, f"{pre}.conv1.0"),
                "conv2": _conv(sd, f"{pre}.conv2.0"),
            }
            bs = {}
            p, s = _bn(sd, f"{pre}.conv1.1")
            bp["bn1"] = p
            bs["bn1"] = s
            p, s = _bn(sd, f"{pre}.conv2.1")
            bp["bn2"] = p
            bs["bn2"] = s
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{pre}.downsample.0")
                p, s = _bn(sd, f"{pre}.downsample.1")
                bp["downsample_bn"] = p
                bs["downsample_bn"] = s
            cnn_p[f"block{li}_{bi}"] = bp
            cnn_s[f"block{li}_{bi}"] = bs
    params["cnn"] = cnn_p
    stats["cnn"] = cnn_s

    for j in (0, 1):
        params[f"rnn{j}"] = _birnn(sd, f"ASRN.rnn.{j}.rnn")
        params[f"rnn{j}_embedding"] = _linear(sd, f"ASRN.rnn.{j}.embedding")

    for att in ("attentionL2R", "attentionR2L"):
        pre = f"ASRN.{att}"
        params[att] = {
            "i2h_w": sd[f"{pre}.attention_cell.i2h.weight"],
            "h2h_w": sd[f"{pre}.attention_cell.h2h.weight"],
            "h2h_b": sd[f"{pre}.attention_cell.h2h.bias"],
            "score_w": sd[f"{pre}.attention_cell.score.weight"],
            "gru_w_ih": sd[f"{pre}.attention_cell.rnn.weight_ih"],
            "gru_w_hh": sd[f"{pre}.attention_cell.rnn.weight_hh"],
            "gru_b_ih": sd[f"{pre}.attention_cell.rnn.bias_ih"],
            "gru_b_hh": sd[f"{pre}.attention_cell.rnn.bias_hh"],
            "generator_w": sd[f"{pre}.generator.weight"],
            "generator_b": sd[f"{pre}.generator.bias"],
            "char_embeddings": sd[f"{pre}.char_embeddings"],
        }
    return _to_device({"params": params, "batch_stats": stats})


def import_tatt(path_or_sd, srb_nums: int = 5) -> dict:
    """Reference TATT generator checkpoint (``state_dict_G`` of
    ``TSRN_TL_TRANS``, ``model/tsrn.py:576-692``) -> flax variables for
    :class:`tatt_tpu.models.tsrn.TATT`.

    NOTE: to reproduce reference inference exactly, build the model with
    ``query_gru_mode='reference'`` (the checkpoint was trained under the
    batch_first query-GRU quirk).
    """
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def bn_into(pdict, sdict, ours, theirs):
        p, s = _bn(sd, theirs)
        pdict[ours] = p
        sdict[ours] = s

    params["block1_conv"] = _conv(sd, "block1.0")
    params["block1_act"] = {"alpha": sd["block1.1.weight"]}

    # --- STN head + TPS (present when trained with --STN; used only in
    # train-mode forwards, model/tsrn.py:648-650). Same Sequential layout
    # as the ASTER head (conv blocks at indices 0,2,4,6,8,10).
    if "stn_head.stn_fc2.weight" in sd:
        stn_p, stn_s = {}, {}
        for i, bi in enumerate((0, 2, 4, 6, 8, 10)):
            stn_p[f"conv{i}"] = _conv(sd, f"stn_head.stn_convnet.{bi}.0")
            p, s = _bn(sd, f"stn_head.stn_convnet.{bi}.1")
            stn_p[f"bn{i}"] = p
            stn_s[f"bn{i}"] = s
        stn_p["fc1"] = _linear(sd, "stn_head.stn_fc1.0")
        p, s = _bn(sd, "stn_head.stn_fc1.1")
        stn_p["fc1_bn"] = p
        stn_s["fc1_bn"] = s
        stn_p["fc2_kernel"] = sd["stn_head.stn_fc2.weight"].T
        stn_p["fc2_bias"] = sd["stn_head.stn_fc2.bias"]
        params["stn_head"] = stn_p
        stats["stn_head"] = stn_s

    for i in range(srb_nums):
        blk = f"block{i+2}"
        bp: dict[str, Any] = {
            "conv1": _conv(sd, f"{blk}.conv1"),
            "conv2": _conv(sd, f"{blk}.conv2"),
        }
        bs: dict[str, Any] = {}
        p, s = _bn(sd, f"{blk}.bn1")
        bp["bn1"] = p
        bs["bn1"] = s
        p, s = _bn(sd, f"{blk}.bn2")
        bp["bn2"] = p
        bs["bn2"] = s
        for g in ("gru1", "gru2"):
            bp[g] = {
                "conv1": _conv(sd, f"{blk}.{g}.conv1"),
                "gru": _birnn(sd, f"{blk}.{g}.gru"),
            }
        params[f"srb{i+2}"] = bp
        stats[f"srb{i+2}"] = bs

    # --- TPInterpreter
    tpi_p: dict[str, Any] = {
        "fc_in": _linear(sd, "infoGen.fc_in"),
        "fc_in_act": {"alpha": sd["infoGen.activation.weight"]},
        "init_factor": sd["infoGen.init_factor.weight"],
        "gru_encoding": _birnn(sd, "infoGen.transformer.gru_encoding"),
    }

    def attn(theirs):
        return {
            "in_proj_weight": sd[f"{theirs}.in_proj_weight"],
            "in_proj_bias": sd[f"{theirs}.in_proj_bias"],
            "out_proj_weight": sd[f"{theirs}.out_proj.weight"],
            "out_proj_bias": sd[f"{theirs}.out_proj.bias"],
        }

    def norm(theirs):
        return {"scale": sd[f"{theirs}.weight"], "bias": sd[f"{theirs}.bias"]}

    enc = "infoGen.transformer.encoder.layers.0"
    tpi_p["encoder_0"] = {
        "self_attn": attn(f"{enc}.self_attn"),
        "linear1": _linear(sd, f"{enc}.linear1"),
        "linear2": _linear(sd, f"{enc}.linear2"),
        "norm1": norm(f"{enc}.norm1"),
        "norm2": norm(f"{enc}.norm2"),
    }
    for k in (0, 1):
        dec = f"infoGen.transformer.decoder.layers.{k}"
        # the reference layer also carries an unused self_attn + norm1 —
        # intentionally not imported (self-attention is disabled,
        # transformer_v2.py:817-819)
        tpi_p[f"decoder_{k}"] = {
            "multihead_attn": attn(f"{dec}.multihead_attn"),
            "linear1": _linear(sd, f"{dec}.linear1"),
            "linear2": _linear(sd, f"{dec}.linear2"),
            "norm2": norm(f"{dec}.norm2"),
            "norm3": norm(f"{dec}.norm3"),
        }
    tpi_p["decoder_norm"] = norm("infoGen.transformer.decoder.norm")
    params["infoGen"] = tpi_p

    params["post_conv"] = _conv(sd, f"block{srb_nums+2}.0")
    p, s = _bn(sd, f"block{srb_nums+2}.1")
    params["post_bn"] = p
    stats["post_bn"] = s

    params["up0"] = {"conv": _conv(sd, f"block{srb_nums+3}.0.conv")}
    params["final_conv"] = _conv(sd, f"block{srb_nums+3}.1")
    return _to_device({"params": params, "batch_stats": stats})


def _infogen(sd: Mapping[str, np.ndarray], pre: str) -> tuple[dict, dict]:
    """InfoGen deconv stack (``model/tsrn.py:284-317`` and the per-arch
    clones): tconv1-4 (bias-free) + bn1-4."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i in range(1, 5):
        params[f"tconv{i}"] = {"kernel": sd[f"{pre}.tconv{i}.weight"]}
        p, s = _bn(sd, f"{pre}.bn{i}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def _feature_enhancer(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    """TBSRN FeatureEnhancer (``model/tbsrn.py:63-93``).  Its hand-rolled
    MultiHeadedAttention keeps q/k/v/out as 4 separate Linears
    (``tbsrn.py:96-131``); pack the first three into our torch-
    ``nn.MultiheadAttention``-layout in_proj."""
    mh = f"{pre}.multihead.linears"
    return {
        "multihead": {
            "in_proj_weight": np.concatenate(
                [sd[f"{mh}.{i}.weight"] for i in range(3)], axis=0
            ),
            "in_proj_bias": np.concatenate(
                [sd[f"{mh}.{i}.bias"] for i in range(3)], axis=0
            ),
            "out_proj_weight": sd[f"{mh}.3.weight"],
            "out_proj_bias": sd[f"{mh}.3.bias"],
        },
        "norm1": {
            "a_2": sd[f"{pre}.mul_layernorm1.a_2"],
            "b_2": sd[f"{pre}.mul_layernorm1.b_2"],
        },
        "norm3": {
            "a_2": sd[f"{pre}.mul_layernorm3.a_2"],
            "b_2": sd[f"{pre}.mul_layernorm3.b_2"],
        },
        "pff_w1": _linear(sd, f"{pre}.pff.w_1"),
        "pff_w2": _linear(sd, f"{pre}.pff.w_2"),
        "linear": _linear(sd, f"{pre}.linear"),
    }


def tbsrn_block_variables(
    sd: Mapping[str, np.ndarray], pre: str = ""
) -> tuple[dict, dict]:
    """One ``RecurrentResidualBlock_TL`` (``model/tbsrn.py:380-416``) ->
    (params, batch_stats) for :class:`...zoo.tbsrn.TBSRNBlock`.  The
    reference block also constructs gru1/gru2 GruBlocks it never calls in
    ``forward`` — their entries are intentionally not imported."""
    dot = f"{pre}." if pre else ""
    bp: dict[str, Any] = {
        "conv1": _conv(sd, f"{dot}conv1"),
        "conv2": _conv(sd, f"{dot}conv2"),
        "conv_proj": _conv(sd, f"{dot}conv_proj"),
        "feature_enhancer": _feature_enhancer(sd, f"{dot}feature_enhancer"),
    }
    bs: dict[str, Any] = {}
    for bn in ("bn1", "bn2"):
        p, s = _bn(sd, f"{dot}{bn}")
        bp[bn] = p
        bs[bn] = s
    return bp, bs


def import_tbsrn_tl(path_or_sd, srb_nums: int = 5) -> dict:
    """Reference ``TBSRN_TL`` (``model/tbsrn.py:266-346``) -> flax variables
    for :class:`tatt_tpu.models.zoo.tbsrn.TBSRN_TL`.

    Skipped state-dict groups (dead in the reference forward): the
    ``conv``/``bn`` pair defined but never called (``tbsrn.py:283-285``),
    the per-block ``gru1``/``gru2`` GruBlocks (``tbsrn.py:389-395``, unused
    in ``forward``), and the train-only ``stn_head``/``tps``."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {
        "block1_conv": _conv(sd, "block1.0"),
        "block1_act": {"alpha": sd["block1.1.weight"]},
    }
    stats: dict[str, Any] = {}
    for i in range(srb_nums):
        blk = f"block{i+2}"
        bp, bs = tbsrn_block_variables(sd, blk)
        params[blk] = bp
        stats[blk] = bs
    p, s = _infogen(sd, "infoGen")
    params["infoGen"] = p
    stats["infoGen"] = s
    params["post_conv"] = _conv(sd, f"block{srb_nums+2}.0")
    p, s = _bn(sd, f"block{srb_nums+2}.1")
    params["post_bn"] = p
    stats["post_bn"] = s
    params["up0"] = {"conv": _conv(sd, f"block{srb_nums+3}.0.conv")}
    params["final"] = _conv(sd, f"block{srb_nums+3}.1")
    return _to_device({"params": params, "batch_stats": stats})


def import_han(path_or_sd, n_resgroups: int = 10, n_resblocks: int = 20) -> dict:
    """Reference ``HAN`` (``model/han.py:193-265``) -> flax variables for
    :class:`tatt_tpu.models.zoo.han.HAN`.  ``sub_mean``/``add_mean`` are
    fixed MeanShift convs (``han.py:10-20``) that we hard-code."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {"head": _conv(sd, "head.0")}
    for g in range(n_resgroups):
        gp: dict[str, Any] = {}
        for b in range(n_resblocks):
            pre = f"body.{g}.body.{b}"
            gp[f"rcab{b}"] = {
                "conv1": _conv(sd, f"{pre}.body.0"),
                "conv2": _conv(sd, f"{pre}.body.2"),
                "ca": {
                    "down": _conv(sd, f"{pre}.body.3.conv_du.0"),
                    "up": _conv(sd, f"{pre}.body.3.conv_du.2"),
                },
            }
        gp["conv_tail"] = _conv(sd, f"body.{g}.body.{n_resblocks}")
        params[f"group{g}"] = gp
    params["body_tail"] = _conv(sd, f"body.{n_resgroups}")
    params["la"] = {"gamma": sd["la.gamma"]}
    params["csa"] = {
        "gamma": sd["csa.gamma"],
        "conv3d_kernel": sd["csa.conv.weight"],
        "conv3d_bias": sd["csa.conv.bias"],
    }
    params["last_conv"] = _conv(sd, "last_conv")
    params["last"] = _conv(sd, "last")
    params["up0"] = _conv(sd, "tail.0.0")
    params["tail"] = _conv(sd, "tail.1")
    return _to_device({"params": params})


def import_rdn_tl(path_or_sd, n_dense: int = 6) -> dict:
    """Reference ``RDN_TL`` (``model/rdn.py:158-212``) -> flax variables for
    :class:`tatt_tpu.models.zoo.resnets.RDN_TL`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    for name in ("conv1", "conv2", "GFF_1x1", "GFF_3x3", "conv_up", "conv3"):
        params[name] = _conv(sd, name)
    for k in (1, 2, 3):
        rp: dict[str, Any] = {}
        for i in range(n_dense):
            rp[f"dense{i}"] = _conv(sd, f"RDB{k}.dense_layers.{i}.conv", bias=False)
        rp["conv_1x1"] = _conv(sd, f"RDB{k}.conv_1x1", bias=False)
        params[f"RDB{k}"] = rp
    p, s = _infogen(sd, "infoGen")
    params["infoGen"] = p
    return _to_device({"params": params, "batch_stats": {"infoGen": s}})


def import_esrgan_tl(path_or_sd, nb: int = 23) -> dict:
    """Reference ``RRDBNet_TL`` (``model/esrgan.py:150-191``) -> flax
    variables for :class:`tatt_tpu.models.zoo.esrgan.RRDBNet_TL`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {
        "conv_first": _conv(sd, "conv_first"),
        "trunk_conv": _conv(sd, "trunk_conv"),
        "upconv1": _conv(sd, "upconv1"),
        "HRconv": _conv(sd, "HRconv"),
        "conv_last": _conv(sd, "conv_last"),
    }
    stats: dict[str, Any] = {}
    for i in range(nb):
        pre = f"RRDB_trunk.{i}"
        bp: dict[str, Any] = {"proj": _conv(sd, f"{pre}.proj")}
        bs: dict[str, Any] = {}
        for j in (1, 2, 3):
            bp[f"RDB{j}"] = {
                f"conv{k}": _conv(sd, f"{pre}.RDB{j}.conv{k}") for k in range(1, 6)
            }
        p, s = _bn(sd, f"{pre}.bn2")
        bp["bn2"] = p
        bs["bn2"] = s
        params[f"RRDB{i}"] = bp
        stats[f"RRDB{i}"] = bs
    p, s = _infogen(sd, "infoGen")
    params["infoGen"] = p
    stats["infoGen"] = s
    return _to_device({"params": params, "batch_stats": stats})


def import_crnn(path_or_sd) -> dict:
    """Reference ``crnn.pth`` (``model/crnn/crnn.py``) -> flax variables
    for :class:`tatt_tpu.models.recognizers.crnn.CRNN`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i in range(7):
        params[f"conv{i}"] = _conv(sd, f"cnn.conv{i}")
    for i in (2, 4, 6):
        p, s = _bn(sd, f"cnn.batchnorm{i}")
        params[f"batchnorm{i}"] = p
        stats[f"batchnorm{i}"] = s
    for j in (0, 1):
        params[f"rnn{j}"] = {
            "rnn": _birnn(sd, f"rnn.{j}.rnn"),
            "embedding": _linear(sd, f"rnn.{j}.embedding"),
        }
    return _to_device({"params": params, "batch_stats": stats})
