"""ASTER encoder/decoder parity vs torch implementations mirroring the
reference architecture (``model/recognizer/resnet_aster.py``,
``attention_recognition_head.py``)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tatt_tpu.core.torch_import import import_aster
from tatt_tpu.models.recognizers.aster import AsterRecognizer


def _make_torch_encoder():
    class AsterBlock(nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, stride, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            res = x
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                res = self.downsample(x)
            return F.relu(out + res)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer0 = nn.Sequential(
                nn.Conv2d(3, 32, 3, 1, 1, bias=False),
                nn.BatchNorm2d(32),
                nn.ReLU(True),
            )
            self.inplanes = 32

            def make(planes, blocks, stride):
                downsample = None
                if stride != [1, 1] or self.inplanes != planes:
                    downsample = nn.Sequential(
                        nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                        nn.BatchNorm2d(planes),
                    )
                layers = [AsterBlock(self.inplanes, planes, stride, downsample)]
                self.inplanes = planes
                for _ in range(1, blocks):
                    layers.append(AsterBlock(planes, planes))
                return nn.Sequential(*layers)

            self.layer1 = make(32, 3, [2, 2])
            self.layer2 = make(64, 4, [2, 2])
            self.layer3 = make(128, 6, [2, 1])
            self.layer4 = make(256, 6, [2, 1])
            self.layer5 = make(512, 3, [2, 1])
            self.rnn = nn.LSTM(512, 256, bidirectional=True, num_layers=2, batch_first=True)

        def forward(self, x):
            x = self.layer0(x)
            for l in (self.layer1, self.layer2, self.layer3, self.layer4, self.layer5):
                x = l(x)
            feat = x.squeeze(2).transpose(2, 1)
            return self.rnn(feat)[0]

    return Enc()


def test_aster_encoder_parity():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    enc = _make_torch_encoder().eval()
    x = np.random.default_rng(0).standard_normal((1, 3, 32, 100)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in enc.state_dict().items()}
    # rename downsample Sequential keys to match reference layout
    # (torch already names them layerN.M.downsample.0/.1 — identical)
    # build full variables with a dummy decoder/stn via init, then overlay
    import jax
    import jax.numpy as jnp

    model = AsterRecognizer(num_classes=97, max_len=4, stn_on=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 100))
    )
    partial = import_aster({**sd, **_dummy_decoder_sd()})
    params = dict(variables["params"])
    params["encoder"] = partial["params"]["encoder"]
    stats = dict(variables.get("batch_stats", {}))
    stats["encoder"] = partial["batch_stats"]["encoder"]

    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        False,
        method=AsterRecognizer.encode,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def _dummy_decoder_sd():
    """Minimal decoder + stn keys so import_aster can run (values unused
    by the encoder parity check)."""
    rng = np.random.default_rng(1)
    sd = {}
    d = "decoder.decoder"
    sd[f"{d}.attention_unit.sEmbed.weight"] = rng.standard_normal((512, 512)).astype(np.float32)
    sd[f"{d}.attention_unit.sEmbed.bias"] = np.zeros(512, np.float32)
    sd[f"{d}.attention_unit.xEmbed.weight"] = rng.standard_normal((512, 512)).astype(np.float32)
    sd[f"{d}.attention_unit.xEmbed.bias"] = np.zeros(512, np.float32)
    sd[f"{d}.attention_unit.wEmbed.weight"] = rng.standard_normal((1, 512)).astype(np.float32)
    sd[f"{d}.attention_unit.wEmbed.bias"] = np.zeros(1, np.float32)
    sd[f"{d}.tgt_embedding.weight"] = rng.standard_normal((98, 512)).astype(np.float32)
    sd[f"{d}.gru.weight_ih_l0"] = rng.standard_normal((1536, 1024)).astype(np.float32)
    sd[f"{d}.gru.weight_hh_l0"] = rng.standard_normal((1536, 512)).astype(np.float32)
    sd[f"{d}.gru.bias_ih_l0"] = np.zeros(1536, np.float32)
    sd[f"{d}.gru.bias_hh_l0"] = np.zeros(1536, np.float32)
    sd[f"{d}.fc.weight"] = rng.standard_normal((97, 512)).astype(np.float32)
    sd[f"{d}.fc.bias"] = np.zeros(97, np.float32)
    # stn head (6 conv blocks + fcs)
    chans = [(3, 32), (32, 64), (64, 128), (128, 256), (256, 256), (256, 256)]
    for i, (cin, cout) in enumerate(chans):
        bi = [0, 2, 4, 6, 8, 10][i]
        sd[f"stn_head.stn_convnet.{bi}.0.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)
        ).astype(np.float32)
        sd[f"stn_head.stn_convnet.{bi}.0.bias"] = np.zeros(cout, np.float32)
        sd[f"stn_head.stn_convnet.{bi}.1.weight"] = np.ones(cout, np.float32)
        sd[f"stn_head.stn_convnet.{bi}.1.bias"] = np.zeros(cout, np.float32)
        sd[f"stn_head.stn_convnet.{bi}.1.running_mean"] = np.zeros(cout, np.float32)
        sd[f"stn_head.stn_convnet.{bi}.1.running_var"] = np.ones(cout, np.float32)
    sd["stn_head.stn_fc1.0.weight"] = rng.standard_normal((512, 512)).astype(np.float32)
    sd["stn_head.stn_fc1.0.bias"] = np.zeros(512, np.float32)
    sd["stn_head.stn_fc1.1.weight"] = np.ones(512, np.float32)
    sd["stn_head.stn_fc1.1.bias"] = np.zeros(512, np.float32)
    sd["stn_head.stn_fc1.1.running_mean"] = np.zeros(512, np.float32)
    sd["stn_head.stn_fc1.1.running_var"] = np.ones(512, np.float32)
    sd["stn_head.stn_fc2.weight"] = np.zeros((40, 512), np.float32)
    sd["stn_head.stn_fc2.bias"] = np.zeros(40, np.float32)
    return sd


def test_aster_decoder_step_parity():
    torch.manual_seed(1)
    torch.set_num_threads(1)
    s_dim = att_dim = 32
    x_dim = 16
    nc = 10

    s_embed = nn.Linear(s_dim, att_dim)
    x_embed = nn.Linear(x_dim, att_dim)
    w_embed = nn.Linear(att_dim, 1)
    emb = nn.Embedding(nc + 1, att_dim)
    gru = nn.GRU(input_size=x_dim + att_dim, hidden_size=s_dim, batch_first=True)
    fc = nn.Linear(s_dim, nc)

    B, T = 3, 7
    x = torch.randn(B, T, x_dim)
    state = torch.randn(1, B, s_dim)
    y_prev = torch.tensor([0, 4, nc])

    with torch.no_grad():
        xp = x_embed(x)
        sp = s_embed(state.squeeze(0)).unsqueeze(1)
        alpha = F.softmax(w_embed(torch.tanh(sp + xp)).squeeze(-1), dim=1)
        context = torch.bmm(alpha.unsqueeze(1), x).squeeze(1)
        y_proj = emb(y_prev)
        out, new_state = gru(torch.cat([y_proj, context], 1).unsqueeze(1), state)
        want_logits = fc(out.squeeze(1)).numpy()

    # run ours with the same weights
    from tatt_tpu.models.recognizers.aster import AsterDecoderParams
    import jax
    import jax.numpy as jnp

    dec = AsterDecoderParams(num_classes=nc, in_planes=x_dim, s_dim=s_dim, att_dim=att_dim)
    variables = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, T, x_dim)), 1)
    p = {
        "sEmbed_kernel": s_embed.weight.detach().numpy().T,
        "sEmbed_bias": s_embed.bias.detach().numpy(),
        "xEmbed_kernel": x_embed.weight.detach().numpy().T,
        "xEmbed_bias": x_embed.bias.detach().numpy(),
        "wEmbed_kernel": w_embed.weight.detach().numpy().T,
        "wEmbed_bias": w_embed.bias.detach().numpy(),
        "tgt_embedding": emb.weight.detach().numpy(),
        "gru_w_ih": gru.weight_ih_l0.detach().numpy(),
        "gru_w_hh": gru.weight_hh_l0.detach().numpy(),
        "gru_b_ih": gru.bias_ih_l0.detach().numpy(),
        "gru_b_hh": gru.bias_hh_l0.detach().numpy(),
        "fc_kernel": fc.weight.detach().numpy().T,
        "fc_bias": fc.bias.detach().numpy(),
    }

    def run(dec_mod):
        xp_j = dec_mod.x_embed(jnp.asarray(x.numpy()))
        return dec_mod.decode_step(
            xp_j,
            jnp.asarray(x.numpy()),
            jnp.asarray(state.squeeze(0).numpy()),
            jnp.asarray(y_prev.numpy()),
        )

    (got_logits, got_state) = dec.apply({"params": p}, method=run)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=3e-5, rtol=1e-3)
