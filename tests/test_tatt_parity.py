"""Full TATT generator forward parity vs a torch reconstruction of the
reference architecture (``model/tsrn.py:576-692`` + ``transformer_v2.py``),
using the checkpoint importer and the 'reference' query-GRU compat mode."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tatt_tpu.core.torch_import import import_tatt
from tatt_tpu.models.tsrn import TATT


class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class GruBlock(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 1)
        self.gru = nn.GRU(c_out, c_out // 2, bidirectional=True, batch_first=True)

    def forward(self, x):
        x = self.conv1(x)
        x = x.permute(0, 2, 3, 1).contiguous()
        b = x.size()
        x, _ = self.gru(x.view(b[0] * b[1], b[2], b[3]))
        return x.view(b[0], b[1], b[2], b[3]).permute(0, 3, 1, 2)


class SRB(nn.Module):
    def __init__(self, channels, text_channels):
        super().__init__()
        self.conv1 = nn.Conv2d(channels, channels, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(channels)
        self.gru1 = GruBlock(channels + text_channels, channels)
        self.prelu = Mish()
        self.conv2 = nn.Conv2d(channels, channels, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(channels)
        self.gru2 = GruBlock(channels, channels)

    def forward(self, x, tp):
        r = self.bn1(self.conv1(x))
        r = self.prelu(r)
        r = self.bn2(self.conv2(r))
        cat = torch.cat([r, tp], 1)
        r = self.gru1(cat.transpose(-1, -2)).transpose(-1, -2)
        return self.gru2(x + r)


class EncLayer(nn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos):
        q = k = src + pos
        src2 = self.self_attn(q, k, src)[0]
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class TPDecLayer(nn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):
        tgt2, w = self.multihead_attn(tgt + query_pos, memory + pos, memory)
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2), w


def pe_table(length, d):
    pe = torch.zeros(length, d)
    position = torch.arange(0, length).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, d, 2).float() * -(math.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe


class TorchTATT(nn.Module):
    """Reconstruction of TSRN_TL_TRANS inference (no STN, eval mode) with
    reference state-dict key names."""

    def __init__(self, srb_nums=2, hidden=32, d=64, text_emb=37):
        super().__init__()
        ch = 2 * hidden
        self.srb_nums = srb_nums
        self.block1 = nn.Sequential(
            nn.Conv2d(4, ch, 9, padding=4), nn.PReLU()
        )
        for i in range(srb_nums):
            setattr(self, f"block{i+2}", SRB(ch, d))

        class InfoGen(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc_in = nn.Linear(text_emb, d)
                self.activation = nn.PReLU()
                self.init_factor = nn.Embedding(1024, d)

                class Trans(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.encoder = nn.Module()
                        self.encoder.layers = nn.ModuleList([EncLayer(d, 4, d)])
                        self.decoder = nn.Module()
                        self.decoder.layers = nn.ModuleList(
                            [TPDecLayer(d, 4, d) for _ in range(2)]
                        )
                        self.decoder.norm = nn.LayerNorm(d)
                        self.gru_encoding = nn.GRU(
                            d * 16, d * 16 // 2, bidirectional=True, batch_first=True
                        )

                self.transformer = Trans()

            def forward(self, feat, tp):
                n, c, h, w = [int(v) for v in feat.shape]
                x_im = feat.view(n, c, h * w).permute(2, 0, 1)  # [HW, N, C]
                x = tp.permute(0, 3, 1, 2).squeeze(-1)  # [N, 26, 37]
                x = self.activation(self.fc_in(x))
                bs, length, cdim = x.shape
                pos = pe_table(length, cdim).unsqueeze(0).repeat(bs, 1, 1)
                pos = pos.permute(1, 0, 2)
                x = x.permute(1, 0, 2)

                q = self.init_factor.weight.unsqueeze(1).repeat(1, bs, 1)
                q = (
                    q.reshape(16, 64, bs, cdim)
                    .permute(1, 2, 0, 3)
                    .reshape(64, bs, 16 * cdim)
                )
                q, _ = self.transformer.gru_encoding(q)  # batch_first quirk
                q = (
                    q.reshape(64, bs, 16, cdim)
                    .permute(2, 0, 1, 3)
                    .reshape(1024, bs, cdim)
                )

                memory = x
                for layer in self.transformer.encoder.layers:
                    memory = layer(memory, pos)
                out = x_im
                inter = []
                for layer in self.transformer.decoder.layers:
                    out, attn_w = layer(out, memory, pos, q)
                    inter.append(self.transformer.decoder.norm(out))
                tp_out = torch.stack(inter).mean(0)
                tp_out = tp_out.permute(1, 2, 0).view(n, cdim, h, w)
                return tp_out, attn_w

        self.infoGen = InfoGen()
        setattr(
            self,
            f"block{srb_nums+2}",
            nn.Sequential(nn.Conv2d(ch, ch, 3, padding=1), nn.BatchNorm2d(ch)),
        )

        class Up(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(ch, ch * 4, 3, padding=1)
                self.ps = nn.PixelShuffle(2)
                self.act = Mish()

            def forward(self, z):
                return self.act(self.ps(self.conv(z)))

        setattr(
            self,
            f"block{srb_nums+3}",
            nn.Sequential(Up(), nn.Conv2d(ch, 4, 9, padding=4)),
        )

    def forward(self, x, tp):
        b1 = self.block1(x)
        tp_map, _ = self.infoGen(b1, tp)
        h = b1
        for i in range(self.srb_nums):
            h = getattr(self, f"block{i+2}")(h, tp_map)
        h = getattr(self, f"block{self.srb_nums+2}")(h)
        h = b1 + h
        out = getattr(self, f"block{self.srb_nums+3}")(h)
        return torch.tanh(out)


def _rename_upsample_keys(sd, srb_nums):
    """Torch submodule names here use .ps/.act; reference uses
    .pixel_shuffle/.prelu (no params either way), conv matches."""
    return sd


def test_tatt_full_forward_parity():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    srb_nums = 2
    tm = TorchTATT(srb_nums=srb_nums).eval()
    B = 2
    x = np.random.default_rng(0).random((B, 4, 16, 64)).astype(np.float32)
    prior = np.random.default_rng(1).random((B, 37, 1, 26)).astype(np.float32)
    prior = prior / prior.sum(1, keepdims=True)

    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(prior)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = import_tatt(sd, srb_nums=srb_nums)

    model = TATT(
        srb_nums=srb_nums,
        hidden_units=32,
        out_text_channels=64,
        query_gru_mode="reference",
    )
    got, _aux = model.apply(variables, x, prior)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
