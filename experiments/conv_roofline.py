"""Conv/dot roofline for the canonical train step (VERDICT r4 task 1).

Joins a device trace (experiments/trace_step.py --> per-op us/step) with
the optimized HLO of the SAME compiled step to price every convolution
and dot against the MXU's structural ceiling:

  ideal_us = rows * ceil(K/128) * ceil(N/128) * 128 * 128 * 2 / PEAK

where rows = batch x output spatial positions, K = contraction size
(Cin/groups * kh * kw), N = output features.  This charges each op for
the 128-lane / 128-sublane tile padding the systolic array actually
pays, i.e. it is the speed-of-light for THIS op shape on THIS hardware
-- an op running at ~1x ideal cannot be made faster without changing
its shape (fusing channels, packing lanes, batching).

Usage (on the real chip):
    python experiments/trace_step.py /tmp/trace_r4.json
    python experiments/conv_roofline.py /tmp/trace_r4.json
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

PEAK = 197e12  # v5e bf16 FLOP/s
F32_PEAK = PEAK / 2  # fp32 convs run at half rate


def _shape(s: str) -> tuple[str, list[int]]:
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    dtype = m.group(1)
    dims = [int(x) for x in m.group(2).split(",")] if m.group(2) else []
    return dtype, dims


def parse_hlo(hlo: str):
    """Map fusion/instruction name -> list of (kind, flops, ideal_us, desc)."""
    comp_ops: dict[str, list] = defaultdict(list)
    fusion_calls: dict[str, str] = {}
    top_level: dict[str, str] = {}
    cur_comp = None
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* {", ls)
        if m or ls.startswith("ENTRY"):
            cur_comp = "ENTRY" if ls.startswith("ENTRY") else m.group(1)
            continue
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\w+\[[\d,]*\])\S* (convolution|dot)\(", ls)
        if m:
            name, out_s, kind = m.groups()
            odt, out = _shape(out_s)
            operands = re.findall(r"(\w+\[[\d,]*\])\S*? %?[\w.\-]+", ls.split("(", 1)[1])
            comp_ops[cur_comp].append((name, kind, odt, out, operands, ls))
            continue
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = \S+ fusion\(.*calls=%?([\w.\-]+)", ls)
        if m and cur_comp == "ENTRY":
            fusion_calls[m.group(1)] = m.group(2)
            continue
    return comp_ops, fusion_calls


def price(kind, odt, out, operands, ls):
    peak = PEAK if odt in ("bf16",) else F32_PEAK
    if kind == "convolution":
        dl = re.search(r"dim_labels=(\S+?)(,|$| )", ls).group(1)
        ins, rest = dl.split("_", 1)
        kern, outs = rest.split("->")
        _, kshape = _shape(operands[1])
        _, ishape = _shape(operands[0])
        ci = ishape[ins.index("f")]
        co = out[outs.index("f")]
        spatial = [out[outs.index(c)] for c in "01" if c in outs]
        batch = out[outs.index("b")]
        kh = [kshape[kern.index(c)] for c in "01" if c in kern]
        groups = 1
        g = re.search(r"feature_group_count=(\d+)", ls)
        if g:
            groups = int(g.group(1))
        k_contract = (ci // groups) * math.prod(kh)
        rows = batch * math.prod(spatial)
        flops = 2 * rows * k_contract * co
        ideal = (
            rows
            * math.ceil(k_contract / 128)
            * math.ceil((co // groups) / 128)
            * groups
            * 128
            * 128
            * 2
            / peak
        )
        desc = f"conv {ci}->{co} k{kh} out{batch}x{spatial}"
    else:  # dot
        dnums = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", ls)
        lhs_c = [int(x) for x in dnums.group(1).split(",")] if dnums else [1]
        rnums = re.search(r"rhs_contracting_dims=\{([\d,]*)\}", ls)
        rhs_c = [int(x) for x in rnums.group(1).split(",")] if rnums else [0]
        lb = re.search(r"lhs_batch_dims=\{([\d,]*)\}", ls)
        lhs_b = [int(x) for x in lb.group(1).split(",")] if lb and lb.group(1) else []
        rb = re.search(r"rhs_batch_dims=\{([\d,]*)\}", ls)
        rhs_b = [int(x) for x in rb.group(1).split(",")] if rb and rb.group(1) else []
        _, lshape = _shape(operands[0])
        _, rshape = _shape(operands[1])
        k_contract = math.prod(lshape[i] for i in lhs_c)
        bsz = math.prod(lshape[i] for i in lhs_b) if lhs_b else 1
        n_cols = math.prod(
            d for i, d in enumerate(rshape) if i not in rhs_c and i not in rhs_b
        )
        m_rows = math.prod(
            d for i, d in enumerate(lshape) if i not in lhs_c and i not in lhs_b
        )
        flops = 2 * bsz * m_rows * n_cols * k_contract
        ideal = (
            bsz
            * m_rows
            * math.ceil(k_contract / 128)
            * math.ceil(n_cols / 128)
            * 128
            * 128
            * 2
            / peak
        )
        desc = f"dot [{bsz}x]{m_rows}x{k_contract}x{n_cols}"
    return flops, ideal * 1e6, desc


def main(trace_json: str) -> None:
    from trace_step import build_step

    step, state, teacher_vars, batch = build_step()
    lowered = step.lower(state, teacher_vars, batch, jax.random.PRNGKey(0))
    hlo = lowered.compile().as_text()
    comp_ops, fusion_calls = parse_hlo(hlo)

    with open(trace_json) as f:
        times = json.load(f)["by_op_us_per_step"]

    rows = []
    matched_us = 0.0
    for op_name, us in times.items():
        comp = fusion_calls.get(op_name)
        ops = comp_ops.get(comp, []) if comp else comp_ops.get("ENTRY", [])
        mine = (
            ops
            if comp
            else [o for o in ops if o[0] == op_name]
        )
        if not mine:
            continue
        flops = ideal = 0.0
        descs = []
        for name, kind, odt, out, operands, ls in mine:
            f_, i_, d_ = price(kind, odt, out, operands, ls)
            flops += f_
            ideal += i_
            descs.append(d_)
        if flops == 0:
            continue
        matched_us += us
        rows.append((us, ideal, flops, op_name, "; ".join(descs[:3])))

    rows.sort(key=lambda r: -r[0])
    total_us = sum(times.values())
    print(f"trace total {total_us/1e3:.1f} ms/step (incl. envelopes); "
          f"MXU-op fusions matched: {matched_us/1e3:.2f} ms/step")
    print(f"{'us':>8} {'ideal':>8} {'x-SoL':>6} {'TF/s':>6}  op / content")
    agg_us = agg_ideal = 0.0
    for us, ideal, flops, name, desc in rows[:40]:
        agg_us += us
        agg_ideal += ideal
        print(
            f"{us:8.0f} {ideal:8.0f} {us/max(ideal,1e-9):6.1f} "
            f"{flops/us/1e6:6.1f}  {name[:28]:28s} {desc[:70]}"
        )
    print(
        f"\nall matched: actual {matched_us:.0f} us vs structural ideal "
        f"{sum(r[1] for r in rows):.0f} us "
        f"(headroom {matched_us/max(sum(r[1] for r in rows),1e-9):.2f}x)"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r4.json")
