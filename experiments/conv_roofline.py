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

Also aggregates EVERY traced op's time by its HLO metadata source
location (file:line of the fusion root), so non-MXU categories (copies,
relayouts, reduces) are attributed to the model component that emits
them.

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


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\]\S* ([\w\-]+)\("
)
_TUPLE_INSTR_RE = re.compile(
    r"^\s*(?:ROOT )?%?([\w.\-]+) = \(.*?\) ([\w\-]+)\("
)
_COMP_RE = re.compile(r"^(?:ENTRY )?%?([\w.\-]+)(?:\.clone)? \([^)]*\) -> ")
_META_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


class Instr:
    __slots__ = ("name", "dtype", "shape", "op", "line", "src")

    def __init__(self, name, dtype, shape, op, line):
        self.name, self.dtype, self.shape, self.op, self.line = (
            name, dtype, shape, op, line,
        )
        m = _META_RE.search(line)
        self.src = f"{os.path.basename(m.group(1))}:{m.group(2)}" if m else None


def parse_hlo(hlo: str):
    """Returns (instrs: name->Instr, comps: comp->[Instr], calls: name->comp)."""
    instrs: dict[str, Instr] = {}
    comps: dict[str, list[Instr]] = defaultdict(list)
    calls: dict[str, str] = {}
    cur = None
    for line in hlo.splitlines():
        if not line.startswith(" ") and ("{" in line):
            m = _COMP_RE.match(line.strip())
            if m:
                cur = m.group(1)
                continue
        m = _INSTR_RE.match(line)
        if m:
            name, dtype, dims_s, op = m.groups()
            dims = [int(x) for x in dims_s.split(",")] if dims_s else []
        else:
            m = _TUPLE_INSTR_RE.match(line)
            if not m:
                continue
            name, op = m.groups()
            dtype, dims = "tuple", []
        ins = Instr(name, dtype, dims, op, line.strip())
        instrs[name] = ins
        comps[cur].append(ins)
        if op == "fusion":
            c = _CALLS_RE.search(line)
            if c:
                calls[name] = c.group(1)
    return instrs, comps, calls


def _operands(line: str) -> list[str]:
    inner = line.split("(", 1)[1]
    # operand list ends at the matching paren before ), window=/..., take
    # leading %name tokens
    out = []
    for tok in re.findall(r"%([\w.\-]+)", inner):
        out.append(tok)
    return out


def price(ins: Instr, instrs: dict[str, Instr]):
    """Returns (flops, ideal_us, desc) for a convolution or dot Instr."""
    ls = ins.line
    ops = _operands(ls)
    if len(ops) < 2:
        return None
    lhs, rhs = instrs.get(ops[0]), instrs.get(ops[1])
    if lhs is None or rhs is None:
        return None
    peak = PEAK if ins.dtype == "bf16" else F32_PEAK
    out = ins.shape
    def _is_shift_dot(line: str) -> bool:
        # einsum lowered as conv: base dilation, or a full-correlation
        # window (pad_lo == size-1 on a large dim) that enumerates an
        # output axis.  Plain reversed-kernel dx convs (size 3, pad 1)
        # are REAL convs and stay priced.
        if "lhs_dilate" in line:
            return True
        if "rhs_reversal" not in line:
            return False
        w = re.search(r"window=\{size=([\dx]+) pad=([\dx_]+)", line)
        if not w:
            return False
        sizes = [int(s) for s in w.group(1).split("x")]
        pads = [int(p.split("_")[0]) for p in w.group(2).split("x")]
        return any(s > 4 and p == s - 1 for s, p in zip(sizes, pads))

    if ins.op == "convolution" and _is_shift_dot(ls):
        # einsum lowered as a shift-correlation conv (e.g. the GRU gates
        # projection "rli,dgi->dlgr"): the window dim enumerates an OUTPUT
        # axis, not a contraction — the conv pricing rule does not apply.
        # Report FLOPs from the true contraction (lhs feature dim) and no
        # structural ideal (excluded from the headroom aggregate).
        dl = re.search(r"dim_labels=(\S+?)(,|$| )", ls)
        inl = dl.group(1).split("_", 1)[0] if dl else ""
        ci = lhs.shape[inl.index("f")] if "f" in inl else 1
        flops = 2 * math.prod(out) * ci
        return flops, None, f"shift-dot out{out} K={ci} {ins.dtype}"
    if ins.op == "convolution":
        dl = re.search(r"dim_labels=(\S+?)(,|$| )", ls)
        if not dl:
            return None
        inl, rest = dl.group(1).split("_", 1)
        kern, outl = rest.split("->")
        ishape, kshape = lhs.shape, rhs.shape
        ci = ishape[inl.index("f")]
        co = out[outl.index("f")]
        batch = out[outl.index("b")]
        spatial = [out[outl.index(c)] for c in "012345" if c in outl]
        ksp = [kshape[kern.index(c)] for c in "012345" if c in kern]
        groups = 1
        g = re.search(r"feature_group_count=(\d+)", ls)
        if g:
            groups = int(g.group(1))
        bg = re.search(r"batch_group_count=(\d+)", ls)
        if bg:
            groups = max(groups, int(bg.group(1)))
        k_contract = max(1, (ci // groups)) * math.prod(ksp)
        rows = batch * math.prod(spatial)
        flops = 2 * rows * k_contract * (co // max(1, groups)) * groups
        ideal = (
            rows
            * math.ceil(k_contract / 128)
            * math.ceil(max(1, co // groups) / 128)
            * groups
            * 128 * 128 * 2 / peak
        )
        desc = f"conv {ci}->{co} k{ksp} out{batch}x{spatial} {ins.dtype}"
    elif ins.op == "dot":
        def grp(pat):
            m = re.search(pat, ls)
            return (
                [int(x) for x in m.group(1).split(",")]
                if m and m.group(1) else []
            )
        lhs_c = grp(r"lhs_contracting_dims=\{([\d,]*)\}") or [1]
        lhs_b = grp(r"lhs_batch_dims=\{([\d,]*)\}")
        rhs_c = grp(r"rhs_contracting_dims=\{([\d,]*)\}") or [0]
        rhs_b = grp(r"rhs_batch_dims=\{([\d,]*)\}")
        lshape, rshape = lhs.shape, rhs.shape
        k_contract = math.prod(lshape[i] for i in lhs_c) or 1
        bsz = math.prod(lshape[i] for i in lhs_b) if lhs_b else 1
        n_cols = math.prod(
            d for i, d in enumerate(rshape) if i not in rhs_c and i not in rhs_b
        ) or 1
        m_rows = math.prod(
            d for i, d in enumerate(lshape) if i not in lhs_c and i not in lhs_b
        ) or 1
        flops = 2 * bsz * m_rows * n_cols * k_contract
        ideal = (
            bsz
            * math.ceil(m_rows / 8)  # sublane dim packs rows of 8
            * math.ceil(k_contract / 128)
            * math.ceil(n_cols / 128)
            * 8 * 128 * 128 * 2 / peak
        )
        desc = f"dot [{bsz}x]{m_rows}x{k_contract}x{n_cols} {ins.dtype}"
    else:
        return None
    return flops, ideal * 1e6, desc


def main(trace_json: str) -> None:
    from trace_step import build_step

    step, state, teacher_vars, batch = build_step()
    lowered = step.lower(state, teacher_vars, batch, jax.random.PRNGKey(0))
    hlo = lowered.compile().as_text()
    instrs, comps, calls = parse_hlo(hlo)

    with open(trace_json) as f:
        times = json.load(f)["by_op_us_per_step"]

    mxu_rows = []           # (us, ideal, flops, name, desc)
    src_us = defaultdict(float)      # source location -> us (all matched ops)
    src_kind = {}
    matched_us = 0.0
    unmatched = []
    for op_name, us in times.items():
        ins = instrs.get(op_name)
        if ins is None:
            unmatched.append((us, op_name))
            continue
        matched_us += us
        # source attribution: the instruction's own metadata
        key = (ins.src or "<none>", ins.op)
        src_us[key] += us
        # MXU pricing: the op itself, or every conv/dot in its called comp
        members = []
        if ins.op in ("convolution", "dot"):
            members = [ins]
        elif op_name in calls:
            members = [
                i for i in comps.get(calls[op_name], ())
                if i.op in ("convolution", "dot")
            ]
        if not members:
            continue
        flops = ideal = 0.0
        unpriced = False
        descs = []
        for m in members:
            p = price(m, instrs)
            if p:
                flops += p[0]
                if p[1] is None:
                    unpriced = True
                else:
                    ideal += p[1]
                descs.append(p[2])
        if flops:
            mxu_rows.append((us, None if unpriced else ideal, flops, op_name,
                             "; ".join(descs[:3]), ins.src or ""))

    total_us = sum(times.values())
    print(
        f"trace total {total_us/1e3:.1f} ms/step; matched to HLO "
        f"{matched_us/1e3:.2f} ms/step; unmatched {sum(u for u,_ in unmatched)/1e3:.2f} ms"
    )
    for us, n in sorted(unmatched, reverse=True)[:8]:
        print(f"  unmatched {us:8.0f} us  {n[:80]}")

    print("\n== MXU ops: actual vs structural ideal (us/step) ==")
    print(f"{'us':>8} {'ideal':>8} {'x-SoL':>6} {'TF/s':>6}  op / content")
    mxu_rows.sort(key=lambda r: -r[0])
    for us, ideal, flops, name, desc, src in mxu_rows[:45]:
        istr = f"{ideal:8.0f}" if ideal is not None else "       -"
        xstr = f"{us/max(ideal,1e-9):6.1f}" if ideal is not None else "     -"
        print(
            f"{us:8.0f} {istr} {xstr} "
            f"{flops/us/1e6:6.1f}  {name[:26]:26s} {desc[:56]:56s} {src}"
        )
    priced = [r for r in mxu_rows if r[1] is not None]
    act = sum(r[0] for r in priced)
    idl = sum(r[1] for r in priced)
    unp = sum(r[0] for r in mxu_rows if r[1] is None)
    print(
        f"\npriced MXU fusions: actual {act/1e3:.2f} ms vs structural ideal "
        f"{idl/1e3:.2f} ms (headroom {act/max(idl,1e-9):.2f}x); "
        f"shift-dot (unpriced) {unp/1e3:.2f} ms; "
        f"non-MXU residue {(matched_us-act-unp)/1e3:.2f} ms"
    )

    print("\n== all matched time by source location (top 40) ==")
    for (src, op), us in sorted(src_us.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us:8.0f}  {op:14s} {src}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r4.json")
