"""Unit tests for the HLO byte-accounting parser (scripts/analysis/bytes_breakdown.py).

The tool charges every top-level HLO instruction its operand+output buffer
bytes to rank where the production train step's HBM traffic goes. These tests
pin the parsing/charging rules on hand-written HLO snippets so a jax textual
format drift is caught loudly rather than silently mis-attributing bytes.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts" / "analysis"))

import bytes_breakdown as bb  # noqa: E402


def test_shape_bytes_scalar_vector_tuple():
    assert bb.shape_bytes("f32[]") == 4
    assert bb.shape_bytes("f32[8]") == 4 * 8
    assert bb.shape_bytes("bf16[2,3,4]") == 2 * 2 * 3 * 4
    # tuples sum their elements
    assert bb.shape_bytes("(f32[4], s32[2])") == 4 * 4 + 4 * 2
    # layout annotations after the dims are ignored by the dtype[dims] regex
    assert bb.shape_bytes("f32[2,6,256,256]{3,2,1,0}") == 4 * 2 * 6 * 256 * 256
    # unknown dtypes contribute nothing (better under- than mis-count)
    assert bb.shape_bytes("token[]") == 0


HLO = """\
HloModule jit_step

%fused_computation (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8] parameter(0)
  ROOT %m = f32[8,8] multiply(%p0, %p0)
}

ENTRY %main.42 (a: f32[8,8], b: f32[8,8]) -> f32[8,8] {
  %a = f32[8,8] parameter(0)
  %b = f32[8,8] parameter(1)
  %fus = f32[8,8] fusion(%a), kind=kLoop, calls=%fused_computation
  ROOT %d = f32[8,8] dot(%fus, %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}
"""


def test_parse_hlo_entry_and_fusion():
    comps = bb.parse_hlo(HLO)
    entry = next(k for k in comps if "main" in k)
    ops = {name: opcode for name, _, opcode, _, _ in comps[entry]}
    assert ops["fus"] == "fusion"
    assert ops["d"] == "dot"
    # the fused computation is parsed as its own computation
    fused = next(k for k in comps if "fused_computation" in k)
    assert any(op == "multiply" for _, _, op, _, _ in comps[fused])


def test_parse_hlo_operands_and_calls():
    comps = bb.parse_hlo(HLO)
    entry = next(k for k in comps if "main" in k)
    rows = {name: (operands, called)
            for name, _, _, operands, called in comps[entry]}
    operands, called = rows["fus"]
    assert "a" in operands
    assert any("fused_computation" in c for c in called)
    operands, _ = rows["d"]
    assert "fus" in operands and "b" in operands


def test_classify_buckets():
    assert bb.classify("x", "dot", set()) == "matmul"
    assert bb.classify("x", "fusion", {"dot"}) == "matmul"
    assert bb.classify("x", "fusion", {"convolution"}) == "convolution"
    assert bb.classify("x", "convolution", set()) == "convolution"
    assert bb.classify("x", "fusion", {"multiply", "add"}) == "elementwise-fusion"
    assert bb.classify("x", "all-reduce", set()) == "collective"
    assert bb.classify("x", "copy", set()) == "copy"
    assert bb.classify("x", "fusion", {"reduce"}) == "reduce"


def test_end_to_end_charge_on_snippet():
    """parameters/constants/GTEs are never charged; dot charged in+out."""
    comps = bb.parse_hlo(HLO)
    entry = next(k for k in comps if "main" in k)
    shape_of = {}
    for comp in comps.values():
        for name, shape, *_ in comp:
            shape_of[name] = shape
    rows = []
    for name, shape, opcode, operands, called in comps[entry]:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        out_b = bb.shape_bytes(shape)
        in_b = sum(bb.shape_bytes(shape_of.get(o, "")) for o in operands)
        rows.append((name, out_b + in_b))
    charged = dict(rows)
    one = 4 * 8 * 8
    assert charged["fus"] == 2 * one        # 1 operand + 1 output
    assert charged["d"] == 3 * one          # 2 operands + 1 output
    assert "a" not in charged and "b" not in charged
