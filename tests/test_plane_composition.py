"""The plane-composition matrix: every pair in {tp, sp, pp, ep, fsdp}² is
either composed-and-tested or excluded with a pinned error.

The composed pairs have dedicated equivalence tests elsewhere
(tests/test_fsdp.py: fsdp×{tp, sp, pp}; tests/test_moe.py: tp×ep, fsdp×ep);
this file pins the VALIDATION layer — parallel/mesh.validate_planes, the one
function scripts/train.py routes every plane flag through — so an excluded
pair can never silently start "working" (producing wrong shardings) and a
composed pair can never silently start raising. The rationale for each
exclusion lives in validate_planes' docstring and PARITY.md §2.10:
GSPMD planes (tp/ep/fsdp) are sharding annotations and merge leaf-wise;
shard_map planes (sp/pp) are per-device programs GSPMD cannot shard inside.
"""
import pytest

from hnet_mamba_asr_tpu.parallel.mesh import validate_planes

_OK = [                                     # flat-config fragments that parse
    ({}, (1, 1, 1, 1, False)),
    ({"tp": 2}, (2, 1, 1, 1, False)),
    ({"sp": 2}, (1, 2, 1, 1, False)),
    ({"pp": 2}, (1, 1, 2, 1, False)),
    ({"ep": 2}, (1, 1, 1, 2, False)),
    ({"fsdp": True}, (1, 1, 1, 1, True)),
    ({"tp": 2, "ep": 2}, (2, 1, 1, 2, False)),          # disjoint GSPMD specs
    ({"tp": 2, "fsdp": True}, (2, 1, 1, 1, True)),      # ZeRO on the rest
    ({"ep": 2, "fsdp": True}, (1, 1, 1, 2, True)),
    ({"tp": 2, "ep": 2, "fsdp": True}, (2, 1, 1, 2, True)),
    ({"sp": 2, "fsdp": True}, (1, 2, 1, 1, True)),      # gather at shard_map
    ({"pp": 2, "fsdp": True}, (1, 1, 2, 1, True)),      # gather at the stack
    ({"tp": 2, "scan_steps": 4}, (2, 1, 1, 1, False)),  # GSPMD planes scan
    ({"sp": 2, "accum_grad": 2}, (1, 2, 1, 1, False)),  # accum is the sp path
]

_EXCLUDED = [                               # pinned guard errors
    ({"tp": 2, "sp": 2}, "mutually exclusive"),
    ({"tp": 2, "pp": 2}, "mutually exclusive"),
    ({"sp": 2, "pp": 2}, "mutually exclusive"),
    ({"sp": 2, "ep": 2}, "mutually exclusive"),
    ({"pp": 2, "ep": 2}, "mutually exclusive"),
    ({"tp": 2, "sp": 2, "fsdp": True}, "mutually exclusive"),
    ({"sp": 2, "scan_steps": 2}, "scan_steps"),
    ({"pp": 2, "scan_steps": 2}, "scan_steps"),
]


@pytest.mark.parametrize("flat,expect", _OK,
                         ids=["+".join(sorted(f)) or "dp" for f, _ in _OK])
def test_composable_planes_validate(flat, expect):
    assert validate_planes(flat) == expect


@pytest.mark.parametrize("flat,msg", _EXCLUDED,
                         ids=["+".join(sorted(f)) for f, _ in _EXCLUDED])
def test_excluded_planes_raise(flat, msg):
    with pytest.raises(ValueError, match=msg):
        validate_planes(flat)
