"""TVM-subset emulator (ton_etl_ray/tvm.py): arithmetic/stack/cell/
control-flow semantics, the dispatch contract shape, gas accounting,
exit codes, and assembler spill transparency. Pure functions — no Ray."""

import pytest

from ton_etl_ray.boc import Builder, Cell, Slice, cell_hash
from ton_etl_ray.tvm import (
    EXC_CELL_UNDERFLOW, EXC_INT_OVERFLOW, EXC_OUT_OF_GAS,
    EXC_STACK_UNDERFLOW, EXC_TYPE_CHECK, EXC_UNKNOWN_METHOD, VM,
    TvmEmulator, asm, contract, method_id,
)

EMPTY = Builder().end_cell()


def run(ops, stack=None, *, data=EMPTY, gas_limit=1_000_000):
    vm = VM(asm(ops), data, gas_limit=gas_limit)
    vm.stack = list(stack or [])
    code = vm.run(Slice(vm.code))
    return code, vm.stack


def test_arithmetic():
    assert run([("PUSHINT", 7), ("PUSHINT", 5), ("ADD",)]) == (0, [12])
    assert run([("PUSHINT", 7), ("PUSHINT", 5), ("SUB",)]) == (0, [2])
    assert run([("PUSHINT", -7), ("PUSHINT", 5), ("MUL",)]) == (0, [-35])
    # TVM division floors toward -inf
    assert run([("PUSHINT", -7), ("PUSHINT", 2), ("DIV",)]) == (0, [-4])
    assert run([("PUSHINT", -7), ("PUSHINT", 2), ("MOD",)]) == (0, [1])
    assert run([("PUSHINT", 10), ("PUSHINT", 3), ("DIVMOD",)]) == (0, [3, 1])
    # MULDIV keeps the 514-bit product exact before dividing
    big = (1 << 200) + 7
    assert run([("PUSHINT", big), ("PUSHINT", big), ("PUSHINT", big), ("MULDIV",)]) == (0, [big])
    assert run([("PUSHINT", 5), ("INC",), ("DEC",), ("DEC",)]) == (0, [4])
    assert run([("PUSHINT", 5), ("ADDINT", 30), ("MULINT", -2)]) == (0, [-70])
    assert run([("PUSHINT", 3), ("PUSHINT", 9), ("MIN",)]) == (0, [3])
    assert run([("PUSHINT", 3), ("PUSHINT", 9), ("MAX",)]) == (0, [9])
    assert run([("PUSHINT", -3), ("ABS",)]) == (0, [3])
    code, _ = run([("PUSHINT", 1), ("PUSHINT", 0), ("DIV",)])
    assert code == EXC_INT_OVERFLOW


def test_int_overflow_and_wide_push():
    big = (1 << 256) - 1
    assert run([("PUSHINT", big)]) == (0, [big])
    assert run([("PUSHINT", -(1 << 256))]) == (0, [-(1 << 256)])
    code, _ = run([("PUSHINT", big), ("INC",)])
    assert code == EXC_INT_OVERFLOW


def test_comparisons():
    assert run([("PUSHINT", 3), ("PUSHINT", 4), ("LESS",)]) == (0, [-1])
    assert run([("PUSHINT", 4), ("PUSHINT", 4), ("EQUAL",)]) == (0, [-1])
    assert run([("PUSHINT", 5), ("PUSHINT", 4), ("GREATER",)]) == (0, [-1])
    assert run([("PUSHINT", 5), ("PUSHINT", 4), ("NEQ",)]) == (0, [-1])
    assert run([("PUSHINT", 5), ("EQINT", 5)]) == (0, [-1])
    assert run([("PUSHINT", 5), ("GTINT", 5)]) == (0, [0])
    assert run([("PUSHINT", -9), ("SGN",)]) == (0, [-1])


def test_stack_ops():
    assert run([("DUP",)], [7]) == (0, [7, 7])
    assert run([("SWAP",)], [1, 2]) == (0, [2, 1])
    assert run([("DROP",)], [1, 2]) == (0, [1])
    assert run([("NIP",)], [1, 2]) == (0, [2])
    assert run([("OVER",)], [1, 2]) == (0, [1, 2, 1])
    assert run([("PUSH", 2)], [1, 2, 3]) == (0, [1, 2, 3, 1])
    assert run([("POP", 2)], [1, 2, 3, 4]) == (0, [1, 4, 3])
    assert run([("XCHG", 0, 2)], [1, 2, 3]) == (0, [3, 2, 1])
    code, _ = run([("DUP",)])
    assert code == EXC_STACK_UNDERFLOW


def test_cells_roundtrip():
    # NEWC -> STU -> STREF -> ENDC, then CTOS -> LDU -> LDREF -> ENDS
    inner = Builder().store_uint(7, 8).end_cell()
    ops = [
        ("PUSHINT", 300), ("NEWC",), ("STU", 16),
        ("PUSHREF", inner), ("SWAP",), ("STREF",), ("ENDC",),
        ("CTOS",), ("LDU", 16), ("LDREF",), ("ENDS",),
    ]
    code, st = run(ops)
    assert code == 0 and st[0] == 300 and isinstance(st[1], Cell)
    assert st[1] == inner


def test_c4_register_and_data(tmp_path):
    data = Builder().store_uint(1234, 64).store_uint(99, 32).end_cell()
    ops = [("PUSHCTR", 4), ("CTOS",), ("LDU", 64), ("LDU", 32), ("ENDS",)]
    code, st = run(ops, data=data)
    assert (code, st) == (0, [1234, 99])


def test_control_flow():
    # IFELSE both branches
    t = [("PUSHINT", 1), ("PUSHREFCONT", [("PUSHINT", 10)]),
         ("PUSHREFCONT", [("PUSHINT", 20)]), ("IFELSE",), ("INC",)]
    assert run(t) == (0, [11])
    f = [("PUSHINT", 0), ("PUSHREFCONT", [("PUSHINT", 10)]),
         ("PUSHREFCONT", [("PUSHINT", 20)]), ("IFELSE",), ("INC",)]
    assert run(f) == (0, [21])
    # EXECUTE returns to the caller; JMPX does not
    assert run([("PUSHCONT", [("PUSHINT", 5)]), ("EXECUTE",), ("INC",)]) == (0, [6])
    assert run([("PUSHCONT", [("PUSHINT", 5)]), ("JMPX",), ("INC",)])[1] == [5]
    # IFJMP skips the rest when taken
    assert run([("PUSHINT", 1), ("PUSHCONT", [("PUSHINT", 9)]), ("IFJMP",),
                ("PUSHINT", 8)]) == (0, [9])
    assert run([("PUSHINT", 0), ("PUSHCONT", [("PUSHINT", 9)]), ("IFJMP",),
                ("PUSHINT", 8)]) == (0, [8])
    # IFRET / RET
    assert run([("PUSHINT", 1), ("IFRET",), ("PUSHINT", 8)]) == (0, [])
    assert run([("RET",), ("PUSHINT", 8)]) == (0, [])


def test_throw_and_type_errors():
    code, _ = run([("THROW", 42)])
    assert code == 42
    code, _ = run([("PUSHINT", 1), ("CTOS",)])
    assert code == EXC_TYPE_CHECK
    code, _ = run([("PUSHCTR", 4), ("CTOS",), ("LDU", 8)])  # empty c4
    assert code == EXC_CELL_UNDERFLOW


def test_gas_exhaustion():
    ops = [("PUSHINT", 0)] + [("INC",)] * 200
    code, st = run(ops, gas_limit=1_000)
    assert code == EXC_OUT_OF_GAS
    code, st = run(ops, gas_limit=1_000_000)
    assert (code, st) == (0, [200])


def test_hashcu_matches_codec():
    c = Builder().store_uint(77, 32).end_cell()
    code, st = run([("PUSHREF", c), ("HASHCU",)])
    assert code == 0 and st == [int.from_bytes(cell_hash(c), "big")]


def test_asm_spill_transparent():
    # a program far beyond one cell's 1016-bit budget still runs and
    # computes the same result (implicit jump into the spill chain)
    n = 600
    ops = [("PUSHINT", 0)] + [("INC",)] * n
    code, st = run(ops, gas_limit=10_000_000)
    assert (code, st) == (0, [n])
    # refs spill too: many PUSHREFCONT operands across the chain
    ops = [("PUSHINT", 0)]
    for _ in range(10):
        ops += [("PUSHREFCONT", [("INC",)]), ("EXECUTE",)]
    assert run(ops) == (0, [10])


def test_method_dispatch():
    code = contract({
        "get_a": [("PUSHINT", 11)],
        "get_b": [("PUSHINT", 22), ("PUSHINT", 33)],
    })
    emu = TvmEmulator(code, EMPTY)
    r = emu.run_get_method("get_a")
    assert r["vm_exit_code"] == 0 and r["stack"] == [11]
    r = emu.run_get_method("get_b")
    assert r["vm_exit_code"] == 0 and r["stack"] == [22, 33]
    r = emu.run_get_method(method_id("get_b"))  # by id, like the reference
    assert r["stack"] == [22, 33]
    r = emu.run_get_method("get_missing")
    assert r["vm_exit_code"] == EXC_UNKNOWN_METHOD
    assert r["gas_used"] > 0


def test_method_takes_args_and_reads_data():
    # method computes muldiv(arg, total_assets, total_shares) from c4
    data = Builder().store_uint(3_000_000, 64).store_uint(1_500_000, 64).end_cell()
    code = contract({
        "convert": [
            ("PUSHCTR", 4), ("CTOS",), ("LDU", 64), ("LDU", 64),
            ("ENDS",),                      # stack: arg assets shares
            ("MULDIV",),                    # muldiv(arg, assets, shares)
        ],
    })
    emu = TvmEmulator(code, data)
    r = emu.run_get_method("convert", [10])
    assert r["vm_exit_code"] == 0 and r["stack"] == [20]


def test_method_id_convention():
    # crc16/xmodem with bit 16 set; stable across processes
    assert method_id("get_jetton_data") == (0x10000 | (method_id("get_jetton_data") & 0xFFFF))
    assert method_id("get_a") != method_id("get_b")


# ---------------------------------------------------------------------------
# Property tests: the VM agrees with Python integer semantics
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_small = st.integers(min_value=-(1 << 64), max_value=(1 << 64))


@settings(max_examples=200, deadline=None)
@given(_small, _small)
def test_prop_add_sub_mul(x, y):
    assert run([("PUSHINT", x), ("PUSHINT", y), ("ADD",)]) == (0, [x + y])
    assert run([("PUSHINT", x), ("PUSHINT", y), ("SUB",)]) == (0, [x - y])
    assert run([("PUSHINT", x), ("PUSHINT", y), ("MUL",)]) == (0, [x * y])


@settings(max_examples=200, deadline=None)
@given(_small, _small.filter(lambda v: v != 0))
def test_prop_floor_div_mod(x, y):
    assert run([("PUSHINT", x), ("PUSHINT", y), ("DIV",)]) == (0, [x // y])
    assert run([("PUSHINT", x), ("PUSHINT", y), ("MOD",)]) == (0, [x % y])
    code, st_ = run([("PUSHINT", x), ("PUSHINT", y), ("DIVMOD",)])
    assert (code, st_) == (0, [x // y, x % y])


@settings(max_examples=200, deadline=None)
@given(_small, _small, _small.filter(lambda v: v != 0))
def test_prop_muldiv_exact_product(x, y, z):
    # the intermediate product must not truncate (TVM keeps it exact)
    assert run([("PUSHINT", x), ("PUSHINT", y), ("PUSHINT", z),
                ("MULDIV",)]) == (0, [x * y // z])


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 256) - 1),
       st.integers(min_value=1, max_value=256))
def test_prop_stu_ldu_roundtrip(v, bits):
    v &= (1 << bits) - 1
    ops = [("PUSHINT", v), ("NEWC",), ("STU", bits), ("ENDC",),
           ("CTOS",), ("LDU", bits), ("DROP",)]
    assert run(ops) == (0, [v])


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(1 << 255), max_value=(1 << 255) - 1))
def test_prop_pushint_all_widths(v):
    assert run([("PUSHINT", v)]) == (0, [v])


def test_unimplemented_arith_opcodes_raise_not_divide():
    """0xA2 (SUBR) / 0xA3 (NEGATE) are not implemented; they must hit
    the unimplemented-opcode error, not fall into the 0xA9
    division-family sub-decoder (A2 04 used to RUN DIV with exit 0)."""
    for op_byte in (0xA2, 0xA3):
        vm = VM(Builder().store_uint(op_byte, 8).store_uint(0x04, 8).end_cell(),
                EMPTY)
        vm.stack = [7, 2]
        code = vm.run(Slice(vm.code))
        assert code != 0, f"opcode {op_byte:02x} executed silently"
        assert vm.stack != [3], "division-family semantics leaked"


def test_truncated_immediate_exits_cell_underflow():
    """A code cell ending mid-immediate (lone 0x80 = PUSHINT int8 with
    no operand byte) must surface EXC_CELL_UNDERFLOW through the
    exit-code contract, not a raw ValueError escaping run()."""
    vm = VM(Builder().store_uint(0x80, 8).end_cell(), EMPTY)
    assert vm.run(Slice(vm.code)) == EXC_CELL_UNDERFLOW
    # and through the facade (binary-column input surface)
    r = TvmEmulator(Builder().store_uint(0x80, 8).end_cell(),
                    EMPTY).run_get_method(0)
    assert r["vm_exit_code"] != 0


def test_neq_geq_spec_bytes():
    """cp0 one-byte assignments: 0xBD = NEQ, 0xBE = GEQ — assembler and
    interpreter agree AND match the spec (they used to be swapped
    together)."""
    assert asm([("NEQ",)]).data[:1] == b"\xBD"
    assert asm([("GEQ",)]).data[:1] == b"\xBE"
    assert run([("PUSHINT", 3), ("PUSHINT", 3), ("NEQ",)]) == (0, [0])
    assert run([("PUSHINT", 4), ("PUSHINT", 3), ("NEQ",)]) == (0, [-1])
    assert run([("PUSHINT", 3), ("PUSHINT", 3), ("GEQ",)]) == (0, [-1])
    assert run([("PUSHINT", 2), ("PUSHINT", 3), ("GEQ",)]) == (0, [0])


def test_asm_rejects_out_of_range_operands():
    """Register indexes are one nibble and THROW's immediate one byte;
    out-of-range values used to silently bleed into ADJACENT opcodes
    (PUSH 16 assembled as DROP) or mask (THROW 300 -> THROW 44)."""
    for bad in [("PUSH", 16), ("POP", 16), ("PUSH", -1),
                ("PUSHCTR", 16), ("POPCTR", -1), ("XCHG", 3, 16),
                ("THROW", 300), ("THROW", -1), ("EQINT", 128),
                ("ADDINT", -129)]:
        with pytest.raises(ValueError, match="out of range"):
            asm([bad])
    # in-range forms still assemble and execute
    assert run([("PUSHINT", 1), ("PUSHINT", 2), ("PUSH", 1), ("ADD",), ("ADD",)]) == (0, [4])
