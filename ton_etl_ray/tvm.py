"""A from-scratch TVM get-method emulator over the ``boc`` cell codec.

The reference's account-state parser families run contract get-methods
through a native TVM emulator (reference parsers/accounts/emulator.py:
123-160 — ``TvmEmulator(code, data)`` + ``run_get_method(method,
stack)`` with a gas limit and a c7 context; consumed by tvl.py:46-217,
core_prices.py:132-170, dedust_swap.py:47-58 factory validation,
coffee_swap.py:41-67, dedust_swap_cpmm_v3.py:67). This module is the
engine's analogue: a pure-Python stack machine executing real TVM-style
bytecode over ``boc.Cell`` trees, with the same result contract —
``{'success', 'vm_exit_code', 'stack', 'gas_used'}`` and non-zero exit
codes left to the caller (EmulatorException semantics).

Scope and fidelity
------------------
Semantics follow the public TVM whitepaper (N. Durov, "Telegram Open
Network Virtual Machine"): 257-bit signed integer lanes, floor
division, the (x b – b') store / (s – x s') load stack conventions,
continuation-based control flow with an implicit RET at the end of a
code slice and an implicit jump into a sole trailing reference, and the
standard exit codes (2 stack underflow, 4 integer overflow, 5 range
check, 7 type check, 9 cell underflow, 11 unknown method, -14 out of
gas). The implemented INSTRUCTION SUBSET is what the reference's
get-method parsers exercise: stack shuffles, integer arithmetic
(ADD/SUB/MUL/DIV/MOD/MULDIV), comparisons, cell build/parse, control
flow, c4/c7 registers, and CRC-derived method-id dispatch. Encodings
are byte-aligned and follow the spec's one-byte forms where the spec
itself is byte-aligned (0x7x PUSHINT, 0x2i PUSH, 0xD3cc LDU, 0xED4i
PUSHCTR, …); the few bit-packed spec forms in the subset (wide PUSHINT,
THROW) are widened to byte-aligned variants, documented at their table
entries — the in-repo assembler and this interpreter are a matched
pair, pinned by round-trip and semantics tests, and make NO claim of
executing mainnet-compiled bytecode (that remains the honest residual
gap vs the reference's native emulator).

Method ids use the standard TON convention
``(crc16_xmodem(name) | 0x10000)`` so synthetic contracts dispatch on
the same ids the reference passes to its emulator.
"""

from __future__ import annotations

from .boc import Builder, Cell, Slice, cell_hash, crc16_xmodem

INT_MAX = (1 << 256) - 1          # 257-bit signed lane
INT_MIN = -(1 << 256)

# exit codes (TVM whitepaper §4.5.7)
EXC_STACK_UNDERFLOW = 2
EXC_INT_OVERFLOW = 4
EXC_RANGE_CHECK = 5
EXC_TYPE_CHECK = 7
EXC_CELL_UNDERFLOW = 9
EXC_UNKNOWN_METHOD = 11
EXC_OUT_OF_GAS = -14

GAS_BASE = 26          # per decoded instruction
GAS_CELL_LOAD = 118    # CTOS / implicit jump-into-ref
GAS_CELL_CREATE = 500  # ENDC


def method_id(name: str) -> int:
    """Standard TON get-method id: crc16/xmodem of the name, bit 16 set
    (the convention the reference's ``run_get_method(method=...)``
    resolves names through)."""
    return crc16_xmodem(name.encode()) | 0x10000


class VmError(Exception):
    def __init__(self, exit_code: int, msg: str = ""):
        super().__init__(msg or f"vm exit {exit_code}")
        self.exit_code = exit_code


class Cont:
    """An ordinary continuation: a code slice to execute."""

    __slots__ = ("slice",)

    def __init__(self, s: Slice):
        self.slice = s


def _clone(s: Slice) -> Slice:
    c = Slice(s._cell)
    c._pos, c._ref_pos = s._pos, s._ref_pos
    return c


class VM:
    """The interpreter core: a value stack, c4/c7 registers, a return
    stack of code slices, and a gas counter."""

    def __init__(self, code: Cell, data: Cell, *, c7: tuple = (),
                 gas_limit: int = 1_000_000):
        self.code = code
        self.c4 = data
        self.c7 = c7
        self.gas_limit = gas_limit
        self.gas = 0
        self.stack: list = []
        self._rstack: list[Slice] = []

    # -- stack helpers -----------------------------------------------------
    def _pop(self):
        if not self.stack:
            raise VmError(EXC_STACK_UNDERFLOW)
        return self.stack.pop()

    def _pop_int(self) -> int:
        v = self._pop()
        if not isinstance(v, int):
            raise VmError(EXC_TYPE_CHECK, f"expected int, got {type(v).__name__}")
        return v

    def _pop_type(self, ty):
        v = self._pop()
        if not isinstance(v, ty):
            raise VmError(EXC_TYPE_CHECK, f"expected {ty.__name__}, got {type(v).__name__}")
        return v

    def _push_int(self, v: int):
        if not INT_MIN <= v <= INT_MAX:
            raise VmError(EXC_INT_OVERFLOW)
        self.stack.append(v)

    def _at(self, i: int):
        if i >= len(self.stack):
            raise VmError(EXC_STACK_UNDERFLOW)
        return self.stack[-1 - i]

    def _burn(self, n: int):
        self.gas += n
        if self.gas > self.gas_limit:
            raise VmError(EXC_OUT_OF_GAS)

    # -- control flow ------------------------------------------------------
    def _jump(self, cont):
        if not isinstance(cont, Cont):
            raise VmError(EXC_TYPE_CHECK, "expected continuation")
        return _clone(cont.slice)

    def _call(self, cc: Slice, cont) -> Slice:
        self._rstack.append(cc)
        if len(self._rstack) > 512:
            raise VmError(EXC_STACK_UNDERFLOW, "return stack overflow")
        return self._jump(cont)

    def _ret(self, cc: Slice) -> Slice | None:
        if self._rstack:
            return self._rstack.pop()
        return None

    def run(self, entry: Slice) -> int:
        """Execute from ``entry`` until the implicit top-level RET or a
        throw; returns the exit code."""
        cc: Slice | None = _clone(entry)
        try:
            while cc is not None:
                if cc.remaining_bits == 0:
                    if cc.remaining_refs == 1:
                        # implicit jump into the sole trailing reference
                        self._burn(GAS_CELL_LOAD)
                        cc = Slice(cc.load_ref())
                        continue
                    cc = self._ret(cc)
                    continue
                cc = self._step(cc)
            return 0
        except VmError as e:
            return e.exit_code
        except ValueError:
            # a truncated IMMEDIATE (PUSHINT operand, XCHG args byte,
            # PUSHCONT body, STU/LDU cc byte, sub-opcode byte) raises a
            # raw boc underflow from inside an instruction decode — same
            # exit-code contract as the guarded truncated-opcode load
            return EXC_CELL_UNDERFLOW

    # -- decode / execute one instruction ----------------------------------
    def _step(self, cc: Slice) -> Slice | None:
        self._burn(GAS_BASE)
        try:
            op = cc.load_uint(8)
        except ValueError:
            raise VmError(EXC_CELL_UNDERFLOW, "truncated opcode")
        st = self.stack
        hi, lo = op >> 4, op & 0x0F

        if op == 0x00:  # NOP
            return cc
        if hi == 0x0:  # XCHG s0,s(i)
            self._at(lo)
            st[-1], st[-1 - lo] = st[-1 - lo], st[-1]
            return cc
        if op == 0x10:  # XCHG s(i),s(j)
            b = cc.load_uint(8)
            i, j = b >> 4, b & 0x0F
            self._at(max(i, j))
            st[-1 - i], st[-1 - j] = st[-1 - j], st[-1 - i]
            return cc
        if hi == 0x2:  # PUSH s(i)
            st.append(self._at(lo))
            return cc
        if hi == 0x3:  # POP s(i)  (0x30 = DROP)
            v = self._pop()
            if lo:
                self._at(lo - 1)
                st[-lo] = v
            return cc
        if hi == 0x7:  # PUSHINT -5..10
            self._push_int(lo if lo <= 10 else lo - 16)
            return cc
        if op == 0x80:
            self._push_int(_signed(cc.load_uint(8), 8))
            return cc
        if op == 0x81:
            self._push_int(_signed(cc.load_uint(16), 16))
            return cc
        if op == 0x82:  # PUSHINT wide (widened: 1-byte length + n bytes)
            n = cc.load_uint(8)
            if not 1 <= n <= 33:
                raise VmError(EXC_RANGE_CHECK)
            self._push_int(_signed(cc.load_uint(n * 8), n * 8))
            return cc
        if op in (0x88, 0x89, 0x8A):  # PUSHREF / PUSHREFSLICE / PUSHREFCONT
            try:
                ref = cc.load_ref()
            except ValueError:
                raise VmError(EXC_CELL_UNDERFLOW)
            st.append(ref if op == 0x88
                      else Slice(ref) if op == 0x89 else Cont(Slice(ref)))
            return cc
        if hi == 0x9:  # PUSHCONT (lo inline bytes)
            body = Builder()
            for _ in range(lo):
                body.store_uint(cc.load_uint(8), 8)
            st.append(Cont(Slice(body.end_cell())))
            return cc

        # explicit arithmetic set — 0xA2 (SUBR) / 0xA3 (NEGATE) are NOT
        # implemented and must hit the unimplemented-opcode error below,
        # not fall into the 0xA9 division-family sub-opcode decoder
        if op in (0xA0, 0xA1, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9):
            return self._arith(op, cc)
        if op == 0xB6:
            sub = cc.load_uint(8)
            if sub == 0x08:
                y, x = self._pop_int(), self._pop_int()
                self._push_int(min(x, y))
            elif sub == 0x09:
                y, x = self._pop_int(), self._pop_int()
                self._push_int(max(x, y))
            elif sub == 0x0B:
                self._push_int(abs(self._pop_int()))
            else:
                raise VmError(EXC_TYPE_CHECK, f"bad B6 sub {sub:02x}")
            return cc
        if 0xB8 <= op <= 0xBE:  # SGN LESS EQUAL LEQ GREATER NEQ GEQ
            if op == 0xB8:
                x = self._pop_int()
                self._push_int(0 if x == 0 else (1 if x > 0 else -1))
                return cc
            y, x = self._pop_int(), self._pop_int()
            # cp0 one-byte assignments: 0xBD = NEQ, 0xBE = GEQ (matched
            # by the assembler's mnemonic table below)
            res = {0xB9: x < y, 0xBA: x == y, 0xBB: x <= y,
                   0xBC: x > y, 0xBD: x != y, 0xBE: x >= y}[op]
            self._push_int(-1 if res else 0)
            return cc
        if 0xC0 <= op <= 0xC3:  # EQINT LESSINT GTINT NEQINT (int8 imm)
            imm = _signed(cc.load_uint(8), 8)
            x = self._pop_int()
            res = {0xC0: x == imm, 0xC1: x < imm,
                   0xC2: x > imm, 0xC3: x != imm}[op]
            self._push_int(-1 if res else 0)
            return cc

        if op == 0xC8:  # NEWC
            st.append(Builder())
            return cc
        if op == 0xC9:  # ENDC
            self._burn(GAS_CELL_CREATE)
            st.append(self._pop_type(Builder).end_cell())
            return cc
        if op in (0xCA, 0xCB):  # STI / STU cc: (x b – b')
            bits = cc.load_uint(8) + 1
            b = self._pop_type(Builder)
            x = self._pop_int()
            try:
                (b.store_int if op == 0xCA else b.store_uint)(x, bits)
            except ValueError:
                raise VmError(EXC_RANGE_CHECK)
            st.append(b)
            return cc
        if op == 0xCC:  # STREF: (c b – b')
            b = self._pop_type(Builder)
            c = self._pop_type(Cell)
            try:
                b.store_ref(c)
            except ValueError:
                raise VmError(EXC_RANGE_CHECK)
            st.append(b)
            return cc

        if op == 0xD0:  # CTOS
            self._burn(GAS_CELL_LOAD)
            st.append(Slice(self._pop_type(Cell)))
            return cc
        if op == 0xD1:  # ENDS
            s = self._pop_type(Slice)
            if s.remaining_bits or s.remaining_refs:
                raise VmError(EXC_CELL_UNDERFLOW, "ENDS on non-empty slice")
            return cc
        if op in (0xD2, 0xD3):  # LDI / LDU cc: (s – x s')
            bits = cc.load_uint(8) + 1
            s = self._pop_type(Slice)
            try:
                x = s.load_int(bits) if op == 0xD2 else s.load_uint(bits)
            except ValueError:
                raise VmError(EXC_CELL_UNDERFLOW)
            self._push_int(x)
            st.append(s)
            return cc
        if op == 0xD4:  # LDREF: (s – c s')
            s = self._pop_type(Slice)
            try:
                c = s.load_ref()
            except ValueError:
                raise VmError(EXC_CELL_UNDERFLOW)
            st.append(c)
            st.append(s)
            return cc

        if op == 0xD8:  # EXECUTE
            return self._call(cc, self._pop())
        if op == 0xD9:  # JMPX
            return self._jump(self._pop())
        if op == 0xDB:
            sub = cc.load_uint(8)
            if sub == 0x30:  # RET
                return self._ret(cc)
            raise VmError(EXC_TYPE_CHECK, f"bad DB sub {sub:02x}")
        if op == 0xDC:  # IFRET
            return self._ret(cc) if self._pop_int() else cc
        if op == 0xDD:  # IFNOTRET
            return cc if self._pop_int() else self._ret(cc)
        if op in (0xDE, 0xDF):  # IF / IFNOT
            c = self._pop()
            f = self._pop_int()
            taken = bool(f) if op == 0xDE else not f
            return self._call(cc, c) if taken else cc
        if op in (0xE0, 0xE1):  # IFJMP / IFNOTJMP
            c = self._pop()
            f = self._pop_int()
            taken = bool(f) if op == 0xE0 else not f
            return self._jump(c) if taken else cc
        if op == 0xE2:  # IFELSE
            c2 = self._pop()
            c1 = self._pop()
            f = self._pop_int()
            return self._call(cc, c1 if f else c2)

        if op == 0xED:  # PUSHCTR / POPCTR
            sub = cc.load_uint(8)
            kind, idx = sub >> 4, sub & 0x0F
            if kind == 0x4:
                if idx == 4:
                    st.append(self.c4)
                elif idx == 7:
                    st.append(tuple(self.c7))
                else:
                    raise VmError(EXC_RANGE_CHECK, f"PUSHCTR c{idx}")
                return cc
            if kind == 0x5:
                if idx == 4:
                    self.c4 = self._pop_type(Cell)
                else:
                    raise VmError(EXC_RANGE_CHECK, f"POPCTR c{idx}")
                return cc
            raise VmError(EXC_TYPE_CHECK, f"bad ED sub {sub:02x}")

        if op == 0xF2:  # THROW nn (widened: 8-bit immediate)
            raise VmError(cc.load_uint(8))
        if op == 0xF9:
            sub = cc.load_uint(8)
            if sub == 0x00:  # HASHCU: (c – uint256)
                self._burn(GAS_CELL_LOAD)
                self._push_int(int.from_bytes(cell_hash(self._pop_type(Cell)), "big"))
                return cc
            raise VmError(EXC_TYPE_CHECK, f"bad F9 sub {sub:02x}")
        if op == 0xFF:
            sub = cc.load_uint(8)
            if sub == 0x00:  # SETCP0
                return cc
            raise VmError(EXC_TYPE_CHECK, f"bad FF sub {sub:02x}")

        raise VmError(EXC_TYPE_CHECK, f"unimplemented opcode {op:02x}")

    def _arith(self, op: int, cc: Slice) -> Slice:
        if op == 0xA4:  # INC
            self._push_int(self._pop_int() + 1)
            return cc
        if op == 0xA5:  # DEC
            self._push_int(self._pop_int() - 1)
            return cc
        if op == 0xA6:  # ADDINT imm8
            self._push_int(self._pop_int() + _signed(cc.load_uint(8), 8))
            return cc
        if op == 0xA7:  # MULINT imm8
            self._push_int(self._pop_int() * _signed(cc.load_uint(8), 8))
            return cc
        if op in (0xA0, 0xA1, 0xA8):
            y, x = self._pop_int(), self._pop_int()
            self._push_int(x + y if op == 0xA0 else x - y if op == 0xA1 else x * y)
            return cc
        # 0xA9 division family: floor semantics (TVM default rounding)
        sub = cc.load_uint(8)
        if sub in (0x04, 0x08, 0x0C):
            y, x = self._pop_int(), self._pop_int()
            if y == 0:
                raise VmError(EXC_INT_OVERFLOW, "division by zero")
            if sub in (0x04, 0x0C):
                self._push_int(x // y)
            if sub in (0x08, 0x0C):
                self._push_int(x % y)
            return cc
        if sub in (0x84, 0x8C):  # MULDIV / MULDIVMOD
            z, y, x = self._pop_int(), self._pop_int(), self._pop_int()
            if z == 0:
                raise VmError(EXC_INT_OVERFLOW, "division by zero")
            p = x * y
            self._push_int(p // z)
            if sub == 0x8C:
                self._push_int(p % z)
            return cc
        raise VmError(EXC_TYPE_CHECK, f"bad A9 sub {sub:02x}")


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


# ---------------------------------------------------------------------------
# Assembler
# ---------------------------------------------------------------------------

_SIMPLE = {
    "NOP": b"\x00", "SWAP": b"\x01", "DUP": b"\x20", "OVER": b"\x21",
    "DROP": b"\x30", "NIP": b"\x31",
    "ADD": b"\xA0", "SUB": b"\xA1", "INC": b"\xA4", "DEC": b"\xA5",
    "MUL": b"\xA8",
    "DIV": b"\xA9\x04", "MOD": b"\xA9\x08", "DIVMOD": b"\xA9\x0C",
    "MULDIV": b"\xA9\x84", "MULDIVMOD": b"\xA9\x8C",
    "MIN": b"\xB6\x08", "MAX": b"\xB6\x09", "ABS": b"\xB6\x0B",
    "SGN": b"\xB8", "LESS": b"\xB9", "EQUAL": b"\xBA", "LEQ": b"\xBB",
    "GREATER": b"\xBC", "NEQ": b"\xBD", "GEQ": b"\xBE",
    "NEWC": b"\xC8", "ENDC": b"\xC9", "STREF": b"\xCC",
    "CTOS": b"\xD0", "ENDS": b"\xD1", "LDREF": b"\xD4",
    "EXECUTE": b"\xD8", "JMPX": b"\xD9", "RET": b"\xDB\x30",
    "IFRET": b"\xDC", "IFNOTRET": b"\xDD", "IF": b"\xDE", "IFNOT": b"\xDF",
    "IFJMP": b"\xE0", "IFNOTJMP": b"\xE1", "IFELSE": b"\xE2",
    "HASHCU": b"\xF9\x00", "SETCP0": b"\xFF\x00",
}
_CC_ARG = {"STI": 0xCA, "STU": 0xCB, "LDI": 0xD2, "LDU": 0xD3}
_IMM8 = {"ADDINT": 0xA6, "MULINT": 0xA7, "EQINT": 0xC0, "LESSINT": 0xC1,
         "GTINT": 0xC2, "NEQINT": 0xC3, "THROW": 0xF2}


def _encode(op) -> tuple[bytes, Cell | None]:
    """One op -> (code bytes, optional ref cell)."""
    if isinstance(op, str):
        op = (op,)
    name, args = op[0], op[1:]
    if name in _SIMPLE:
        return _SIMPLE[name], None
    if name in _CC_ARG:
        (bits,) = args
        if not 1 <= bits <= 256:
            raise ValueError(f"{name} bits out of range: {bits}")
        return bytes([_CC_ARG[name], bits - 1]), None
    if name in _IMM8:
        (imm,) = args
        # THROW's immediate is unsigned 0..255; the int-compare imms are
        # signed int8 — refuse out-of-range instead of silently masking
        # (a typo'd THROW 300 must not assemble as THROW 44)
        lo_ok = 0 if name == "THROW" else -(1 << 7)
        hi_ok = (1 << 8) - 1 if name == "THROW" else (1 << 7) - 1
        if not lo_ok <= imm <= hi_ok:
            raise ValueError(f"{name} immediate out of range: {imm}")
        return bytes([_IMM8[name], imm & 0xFF]), None
    if name == "PUSHINT":
        (v,) = args
        if -5 <= v <= 10:
            return bytes([0x70 | (v & 0x0F)]), None
        if -(1 << 7) <= v < 1 << 7:
            return bytes([0x80, v & 0xFF]), None
        if -(1 << 15) <= v < 1 << 15:
            return b"\x81" + (v & 0xFFFF).to_bytes(2, "big"), None
        n = max(1, ((v if v >= 0 else ~v).bit_length() + 8) // 8)
        if n > 33:
            raise ValueError("PUSHINT operand exceeds 257 bits")
        return bytes([0x82, n]) + (v & ((1 << (n * 8)) - 1)).to_bytes(n, "big"), None
    if name in ("PUSH", "POP", "PUSHCTR", "POPCTR"):
        (i,) = args
        # one-nibble register index — out-of-range would silently bleed
        # into an ADJACENT opcode family (PUSH 16 -> 0x30 = DROP)
        if not 0 <= i <= 15:
            raise ValueError(f"{name} register index out of range: {i}")
        base = {"PUSH": (0x20,), "POP": (0x30,),
                "PUSHCTR": (0xED, 0x40), "POPCTR": (0xED, 0x50)}[name]
        return (bytes([base[0] | i]) if len(base) == 1
                else bytes([base[0], base[1] | i])), None
    if name == "XCHG":
        if len(args) == 1:
            return bytes([args[0]]), None
        i, j = args
        if not (0 <= i <= 15 and 0 <= j <= 15):
            raise ValueError(f"XCHG register index out of range: {i},{j}")
        return bytes([0x10, (i << 4) | j]), None
    if name == "PUSHREF":
        return b"\x88", args[0]
    if name == "PUSHREFSLICE":
        return b"\x89", args[0]
    if name == "PUSHREFCONT":
        (body,) = args
        return b"\x8A", body if isinstance(body, Cell) else asm(body)
    if name == "PUSHCONT":
        (body,) = args
        parts = [_encode(o) for o in body]
        if any(r is not None for _, r in parts):
            raise ValueError("PUSHCONT inline body cannot carry refs; use PUSHREFCONT")
        code = b"".join(c for c, _ in parts)
        if len(code) > 15:
            raise ValueError("PUSHCONT inline body > 15 bytes; use PUSHREFCONT")
        return bytes([0x90 | len(code)]) + code, None
    raise ValueError(f"unknown mnemonic {name!r}")


def asm(ops: list) -> Cell:
    """Assemble an op list into a code cell, spilling overflow into a
    trailing-reference chain (the interpreter's implicit jump into a
    sole trailing ref continues execution there, so spilling is
    transparent to the program)."""
    return _pack([_encode(op) for op in ops])


def _pack(encoded: list) -> Cell:
    b = Builder()
    refs_used = 0
    for i, (code, ref) in enumerate(encoded):
        last = i + 1 == len(encoded)
        # reserve one ref slot for the spill chain unless this op ends
        # the program; the cell must end EXACTLY after a stored op so
        # the implicit jump sees zero remaining bits
        ref_budget = 4 if last else 3
        if (b.bit_len + len(code) * 8 > MAX_CODE_BITS
                or refs_used + (1 if ref is not None else 0) > ref_budget):
            b.store_ref(_pack(encoded[i:]))
            return b.end_cell()
        b.store_bytes(code)
        if ref is not None:
            b.store_ref(ref)
            refs_used += 1
    return b.end_cell()


MAX_CODE_BITS = 1016  # one whole-byte budget under the 1023-bit cap


def contract(methods: dict[int | str, list]) -> Cell:
    """A dispatching contract: selector prologue comparing the
    method id on stack top against each method, jumping to the matching
    body (IFJMP chain — the hand-written-Fift selector pattern), else
    THROW 11 (unknown method, the standard convention the reference's
    EmulatorException surfaces as a non-zero exit)."""
    ops: list = [("SETCP0",)]
    for mid, body in methods.items():
        mid = method_id(mid) if isinstance(mid, str) else mid
        ops += [("DUP",), ("PUSHINT", mid), ("EQUAL",),
                ("PUSHREFCONT", [("DROP",)] + list(body)), ("IFJMP",)]
    ops += [("THROW", EXC_UNKNOWN_METHOD)]
    return asm(ops)


# ---------------------------------------------------------------------------
# The emulator facade (reference parsers/accounts/emulator.py:123-133 API)
# ---------------------------------------------------------------------------

class TvmEmulator:
    """Per-account get-method runner: hold the account's code+data,
    execute methods by id or name, return the reference's result dict.

    ``code``/``data`` accept a Cell or a serialized BOC (the account-
    state tables carry binary BOC columns)."""

    def __init__(self, code: Cell | bytes, data: Cell | bytes, *,
                 gas_limit: int = 1_000_000):
        from .boc import parse_boc

        self.code = code if isinstance(code, Cell) else parse_boc(code)
        self.data = data if isinstance(data, Cell) else parse_boc(data)
        self.gas_limit = gas_limit
        self.c7: tuple = ()

    def set_c7(self, *, address: str | None = None, unixtime: int = 0,
               balance: int = 0, rand_seed_hex: str | None = None,
               config: Cell | None = None) -> None:
        """The smart-contract context tuple (emulator.py:124-129). Our
        synthetic get-methods only read unixtime/balance slots, but the
        full tuple rides along for parity."""
        self.c7 = (address, unixtime, balance, rand_seed_hex, config)

    def set_gas_limit(self, limit: int) -> None:
        self.gas_limit = limit

    def run_get_method(self, method: int | str, stack: list | None = None) -> dict:
        mid = method_id(method) if isinstance(method, str) else method
        vm = VM(self.code, self.data, c7=self.c7, gas_limit=self.gas_limit)
        vm.stack = list(stack or []) + [mid]
        exit_code = vm.run(Slice(self.code))
        return {
            "success": True,
            "vm_exit_code": exit_code,
            "stack": vm.stack,
            "gas_used": vm.gas,
        }
