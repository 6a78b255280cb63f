"""Curve precompiles: group-law mirrors, mock constraints, e2e prove."""

import numpy as np
import pytest

from ceno_tpu.emulator import curves as CV
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import public_values_from_vm, run_e2e
from ceno_tpu.zkvm.scheme import keygen, verify
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness

ROM, HEAP = Platform.rom_start, Platform.heap_start
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

# secp256k1 generator and its known small multiples (public test vectors)
G1 = (
    55066263022277343669578718895168534326250603453777594175500187360389116729240,
    32670510020758816978083085130507043184471273380659243275938904335757337482424,
)
G2 = (
    89565891926547004231252920425935692360644145829622209833684329913297188986597,
    12158399299693830322967808612713398636155367887041628176798871954788371653930,
)


def test_group_law_cross_consistency():
    """add and double agree on every curve: 2G+G == G+2G == 3G paths,
    4G = double(2G) == add(G, 3G), and everything stays on-curve."""
    for curve in ("secp256k1", "secp256r1", "bn254"):
        p = CV.CURVES[curve]["p"]
        if curve == "secp256k1":
            g = G1
        elif curve == "bn254":
            g = (1, 2)
        else:  # P-256 generator
            g = (
                0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
                0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
            )
        CV.check_on_curve(curve, *g)
        g2 = CV.ec_double(curve, *g)
        CV.check_on_curve(curve, *g2)
        g3 = CV.ec_add(curve, *g, *g2)
        g4a = CV.ec_double(curve, *g2)
        g4b = CV.ec_add(curve, *g, *g3)
        assert g4a == g4b
        # negation: G + (2G + -2G)... x-equality must be rejected
        with pytest.raises(RuntimeError):
            CV.ec_add(curve, g2[0], g2[1], g2[0], (p - g2[1]) % p)


def test_secp256k1_known_double():
    assert CV.ec_double("secp256k1", *G1) == G2


def test_scalar_invert_and_decompress():
    n = CV.CURVES["secp256k1"]["order"]
    s = 0xDEADBEEF12345
    assert CV.scalar_invert("secp256k1", s) * s % n == 1
    for curve in ("secp256k1", "secp256r1"):
        if curve == "secp256k1":
            x, y = G1
        else:
            x = 0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296
            y = 0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5
        assert CV.decompress_y(curve, x, y & 1) == y
        p = CV.CURVES[curve]["p"]
        assert CV.decompress_y(curve, x, (y & 1) ^ 1) == p - y


def _store_words(value, base_reg, off, n=8):
    out = []
    for i in range(n):
        w = (value >> (32 * i)) & 0xFFFFFFFF
        out.append(f"    li t5, {w}")
        out.append(f"    sw t5, {off + 4 * i}({base_reg})")
    return "\n".join(out)


# guest: P = G at HEAP, Q = 2G at HEAP+64; double P in place twice? No:
# 1) DOUBLE(P) -> P = 2G; 2) ADD(P at HEAP, Q=G at HEAP+64) -> P = 3G;
# 3) invert a scalar at HEAP+128; 4) decompress x(G) at HEAP+160.
SECP_GUEST = f"""
    li t1, {HEAP}
{_store_words(G1[0], "t1", 0)}
{_store_words(G1[1], "t1", 32)}
{_store_words(G1[0], "t1", 64)}
{_store_words(G1[1], "t1", 96)}
{_store_words(0xDEADBEEF12345, "t1", 128)}
{_store_words(G1[0], "t1", 160)}
    li t0, {Platform.ECALL_SECP256K1_DOUBLE}
    mv a0, t1
    ecall
    li t0, {Platform.ECALL_SECP256K1_ADD}
    addi a1, t1, 64
    ecall
    li t0, {Platform.ECALL_SECP256K1_SCALAR_INVERT}
    addi a0, t1, 128
    ecall
    li t0, {Platform.ECALL_SECP256K1_DECOMPRESS}
    addi a0, t1, 160
    li a1, {G1[1] & 1}
    ecall
    lw a0, 0(t1)
    li t0, 0
    ecall
"""


def _read256(vm, base_w):
    return sum(vm.mem.get(base_w + i, 0) << (32 * i) for i in range(8))


def _run_secp_guest():
    vm = VMState(make_program(assemble(SECP_GUEST, ROM), ROM), ROM)
    records = vm.run()
    assert vm.halted
    return vm, records


def test_secp_guest_emulates_correctly():
    vm, _ = _run_secp_guest()
    g3 = CV.ec_add("secp256k1", *G2, *G1)
    hw = HEAP >> 2
    assert _read256(vm, hw) == g3[0]
    assert _read256(vm, hw + 8) == g3[1]
    n = CV.CURVES["secp256k1"]["order"]
    assert _read256(vm, hw + 32) == pow(0xDEADBEEF12345, n - 2, n)
    assert _read256(vm, hw + 48) == G1[1]


def _mock(vm, pk, assigned, pv):
    chips = []
    for a in assigned:
        n = a.n_rows
        fixed = np.zeros((0, n), np.uint64)
        for t in pk.tables:
            if t.name == a.name and t.cb.fixed_names:
                fx = np.asarray(t.fixed_fn(), np.uint64)
                fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
        chips.append((a.compiled, a.cb, a.wit, fixed, pv, a.num_instances))
    return MockProver.assert_satisfied(chips, raise_on_error=False)


def test_secp_guest_mock_satisfied():
    vm, records = _run_secp_guest()
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs == [], errs[:5]


BN254_GUEST = f"""
    li t1, {HEAP}
{_store_words(1, "t1", 0)}
{_store_words(2, "t1", 32)}
{_store_words(3, "t1", 64)}
{_store_words(5, "t1", 96)}
{_store_words(7, "t1", 128)}
{_store_words(11, "t1", 160)}
    li t0, {Platform.ECALL_BN254_DOUBLE}
    mv a0, t1
    ecall
    li t0, {Platform.ECALL_BN254_FP2_MUL}
    addi a0, t1, 64
    addi a1, t1, 128
    ecall
    li t0, {Platform.ECALL_BN254_FP_ADD}
    addi a0, t1, 64
    addi a1, t1, 96
    ecall
    li t0, {Platform.ECALL_BN254_FP_MUL}
    ecall
    lw a0, 0(t1)
    li t0, 0
    ecall
"""


def test_bn254_guest_mock_satisfied():
    vm = VMState(make_program(assemble(BN254_GUEST, ROM), ROM), ROM)
    records = vm.run()
    assert vm.halted
    # fp2: (3 + 5u)*(7 + 11u) = -34 + 68u; then fp_add: -34 + 68 = 34;
    # then fp_mul: 34 * 68 = 2312 (all mod p)
    p = CV.CURVES["bn254"]["p"]
    hw = HEAP >> 2
    assert _read256(vm, hw + 24) == 68 % p          # r1 of the fp2 mul
    assert _read256(vm, hw + 16) == 34 * 68 % p     # after add + mul
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs == [], errs[:5]


@pytest.mark.slow
def test_secp_e2e_proves_and_verifies():
    vm = VMState(make_program(assemble(SECP_GUEST, ROM), ROM), ROM)
    res = run_e2e(vm, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)
