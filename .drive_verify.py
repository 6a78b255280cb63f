"""Verify drive: sharded prove/verify + ELF prog-data e2e on the real TPU."""
import time, numpy as np

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

import jax
log(f"backend: {jax.devices()}")

from ceno_tpu.emulator import programs
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.zkvm.scheme import keygen, verify
from ceno_tpu.zkvm.shard import prove_shards, verify_shards, ShardChainError
from ceno_tpu.zkvm.layout import PV_END_PC

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

vm = programs.fibonacci_vm(30)
records = vm.run()
log(f"emulated {len(records)} steps")
pk = keygen(vm.program, CFG, PARAMS)
log("keygen done")
sproof = prove_shards(pk, vm, records, 80)
log(f"proved {sproof.n_shards} shards on TPU")
assert verify_shards(pk.vk, sproof)
log("sharded verify OK")

# tamper: break PV chain
import copy
bad = copy.deepcopy(sproof)
bad.proofs[1].public_values = bad.proofs[1].public_values.copy()
bad.proofs[1].public_values[PV_END_PC] += 4
try:
    verify_shards(pk.vk, bad)
    raise SystemExit("TAMPER ACCEPTED — FAIL")
except Exception as e:
    log(f"tampered chain rejected: {type(e).__name__}")

# ELF guest with static data, single-shard e2e
from ceno_tpu.emulator.elf import load_elf, load_elf_vm, write_elf
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import Platform
from ceno_tpu.zkvm.e2e import run_e2e

ROM, DATA = 0x0800_0000, 0x0900_0000
src = f"""
    li t1, {DATA}
    lw a0, 0(t1)
    lw t2, 4(t1)
    add a0, a0, t2
    sw a0, 8(t1)
    li t0, 0
    ecall
"""
words = assemble(src, ROM)
blob = write_elf(words, ROM, data={DATA: 21, DATA+4: 21, DATA+8: 0},
                 sheap=Platform.heap_start)
prog = load_elf(blob)
vm2 = load_elf_vm(blob)
res = run_e2e(vm2, CFG, PARAMS, data_image=prog.data_image())
assert vm2.regs[10] == 42
assert verify(res.pk.vk, res.proof)
log("ELF prog-data e2e verify OK")

# keccak precompile: cost-model sharding puts the keccak step in its own
# shard; the whole thing proves and stitch-verifies on the TPU
from ceno_tpu.emulator.state import VMState, make_program

src = f"""
    li t1, {Platform.heap_start}
    li a1, 9
    sw a1, 0(t1)
    li t0, {Platform.ECALL_KECCAK}
    mv a0, t1
    ecall
    lw a2, 0(t1)
    li t0, 0
    li a0, 0
    ecall
"""
vm3 = VMState(make_program(assemble(src, 0x0800_0000), 0x0800_0000), 0x0800_0000)
records = vm3.run()
pk3 = keygen(vm3.program, CFG, PARAMS)
sp3 = prove_shards(pk3, vm3, records, max_cells_per_shard=20000)
assert sp3.n_shards >= 2
assert verify_shards(pk3.vk, sp3)
log(f"keccak guest proved across {sp3.n_shards} shards, stitch-verify OK")

# PUB_IO_COMMIT: guest commits a digest; verifier recomputes from the
# declared public words and compares
from ceno_tpu.emulator.keccak import public_io_digest_words
from ceno_tpu.zkvm.layout import PV_PUBIO_DIGEST

PUB = [0xDEADBEEF, 42]
src = f"""
    li t1, {Platform.hints_start}
    li t2, {Platform.heap_start}
    li t3, 8
loop:
    lw a1, 0(t1)
    sw a1, 0(t2)
    addi t1, t1, 4
    addi t2, t2, 4
    addi t3, t3, -1
    bne t3, x0, loop
    li a0, {Platform.heap_start}
    li t0, {Platform.ECALL_COMMIT}
    ecall
    li t0, 0
    li a0, 0
    ecall
"""
vm4 = VMState(make_program(assemble(src, 0x0800_0000), 0x0800_0000), 0x0800_0000)
for i, wd in enumerate(public_io_digest_words(PUB)):
    vm4.init_memory(Platform.hints_start + 4 * i, wd)
res4 = run_e2e(vm4, CFG, PARAMS)
assert verify(res4.pk.vk, res4.proof)
got = [
    int(res4.proof.public_values[PV_PUBIO_DIGEST + 2 * i])
    | (int(res4.proof.public_values[PV_PUBIO_DIGEST + 2 * i + 1]) << 16)
    for i in range(8)
]
assert got == public_io_digest_words(PUB)
assert got != public_io_digest_words(PUB + [1])
log("PUB_IO_COMMIT digest binding verify OK")
print("ALL VERIFY DRIVES PASSED", flush=True)
