# Precompile torture: every native-core syscall in ONE program, chained so
# each stage consumes the previous stage's output (reference
# examples/ torture-style precompile guests, syscalls.rs role):
#   1. M-extension seeds a 50-word keccak state (mul/remu over a counter)
#   2. KECCAK_PERMUTE over the state at {heap}
#   3. SHA_EXTEND over a message schedule w[0..16] built from the keccak
#      output (writes w[16])
#   4. UINT256_MUL: x = keccak words 0..8, y = keccak words 8..16,
#      modulus = w[16] replicated (odd-ified), result overwrites x
#   5. PUB_IO_COMMIT over the uint256 result (8 words)
#   6. halt with exit code = result word 0 masked to 16 bits
    li s0, {heap}
    # -- stage 1: seed state[i] = (i*2654435761) % 65521 via MUL/REMU
    li t1, 0
    mv t2, s0
    li t3, 50
    li t4, 2654435761
    li t5, 65521
seed:
    mul t6, t1, t4
    remu t6, t6, t5
    sw t6, 0(t2)
    addi t2, t2, 4
    addi t1, t1, 1
    blt t1, t3, seed
    # -- stage 2: keccak-f[1600]
    li t0, {keccak}
    mv a0, s0
    ecall
    # -- stage 3: copy state[0..16] -> w[0..16] at heap+512, extend w[16]
    li s1, {w_base}
    li t1, 0
    mv t2, s0
    mv t3, s1
wcopy:
    lw t4, 0(t2)
    sw t4, 0(t3)
    addi t2, t2, 4
    addi t3, t3, 4
    addi t1, t1, 1
    li t5, 16
    blt t1, t5, wcopy
    li t0, {sha_extend}
    addi a0, s1, 64
    ecall
    # -- stage 4: uint256 x at heap+1024 <- state[0..4] (128-bit: keeps
    # the quotient under 2^256 — the chip shares the reference's
    # reduced-inputs carry restriction, field_op.rs:47-56), y at +1088 <-
    # state[8..16]; modulus words at y+32 <- w[16] | 1 (odd), replicated
    li s2, {x_base}
    li t1, 0
    mv t2, s0
    mv t3, s2
xcopy:
    lw t4, 0(t2)
    sw t4, 0(t3)
    addi t2, t2, 4
    addi t3, t3, 4
    addi t1, t1, 1
    li t5, 4
    blt t1, t5, xcopy
xzero:
    sw zero, 0(t3)
    addi t3, t3, 4
    addi t1, t1, 1
    li t5, 8
    blt t1, t5, xzero
    addi t2, t2, 16     # skip state[4..8]: y reads state[8..16]
    li t1, 0
    addi t3, s2, 64     # y region = x + 64 bytes
ycopy:
    lw t4, 0(t2)
    sw t4, 0(t3)
    addi t2, t2, 4
    addi t3, t3, 4
    addi t1, t1, 1
    li t5, 8
    blt t1, t5, ycopy
    lw t4, 64(s1)       # w[16]
    ori t4, t4, 1
    li t1, 0
    addi t3, s2, 96     # modulus region = y + 32
mcopy:
    sw t4, 0(t3)
    addi t3, t3, 4
    addi t1, t1, 1
    li t5, 8
    blt t1, t5, mcopy
    li t0, {uint256}
    mv a0, s2
    addi a1, s2, 64
    ecall
    # -- stage 5: commit the result (8 words at x)
    li t0, {commit}
    mv a0, s2
    ecall
    # -- stage 6: halt with result[0] & 0xffff
    lw a0, 0(s2)
    li t1, 65535
    and a0, a0, t1
    li t0, 0
    ecall
