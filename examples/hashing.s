# keccak-permute a state seeded from hints, commit the first 8 state words
# (reference examples/hashing.rs + keccak_syscall.rs role: syscall-backed
# hashing with the digest bound to public IO)
    li s0, {hints}
    li s1, {heap}
    # zero the 50-word keccak state
    li t1, 0
    mv t2, s1
zloop:
    sw zero, 0(t2)
    addi t2, t2, 4
    addi t1, t1, 1
    li t3, 50
    blt t1, t3, zloop
    # seed state[0..n] from hints (n = first hint word, n <= 16)
    lw t4, 0(s0)
    addi t5, s0, 4
    mv t2, s1
    li t1, 0
seed:
    bge t1, t4, permute
    lw t6, 0(t5)
    sw t6, 0(t2)
    addi t5, t5, 4
    addi t2, t2, 4
    addi t1, t1, 1
    j seed
permute:
    li t0, {keccak}
    mv a0, s1
    ecall
    # commit state[0..8] as the public-IO digest
    li t0, {commit}
    mv a0, s1
    ecall
    li t0, 0
    li a0, 0
    ecall
