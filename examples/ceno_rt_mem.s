# ceno_rt_mem: heap write/read sweep (reference examples/ceno_rt_mem.rs
# role: exercise the dynamic heap RAM chips — store a stride pattern, read
# it back reversed, exit with the folded checksum)
    li s0, {hints}
    lw s1, 0(s0)        # n words
    li s2, {heap}
    li t1, 0
wloop:
    bge t1, s1, rstart
    slli t2, t1, 2
    add t2, t2, s2
    slli t3, t1, 3      # value = 8*i + 3
    addi t3, t3, 3
    sw t3, 0(t2)
    addi t1, t1, 1
    j wloop
rstart:
    li t0, 0            # acc
    addi t1, s1, -1
rloop:
    blt t1, zero, done
    slli t2, t1, 2
    add t2, t2, s2
    lw t3, 0(t2)
    xor t0, t0, t3
    add t0, t0, t3
    li t4, 65535
    and t0, t0, t4
    addi t1, t1, -1
    j rloop
done:
    mv a0, t0
    li t0, 0
    ecall
