# hints: read n hint words and fold them into a checksum using the M
# extension (reference examples/hints.rs role: multi-value host input via
# the hints region; exercises MUL/REMU/XOR on top of the base set)
    li s0, {hints}
    lw s1, 0(s0)        # n
    addi s2, s0, 4      # data base
    li t0, 0            # acc
    li t1, 0            # i
    li t2, 65521        # modulus (largest u16 prime)
loop:
    bge t1, s1, done
    slli t3, t1, 2
    add t3, t3, s2
    lw t4, 0(t3)
    li t5, 31
    mul t0, t0, t5      # acc = acc*31 + v (mod 65521)
    add t0, t0, t4
    remu t0, t0, t2
    addi t1, t1, 1
    j loop
done:
    mv a0, t0
    li t0, 0
    ecall
