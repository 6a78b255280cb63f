# median of N hint words (reference examples/median.rs role):
# bubble-sort the hint values in place, a0 = element at index n/2
    li s0, {hints}
    lw s1, 0(s0)        # n
    addi s2, s0, 4      # data base
outer:
    li t0, 0            # swapped = 0
    li t1, 0            # i = 0
    addi t2, s1, -1     # n-1
inner:
    bge t1, t2, endinner
    slli t3, t1, 2
    add t3, t3, s2
    lw t4, 0(t3)
    lw t5, 4(t3)
    bge t5, t4, noswap
    sw t5, 0(t3)
    sw t4, 4(t3)
    li t0, 1
noswap:
    addi t1, t1, 1
    j inner
endinner:
    bne t0, zero, outer
    srli t1, s1, 1      # n / 2
    slli t1, t1, 2
    add t1, t1, s2
    lw a0, 0(t1)
    li t0, 0
    ecall
