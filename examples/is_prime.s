# trial-division primality of hint word; a0 = 1 if prime else 0
    li t3, {hints}
    lw a1, 0(t3)
    li a0, 1
    li t1, 2
    blt a1, t1, notprime   # n < 2
loop:
    mul t2, t1, t1
    bltu a1, t2, done      # d*d > n -> prime
    remu t4, a1, t1
    beq t4, zero, notprime
    addi t1, t1, 1
    j loop
notprime:
    li a0, 0
done:
    li t0, 0
    ecall
