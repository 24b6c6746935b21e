# collatz guest: reads n from the input region, writes the number of
# Collatz steps to reach 1 (`examples/collatz` in the reference).
# Addresses assume --io-size 64: input 0x7fffff00, output 0x7fffff40,
# termination 0x7fffff88.
    li   t0, 0x7fffff00
    ld   a0, 0(t0)          # n
    li   a1, 0              # steps
loop:
    li   t1, 1
    beq  a0, t1, done
    andi t2, a0, 1
    beq  t2, zero, even
    # odd: n = 3n + 1
    li   t3, 3
    mul  a0, a0, t3
    addi a0, a0, 1
    j    next
even:
    srli a0, a0, 1
next:
    addi a1, a1, 1
    j    loop
done:
    li   t0, 0x7fffff40
    sd   a1, 0(t0)
    li   t1, 0x7fffff88
    li   t2, 1
    sd   t2, 0(t1)
