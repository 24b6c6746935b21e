# fibonacci guest: reads n from the input region, writes fib(n) to outputs.
# Assembled/executed via: python -m jolt_tpu.cli run examples/fibonacci.s --input 0a00000000000000
# Addresses assume the compact layout (--io-size 64): input 0x7fffff00,
# output 0x7fffff40, termination 0x7fffff88.
    li   t0, 0x7fffff00
    ld   a0, 0(t0)
    li   a1, 0
    li   a2, 1
loop:
    beq  a0, zero, done
    add  a3, a1, a2
    mv   a1, a2
    mv   a2, a3
    addi a0, a0, -1
    j    loop
done:
    li   t0, 0x7fffff40
    sd   a1, 0(t0)
    li   t1, 0x7fffff88
    li   t2, 1
    sd   t2, 0(t1)
