# SHA-256 chain (x1) of the 32-byte input region (generated;
# python examples/gen_sha256.py > examples/sha256.s).
# One padded FIPS 180-4 block per link; K/W/H tables in guest heap.
    li   s10, 0x80008400          # K table
    li   t0, 0x428a2f98
    sw   t0, 0(s10)
    li   t0, 0x71374491
    sw   t0, 4(s10)
    li   t0, 0xb5c0fbcf
    sw   t0, 8(s10)
    li   t0, 0xe9b5dba5
    sw   t0, 12(s10)
    li   t0, 0x3956c25b
    sw   t0, 16(s10)
    li   t0, 0x59f111f1
    sw   t0, 20(s10)
    li   t0, 0x923f82a4
    sw   t0, 24(s10)
    li   t0, 0xab1c5ed5
    sw   t0, 28(s10)
    li   t0, 0xd807aa98
    sw   t0, 32(s10)
    li   t0, 0x12835b01
    sw   t0, 36(s10)
    li   t0, 0x243185be
    sw   t0, 40(s10)
    li   t0, 0x550c7dc3
    sw   t0, 44(s10)
    li   t0, 0x72be5d74
    sw   t0, 48(s10)
    li   t0, 0x80deb1fe
    sw   t0, 52(s10)
    li   t0, 0x9bdc06a7
    sw   t0, 56(s10)
    li   t0, 0xc19bf174
    sw   t0, 60(s10)
    li   t0, 0xe49b69c1
    sw   t0, 64(s10)
    li   t0, 0xefbe4786
    sw   t0, 68(s10)
    li   t0, 0xfc19dc6
    sw   t0, 72(s10)
    li   t0, 0x240ca1cc
    sw   t0, 76(s10)
    li   t0, 0x2de92c6f
    sw   t0, 80(s10)
    li   t0, 0x4a7484aa
    sw   t0, 84(s10)
    li   t0, 0x5cb0a9dc
    sw   t0, 88(s10)
    li   t0, 0x76f988da
    sw   t0, 92(s10)
    li   t0, 0x983e5152
    sw   t0, 96(s10)
    li   t0, 0xa831c66d
    sw   t0, 100(s10)
    li   t0, 0xb00327c8
    sw   t0, 104(s10)
    li   t0, 0xbf597fc7
    sw   t0, 108(s10)
    li   t0, 0xc6e00bf3
    sw   t0, 112(s10)
    li   t0, 0xd5a79147
    sw   t0, 116(s10)
    li   t0, 0x6ca6351
    sw   t0, 120(s10)
    li   t0, 0x14292967
    sw   t0, 124(s10)
    li   t0, 0x27b70a85
    sw   t0, 128(s10)
    li   t0, 0x2e1b2138
    sw   t0, 132(s10)
    li   t0, 0x4d2c6dfc
    sw   t0, 136(s10)
    li   t0, 0x53380d13
    sw   t0, 140(s10)
    li   t0, 0x650a7354
    sw   t0, 144(s10)
    li   t0, 0x766a0abb
    sw   t0, 148(s10)
    li   t0, 0x81c2c92e
    sw   t0, 152(s10)
    li   t0, 0x92722c85
    sw   t0, 156(s10)
    li   t0, 0xa2bfe8a1
    sw   t0, 160(s10)
    li   t0, 0xa81a664b
    sw   t0, 164(s10)
    li   t0, 0xc24b8b70
    sw   t0, 168(s10)
    li   t0, 0xc76c51a3
    sw   t0, 172(s10)
    li   t0, 0xd192e819
    sw   t0, 176(s10)
    li   t0, 0xd6990624
    sw   t0, 180(s10)
    li   t0, 0xf40e3585
    sw   t0, 184(s10)
    li   t0, 0x106aa070
    sw   t0, 188(s10)
    li   t0, 0x19a4c116
    sw   t0, 192(s10)
    li   t0, 0x1e376c08
    sw   t0, 196(s10)
    li   t0, 0x2748774c
    sw   t0, 200(s10)
    li   t0, 0x34b0bcb5
    sw   t0, 204(s10)
    li   t0, 0x391c0cb3
    sw   t0, 208(s10)
    li   t0, 0x4ed8aa4a
    sw   t0, 212(s10)
    li   t0, 0x5b9cca4f
    sw   t0, 216(s10)
    li   t0, 0x682e6ff3
    sw   t0, 220(s10)
    li   t0, 0x748f82ee
    sw   t0, 224(s10)
    li   t0, 0x78a5636f
    sw   t0, 228(s10)
    li   t0, 0x84c87814
    sw   t0, 232(s10)
    li   t0, 0x8cc70208
    sw   t0, 236(s10)
    li   t0, 0x90befffa
    sw   t0, 240(s10)
    li   t0, 0xa4506ceb
    sw   t0, 244(s10)
    li   t0, 0xbef9a3f7
    sw   t0, 248(s10)
    li   t0, 0xc67178f2
    sw   t0, 252(s10)
    li   s11, 0x80008000         # block buffer
    li   t1, 0x7fffff00          # input region
    ld   t0, 0(t1)
    sd   t0, 0(s11)
    ld   t0, 8(t1)
    sd   t0, 8(s11)
    ld   t0, 16(t1)
    sd   t0, 16(s11)
    ld   t0, 24(t1)
    sd   t0, 24(s11)
    li   t0, 0x80
    sd   t0, 32(s11)
    sd   zero, 40(s11)
    sd   zero, 48(s11)
    li   t0, 0x0001000000000000      # 256-bit length, big-endian
    sd   t0, 56(s11)
    li   a6, 1                 # chain counter
chain_head:
    li   s9, 0x80008300           # H state = H0
    li   t0, 0x6a09e667
    sw   t0, 0(s9)
    li   t0, 0xbb67ae85
    sw   t0, 4(s9)
    li   t0, 0x3c6ef372
    sw   t0, 8(s9)
    li   t0, 0xa54ff53a
    sw   t0, 12(s9)
    li   t0, 0x510e527f
    sw   t0, 16(s9)
    li   t0, 0x9b05688c
    sw   t0, 20(s9)
    li   t0, 0x1f83d9ab
    sw   t0, 24(s9)
    li   t0, 0x5be0cd19
    sw   t0, 28(s9)
    li   s0, 0x80008100           # W
    li   a4, 0
ws_head:
    add  t1, s11, a4
    lbu  t0, 0(t1)
    slliw t2, t0, 24
    lbu  t0, 1(t1)
    slliw t3, t0, 16
    or   t2, t2, t3
    lbu  t0, 2(t1)
    slliw t3, t0, 8
    or   t2, t2, t3
    lbu  t0, 3(t1)
    or   t2, t2, t0
    add  t1, s0, a4
    sw   t2, 0(t1)
    addi a4, a4, 4
    li   t0, 64
    bne  a4, t0, ws_head
    li   a4, 64
ws_ext:
    add  t1, s0, a4
    lw   t2, -8(t1)                  # W[t-2]
    srliw t4, t2, 17
    slliw t5, t2, 15
    or   t3, t4, t5
    srliw t4, t2, 19
    slliw t5, t2, 13
    or   t6, t4, t5
    xor  t3, t3, t6
    srliw t6, t2, 10
    xor  t3, t3, t6                  # sigma1
    lw   t2, -28(t1)                 # W[t-7]
    addw t3, t3, t2
    lw   t2, -60(t1)                 # W[t-15]
    srliw t4, t2, 7
    slliw t5, t2, 25
    or   t6, t4, t5
    srliw t4, t2, 18
    slliw t5, t2, 14
    or   a5, t4, t5
    xor  t6, t6, a5
    srliw a5, t2, 3
    xor  t6, t6, a5                  # sigma0
    addw t3, t3, t6
    lw   t2, -64(t1)                 # W[t-16]
    addw t3, t3, t2
    sw   t3, 0(t1)
    addi a4, a4, 4
    li   t0, 256
    bne  a4, t0, ws_ext
    lw   s1, 0(s9)
    lw   s2, 4(s9)
    lw   s3, 8(s9)
    lw   s4, 12(s9)
    lw   s5, 16(s9)
    lw   s6, 20(s9)
    lw   s7, 24(s9)
    lw   s8, 28(s9)
    li   a4, 0
round:
    srliw t4, s5, 6
    slliw t5, s5, 26
    or   t0, t4, t5
    srliw t4, s5, 11
    slliw t5, s5, 21
    or   t1, t4, t5
    xor  t0, t0, t1
    srliw t4, s5, 25
    slliw t5, s5, 7
    or   t1, t4, t5
    xor  t0, t0, t1                  # Sigma1(e)
    and  t1, s5, s6
    xori t2, s5, -1
    and  t2, t2, s7
    xor  t1, t1, t2                  # Ch(e,f,g)
    addw t0, t0, t1
    addw t0, t0, s8                  # + h
    add  t1, s10, a4
    lw   t2, 0(t1)                   # K[t]
    addw t0, t0, t2
    add  t1, s0, a4
    lw   t2, 0(t1)                   # W[t]
    addw t0, t0, t2                  # T1
    srliw t4, s1, 2
    slliw t5, s1, 30
    or   t1, t4, t5
    srliw t4, s1, 13
    slliw t5, s1, 19
    or   t2, t4, t5
    xor  t1, t1, t2
    srliw t4, s1, 22
    slliw t5, s1, 10
    or   t2, t4, t5
    xor  t1, t1, t2                  # Sigma0(a)
    and  t2, s1, s2
    and  t3, s1, s3
    xor  t2, t2, t3
    and  t3, s2, s3
    xor  t2, t2, t3                  # Maj(a,b,c)
    addw t1, t1, t2                  # T2
    addw s8, zero, s7                # h = g
    addw s7, zero, s6                # g = f
    addw s6, zero, s5                # f = e
    addw s5, s4, t0                  # e = d + T1
    addw s4, zero, s3                # d = c
    addw s3, zero, s2                # c = b
    addw s2, zero, s1                # b = a
    addw s1, t0, t1                  # a = T1 + T2
    addi a4, a4, 4
    li   t0, 256
    bne  a4, t0, round
    addi t3, s11, 0                  # digest -> block buffer
    lw   t0, 0(s9)
    addw t0, t0, s1
    srliw t1, t0, 24
    sb   t1, 0(t3)
    srliw t1, t0, 16
    sb   t1, 1(t3)
    srliw t1, t0, 8
    sb   t1, 2(t3)
    sb   t0, 3(t3)
    lw   t0, 4(s9)
    addw t0, t0, s2
    srliw t1, t0, 24
    sb   t1, 4(t3)
    srliw t1, t0, 16
    sb   t1, 5(t3)
    srliw t1, t0, 8
    sb   t1, 6(t3)
    sb   t0, 7(t3)
    lw   t0, 8(s9)
    addw t0, t0, s3
    srliw t1, t0, 24
    sb   t1, 8(t3)
    srliw t1, t0, 16
    sb   t1, 9(t3)
    srliw t1, t0, 8
    sb   t1, 10(t3)
    sb   t0, 11(t3)
    lw   t0, 12(s9)
    addw t0, t0, s4
    srliw t1, t0, 24
    sb   t1, 12(t3)
    srliw t1, t0, 16
    sb   t1, 13(t3)
    srliw t1, t0, 8
    sb   t1, 14(t3)
    sb   t0, 15(t3)
    lw   t0, 16(s9)
    addw t0, t0, s5
    srliw t1, t0, 24
    sb   t1, 16(t3)
    srliw t1, t0, 16
    sb   t1, 17(t3)
    srliw t1, t0, 8
    sb   t1, 18(t3)
    sb   t0, 19(t3)
    lw   t0, 20(s9)
    addw t0, t0, s6
    srliw t1, t0, 24
    sb   t1, 20(t3)
    srliw t1, t0, 16
    sb   t1, 21(t3)
    srliw t1, t0, 8
    sb   t1, 22(t3)
    sb   t0, 23(t3)
    lw   t0, 24(s9)
    addw t0, t0, s7
    srliw t1, t0, 24
    sb   t1, 24(t3)
    srliw t1, t0, 16
    sb   t1, 25(t3)
    srliw t1, t0, 8
    sb   t1, 26(t3)
    sb   t0, 27(t3)
    lw   t0, 28(s9)
    addw t0, t0, s8
    srliw t1, t0, 24
    sb   t1, 28(t3)
    srliw t1, t0, 16
    sb   t1, 29(t3)
    srliw t1, t0, 8
    sb   t1, 30(t3)
    sb   t0, 31(t3)
    addi a6, a6, -1
    bne  a6, zero, chain_head
    li   t3, 0x7fffff40          # output region
    ld   t0, 0(s11)
    sd   t0, 0(t3)
    ld   t0, 8(s11)
    sd   t0, 8(t3)
    ld   t0, 16(s11)
    sd   t0, 16(t3)
    ld   t0, 24(s11)
    sd   t0, 24(t3)
    li   t0, 0x7fffff88          # termination bit
    li   t1, 1
    sd   t1, 0(t0)
