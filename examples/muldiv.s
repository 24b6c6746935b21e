# muldiv guest: RV64M edge cases (`examples/muldiv` in the reference):
# division by zero, signed-overflow MIN/-1, MULH cross-checks.  Writes a
# checksum of all results.  Addresses assume --io-size 64.
    li   t0, 0x7fffff00
    ld   a0, 0(t0)          # x
    ld   a1, 8(t0)          # y
    li   a5, 0
    # mul family
    mul  t1, a0, a1
    add  a5, a5, t1
    mulh t1, a0, a1
    add  a5, a5, t1
    mulhu t1, a0, a1
    add  a5, a5, t1
    mulhsu t1, a0, a1
    add  a5, a5, t1
    # div/rem (y may be 0: spec says q = -1, r = x)
    div  t1, a0, a1
    add  a5, a5, t1
    divu t1, a0, a1
    add  a5, a5, t1
    rem  t1, a0, a1
    add  a5, a5, t1
    remu t1, a0, a1
    add  a5, a5, t1
    # signed-overflow pair: MIN / -1
    li   t2, 1
    slli t2, t2, 63         # i64::MIN
    li   t3, -1
    div  t1, t2, t3
    add  a5, a5, t1
    rem  t1, t2, t3
    add  a5, a5, t1
    # word variants
    mulw t1, a0, a1
    add  a5, a5, t1
    divw t1, a0, a1
    add  a5, a5, t1
    remw t1, a0, a1
    add  a5, a5, t1
    li   t0, 0x7fffff40
    sd   a5, 0(t0)
    li   t1, 0x7fffff88
    li   t2, 1
    sd   t2, 0(t1)
