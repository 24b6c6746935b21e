# memory-ops guest: every load/store width, signed and unsigned
# (`examples/memory-ops` in the reference).  Builds a pattern in RAM,
# reads it back through all access widths, writes a checksum.
    li   s0, 0x80010000     # scratch
    li   t0, 0x123456789abcdef0
    sd   t0, 0(s0)
    li   t1, 0x55
    sb   t1, 8(s0)
    li   t1, 0x7fee
    sh   t1, 10(s0)
    li   t1, 0x80000001
    sw   t1, 12(s0)
    li   a5, 0
    lb   t2, 0(s0)          # sext(0xf0) = -16
    add  a5, a5, t2
    lbu  t2, 0(s0)          # 0xf0
    add  a5, a5, t2
    lh   t2, 0(s0)          # sext(0xdef0)
    add  a5, a5, t2
    lhu  t2, 0(s0)
    add  a5, a5, t2
    lw   t2, 0(s0)          # sext(0x9abcdef0)
    add  a5, a5, t2
    lwu  t2, 0(s0)
    add  a5, a5, t2
    ld   t2, 0(s0)
    add  a5, a5, t2
    lbu  t2, 8(s0)
    add  a5, a5, t2
    lh   t2, 10(s0)
    add  a5, a5, t2
    lw   t2, 12(s0)
    add  a5, a5, t2
    li   t0, 0x7fffff40
    sd   a5, 0(t0)
    li   t1, 0x7fffff88
    li   t2, 1
    sd   t2, 0(t1)
