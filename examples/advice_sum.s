# advice-demo: sum four trusted + two untrusted advice dwords, write the
# total to the output region (reference examples/advice-demo).
#
# Run with the default io-size-64 layout and advice regions
# trusted=32 bytes / untrusted=16 bytes:
#   python -m jolt_tpu.cli run examples/advice_sum.s \
#       --trusted-advice <64 hex chars> --untrusted-advice <32 hex chars>
#
# Region addresses assume MemoryLayout(max_input_size=64,
# max_output_size=64, max_trusted_advice_size=32,
# max_untrusted_advice_size=16): trusted @ 0x7ffffed0,
# untrusted @ 0x7ffffef0 (larger region first, below the input region).
    li   t0, 0x7ffffed0          # trusted advice region
    ld   a0, 0(t0)
    ld   a1, 8(t0)
    add  a0, a0, a1
    ld   a1, 16(t0)
    add  a0, a0, a1
    ld   a1, 24(t0)
    add  a0, a0, a1
    li   t0, 0x7ffffef0          # untrusted advice region
    ld   a1, 0(t0)
    add  a0, a0, a1
    ld   a1, 8(t0)
    add  a0, a0, a1
    li   t1, 0x7fffff40          # output region
    sd   a0, 0(t1)
    li   t2, 0x7fffff88          # termination bit
    li   t3, 1
    sd   t3, 0(t2)
