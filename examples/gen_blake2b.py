"""Generate a blake2b-chain guest: N chained Blake2b-256 hashes of a
32-byte input via the BLAKE2B inline custom opcode.

Reference analog: the `jolt-inlines/blake2` crate + the blake2b rung of
the bench ladder (`book/src/how/optimizations/inlines.md:138`: 340,787
cycles / 32 KB = ~1,331 cycles per 128-byte compression).  One inline
`blake2b` instruction expands to ~1.4k virtual rows
(riscv/inlines.py _Blake2bBuilder).

Chain semantics: digest(i) (32 bytes, little-endian h'[0..3]) is the
message of link i+1 -- matching hashlib.blake2b(msg, digest_size=32)
per link (tests/test_inlines.py pins this).
"""

IV = [
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
    0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
    0x1f83d9abfb41bd6b, 0x5be0cd19137e2179,
]

MSG = 0x80008100   # message block: 16 u64 + t (+128) + f (+136)
ST = 0x800081a0    # 8-u64 state


def emit_inline(input_start=0x7fffff00, output_start=0x7fffff40,
                termination=0x7fffff88, chain=1):
    # Blake2b-256 (digest_size=32, no key): h0 = IV0 ^ 0x01010020
    h_init = [IV[0] ^ 0x01010020] + IV[1:]
    out = []
    E = out.append
    E(f"# Blake2b-256 chain (x{chain}) via the BLAKE2B inline opcode")
    E("# (generated; python examples/gen_blake2b.py).")
    E(f"    li   s0, 0x{MSG:x}          # message block")
    E(f"    li   s9, 0x{ST:x}          # h state")
    # zero the message tail (words 4..15), set t = 32, f = 1 (single
    # 32-byte final block per link)
    for i in range(4, 16):
        E(f"    sd   zero, {8 * i}(s0)")
    E("    li   t0, 32")
    E("    sd   t0, 128(s0)                 # t: bytes compressed")
    E("    li   t0, 1")
    E("    sd   t0, 136(s0)                 # f: final block")
    # initial-state constants hoisted into saved registers (reused per link)
    for i, v in enumerate(h_init):
        E(f"    li   s{i + 1}, 0x{v:x}")
    # first message: the 32-byte input, little-endian words (no swap)
    E(f"    li   t1, 0x{input_start:x}          # input region")
    for i in range(4):
        E(f"    ld   t0, {8 * i}(t1)")
        E(f"    sd   t0, {8 * i}(s0)")
    E(f"    li   a6, {chain}                 # chain counter")
    E("chain_head:")
    for i in range(8):
        E(f"    sd   s{i + 1}, {8 * i}(s9)")
    E("    blake2b s9, s0                   # compress (s0) into (s9)")
    E("    addi a6, a6, -1")
    E("    beq  a6, zero, chain_done")
    # next link's message = digest words h'[0..3] (LE, no swap)
    for i in range(4):
        E(f"    ld   t0, {8 * i}(s9)")
        E(f"    sd   t0, {8 * i}(s0)")
    E("    j    chain_head")
    E("chain_done:")
    E(f"    li   t3, 0x{output_start:x}          # output region")
    for i in range(4):
        E(f"    ld   t0, {8 * i}(s9)")
        E(f"    sd   t0, {8 * i}(t3)")
    E(f"    li   t2, 0x{termination:x}")
    E("    li   t4, 1")
    E("    sd   t4, 0(t2)")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    print(emit_inline(), end="")
