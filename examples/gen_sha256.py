"""Generate examples/sha256.s: SHA-256 of a 32-byte input, RV64IM assembly.

The reference's sha2-ex example hashes a 32-byte buffer with the sha2 crate
(guest Rust); this image has no RISC-V cross-compiler, so the same workload
is emitted as assembler source for `jolt_tpu.riscv.assembler`.  One padded
FIPS 180-4 block; digest written big-endian to the output region.

Usage:  python examples/gen_sha256.py > examples/sha256.s
Addresses assume the CLI-default io-size-64 MemoryLayout; pass a different
layout to emit() for other configs.  tests/test_sha256_guest.py checks the
digest against hashlib.
"""

K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]
H0 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
      0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]

BLK = 0x80008000     # 64-byte padded block (guest heap, above the code)
WS = 0x80008100      # 64-entry message schedule (4B each)
HS = 0x80008300      # 8-entry running hash state
KT = 0x80008400      # 64-entry K table

A2H = ["s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8"]


def rotr(out, dst, src, n, t1="t4", t2="t5"):
    out.append(f"    srliw {t1}, {src}, {n}")
    out.append(f"    slliw {t2}, {src}, {32 - n}")
    out.append(f"    or   {dst}, {t1}, {t2}")


def emit(input_start=0x7fffff00, output_start=0x7fffff40,
         termination=0x7fffff88, chain=1):
    """chain=N: sha2-chain -- digest(i) is the 32-byte message of block
    i+1 (the reference's main bench workload, e2e_profiling.rs)."""
    out = []
    E = out.append
    E(f"# SHA-256 chain (x{chain}) of the 32-byte input region (generated;")
    E("# python examples/gen_sha256.py > examples/sha256.s).")
    E("# One padded FIPS 180-4 block per link; K/W/H tables in guest heap.")
    E(f"    li   s10, 0x{KT:x}          # K table")
    for i, k in enumerate(K):
        E(f"    li   t0, 0x{k:x}")
        E(f"    sw   t0, {4 * i}(s10)")
    # padded block: 32 message bytes || 0x80 || zeros || bitlen(=256) BE;
    # bytes 32..63 are loop-invariant
    E(f"    li   s11, 0x{BLK:x}         # block buffer")
    E(f"    li   t1, 0x{input_start:x}          # input region")
    for i in range(4):
        E(f"    ld   t0, {8 * i}(t1)")
        E(f"    sd   t0, {8 * i}(s11)")
    E("    li   t0, 0x80")
    E("    sd   t0, 32(s11)")
    E("    sd   zero, 40(s11)")
    E("    sd   zero, 48(s11)")
    E("    li   t0, 0x0001000000000000      # 256-bit length, big-endian")
    E("    sd   t0, 56(s11)")
    E(f"    li   a6, {chain}                 # chain counter")
    E("chain_head:")
    E(f"    li   s9, 0x{HS:x}           # H state = H0")
    for i, h in enumerate(H0):
        E(f"    li   t0, 0x{h:x}")
        E(f"    sw   t0, {4 * i}(s9)")
    # ---- W[0..15]: big-endian word loads ----
    E(f"    li   s0, 0x{WS:x}           # W")
    E("    li   a4, 0")
    E("ws_head:")
    E("    add  t1, s11, a4")
    E("    lbu  t0, 0(t1)")
    E("    slliw t2, t0, 24")
    E("    lbu  t0, 1(t1)")
    E("    slliw t3, t0, 16")
    E("    or   t2, t2, t3")
    E("    lbu  t0, 2(t1)")
    E("    slliw t3, t0, 8")
    E("    or   t2, t2, t3")
    E("    lbu  t0, 3(t1)")
    E("    or   t2, t2, t0")
    E("    add  t1, s0, a4")
    E("    sw   t2, 0(t1)")
    E("    addi a4, a4, 4")
    E("    li   t0, 64")
    E("    bne  a4, t0, ws_head")
    # ---- W[16..63] ----
    E("    li   a4, 64")
    E("ws_ext:")
    E("    add  t1, s0, a4")
    E("    lw   t2, -8(t1)                  # W[t-2]")
    rotr(out, "t3", "t2", 17)
    rotr(out, "t6", "t2", 19)
    E("    xor  t3, t3, t6")
    E("    srliw t6, t2, 10")
    E("    xor  t3, t3, t6                  # sigma1")
    E("    lw   t2, -28(t1)                 # W[t-7]")
    E("    addw t3, t3, t2")
    E("    lw   t2, -60(t1)                 # W[t-15]")
    rotr(out, "t6", "t2", 7)
    rotr(out, "a5", "t2", 18, "t4", "t5")
    E("    xor  t6, t6, a5")
    E("    srliw a5, t2, 3")
    E("    xor  t6, t6, a5                  # sigma0")
    E("    addw t3, t3, t6")
    E("    lw   t2, -64(t1)                 # W[t-16]")
    E("    addw t3, t3, t2")
    E("    sw   t3, 0(t1)")
    E("    addi a4, a4, 4")
    E("    li   t0, 256")
    E("    bne  a4, t0, ws_ext")
    # ---- working vars = H ----
    for i, r in enumerate(A2H):
        E(f"    lw   {r}, {4 * i}(s9)")
    # ---- 64 rounds ----
    E("    li   a4, 0")
    E("round:")
    rotr(out, "t0", "s5", 6)
    rotr(out, "t1", "s5", 11)
    E("    xor  t0, t0, t1")
    rotr(out, "t1", "s5", 25)
    E("    xor  t0, t0, t1                  # Sigma1(e)")
    E("    and  t1, s5, s6")
    E("    xori t2, s5, -1")
    E("    and  t2, t2, s7")
    E("    xor  t1, t1, t2                  # Ch(e,f,g)")
    E("    addw t0, t0, t1")
    E("    addw t0, t0, s8                  # + h")
    E("    add  t1, s10, a4")
    E("    lw   t2, 0(t1)                   # K[t]")
    E("    addw t0, t0, t2")
    E("    add  t1, s0, a4")
    E("    lw   t2, 0(t1)                   # W[t]")
    E("    addw t0, t0, t2                  # T1")
    rotr(out, "t1", "s1", 2)
    rotr(out, "t2", "s1", 13)
    E("    xor  t1, t1, t2")
    rotr(out, "t2", "s1", 22)
    E("    xor  t1, t1, t2                  # Sigma0(a)")
    E("    and  t2, s1, s2")
    E("    and  t3, s1, s3")
    E("    xor  t2, t2, t3")
    E("    and  t3, s2, s3")
    E("    xor  t2, t2, t3                  # Maj(a,b,c)")
    E("    addw t1, t1, t2                  # T2")
    E("    addw s8, zero, s7                # h = g")
    E("    addw s7, zero, s6                # g = f")
    E("    addw s6, zero, s5                # f = e")
    E("    addw s5, s4, t0                  # e = d + T1")
    E("    addw s4, zero, s3                # d = c")
    E("    addw s3, zero, s2                # c = b")
    E("    addw s2, zero, s1                # b = a")
    E("    addw s1, t0, t1                  # a = T1 + T2")
    E("    addi a4, a4, 4")
    E("    li   t0, 256")
    E("    bne  a4, t0, round")
    # ---- digest = H + working vars, stored big-endian into the block
    # buffer (the next link's message; bytes 32..63 stay padded) ----
    E("    addi t3, s11, 0                  # digest -> block buffer")
    for i, r in enumerate(A2H):
        E(f"    lw   t0, {4 * i}(s9)")
        E(f"    addw t0, t0, {r}")
        E("    srliw t1, t0, 24")
        E(f"    sb   t1, {4 * i + 0}(t3)")
        E("    srliw t1, t0, 16")
        E(f"    sb   t1, {4 * i + 1}(t3)")
        E("    srliw t1, t0, 8")
        E(f"    sb   t1, {4 * i + 2}(t3)")
        E(f"    sb   t0, {4 * i + 3}(t3)")
    E("    addi a6, a6, -1")
    E("    bne  a6, zero, chain_head")
    # ---- final digest: copy block[0..32] to the output region ----
    E(f"    li   t3, 0x{output_start:x}          # output region")
    for i in range(4):
        E(f"    ld   t0, {8 * i}(s11)")
        E(f"    sd   t0, {8 * i}(t3)")
    E(f"    li   t0, 0x{termination:x}          # termination bit")
    E("    li   t1, 1")
    E("    sd   t1, 0(t0)")
    return "\n".join(out) + "\n"


def emit_inline(input_start=0x7fffff00, output_start=0x7fffff40,
                termination=0x7fffff88, chain=1):
    """sha2-chain via the SHA256 INLINE custom opcode (the reference's
    accelerated path, jolt-inlines/sha2): one `sha256init` instruction per
    link expands to ~2.2k virtual rows vs ~12.7k software rows, mirroring
    the reference's 5.9x guest-cycle reduction (inlines.md:132-140).

    Message buffer layout: 16 u32 W-words (native u32 values = big-endian
    block words, as the inline expects; sdk.rs swap_bytes contract).  A
    chain step feeds digest words straight back as the next message --
    digest bytes are the BE serialization of the state words, so
    W[i] = state[i] with no swap."""
    W = 0x80008100     # 16-word message buffer
    S = 0x80008200     # 8-word state buffer
    out = []
    E = out.append
    E(f"# SHA-256 chain (x{chain}) via the SHA256_INIT inline opcode")
    E("# (generated; python examples/gen_sha256.py).")
    E(f"    li   s0, 0x{W:x}          # W message words")
    E(f"    li   s9, 0x{S:x}          # H state")
    # W[0..8]: big-endian words of the 32-byte input (one-time byte swap)
    E(f"    li   t1, 0x{input_start:x}          # input region")
    E("    li   a4, 0")
    E("in_head:")
    E("    add  t5, t1, a4")
    E("    lbu  t0, 0(t5)")
    E("    slliw t2, t0, 24")
    E("    lbu  t0, 1(t5)")
    E("    slliw t3, t0, 16")
    E("    or   t2, t2, t3")
    E("    lbu  t0, 2(t5)")
    E("    slliw t3, t0, 8")
    E("    or   t2, t2, t3")
    E("    lbu  t0, 3(t5)")
    E("    or   t2, t2, t0")
    E("    add  t5, s0, a4")
    E("    sw   t2, 0(t5)")
    E("    addi a4, a4, 4")
    E("    li   t0, 32")
    E("    bne  a4, t0, in_head")
    # W[8..16]: FIPS padding for a 32-byte message (0x80... || bitlen 256)
    E("    li   t0, 0x80000000")
    E("    sw   t0, 32(s0)")
    for off in (36, 40, 44, 48, 52, 56):
        E(f"    sw   zero, {off}(s0)")
    E("    li   t0, 256")
    E("    sw   t0, 60(s0)")
    E(f"    li   a6, {chain}                 # chain counter")
    E("chain_head:")
    E("    sha256init s9, s0                # compress W -> state at (s9)")
    E("    addi a6, a6, -1")
    E("    beq  a6, zero, chain_done")
    # next link's message = digest words (state values, no swap)
    for i in range(4):
        E(f"    ld   t0, {8 * i}(s9)")
        E(f"    sd   t0, {8 * i}(s0)")
    E("    j    chain_head")
    E("chain_done:")
    # output: big-endian digest bytes of the 8 state words
    E(f"    li   t3, 0x{output_start:x}          # output region")
    E("    li   a4, 0")
    E("out_head:")
    E("    add  t5, s9, a4")
    E("    lw   t0, 0(t5)")
    E("    add  t5, t3, a4")
    E("    srliw t1, t0, 24")
    E("    sb   t1, 0(t5)")
    E("    srliw t1, t0, 16")
    E("    sb   t1, 1(t5)")
    E("    srliw t1, t0, 8")
    E("    sb   t1, 2(t5)")
    E("    sb   t0, 3(t5)")
    E("    addi a4, a4, 4")
    E("    li   t0, 32")
    E("    bne  a4, t0, out_head")
    E(f"    li   t0, 0x{termination:x}          # termination bit")
    E("    li   t1, 1")
    E("    sd   t1, 0(t0)")
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    print(emit(), end="")
