"""Host SDK (jolt_tpu/sdk.py): the #[jolt::provable] analog's lifecycle --
compile / preprocess / trace / analyze / build_prover / build_verifier
(`jolt-sdk/macros/src/lib.rs:130-562`)."""

from jolt_tpu.sdk import provable

FIB = """
    li   a0, 10
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
    li   t0, {out}
    sd   a1, 0(t0)
    li   t1, {term}
    li   t2, 1
    sd   t2, 0(t1)
"""


def _guest():
    from jolt_tpu.riscv.emulator import MemoryLayout
    layout = MemoryLayout(max_input_size=64, max_output_size=64)
    src = FIB.format(out=layout.output_start, term=layout.termination)
    return provable(src, max_input_size=64, max_output_size=64)


def test_analyze_and_run():
    g = _guest()
    summary = g.analyze()
    assert summary.trace_length > 20
    assert summary.counts.get("ADD", 0) >= 10     # fib adds
    out = g.run()
    assert int.from_bytes(out.outputs[:8], "little") == 55
    assert not out.panic


def test_preprocess_is_stable():
    g = _guest()
    d1 = g.preprocess()
    d2 = _guest().preprocess()
    assert d1 == d2 and len(d1) == 32


def test_prover_verifier_closures():
    g = _guest()
    prove_fib = g.build_prover()
    verify_fib = g.build_verifier()
    out, proof = prove_fib(b"")
    assert int.from_bytes(out.outputs[:8], "little") == 55
    assert verify_fib(b"", out.outputs, out.panic, proof)
    # wrong claimed output must fail (closure returns False, not raises)
    bad = bytearray(out.outputs)
    bad[0] ^= 1
    assert not verify_fib(b"", bytes(bad), out.panic, proof)
