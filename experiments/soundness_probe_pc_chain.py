"""Soundness probe: forge a trace that repeats one instruction (breaking
PC chaining) and see whether the verifier accepts it.  Exploits the absence
of a shift sumcheck: the five next_* R1CS input openings are consumed by no
later stage, so a malicious prover may claim next_pc values that satisfy the
per-row constraints while the actual next row's pc does not follow."""
import dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from jolt_tpu.tracer.trace import trace_program, Trace
from jolt_tpu.riscv.emulator import MemoryLayout
import jolt_tpu.witness.r1cs_inputs as RI
import jolt_tpu.prover.prover as PROVER
from jolt_tpu.r1cs import constraints as C
from jolt_tpu.verifier.verifier import verify, PublicIO, VerificationError

layout = MemoryLayout(max_input_size=64, max_output_size=64)
src = open("examples/fibonacci.s").read()
tr = trace_program(src, inputs=(10).to_bytes(8, "little"), layout=layout,
                   min_padded=256)
print("honest length", tr.length, "padded", tr.padded_length)

# find an `add a3, a1, a2` row: ADD kind, rd=13(a3), rs1=11, rs2=12
kinds = tr.col("kind")
rd, rs1, rs2 = tr.col("rd"), tr.col("rs1"), tr.col("rs2")
from jolt_tpu.riscv import isa
add_kind = None
for j in range(tr.length):
    if rd[j] == 13 and rs1[j] == 11 and rs2[j] == 12 and \
       tr.columns["ram_addr_lo"][j] == 0 and tr.columns["ram_addr_hi"][j] == 0:
        add_kind = j
        break
assert add_kind is not None, "no add a3,a1,a2 row found"
j = add_kind
print("splicing duplicate of cycle", j, "kind", kinds[j])

# splice: duplicate row j; the duplicate's rd_pre = original rd_post
cols = {}
for name, arr in tr.columns.items():
    dup = arr[j:j+1].copy()
    cols[name] = np.concatenate([arr[:j+1], dup, arr[j+1:-1]])
# fix the duplicate's rd_pre to the post value (register-file consistent)
for suffix in ("_lo", "_hi"):
    cols["rd_pre" + suffix][j+1] = cols["rd_post" + suffix][j]
    # rs1/rs2 values unchanged (a1, a2 not written by the add)

forged = Trace(columns=cols, length=tr.length + 1,
               padded_length=tr.padded_length, device=tr.device,
               memory_layout=tr.memory_layout, code=tr.code,
               entry=tr.entry, program=tr.program)

honest_extract = RI.extract_r1cs_inputs

def forged_extract(trace, strict=True):
    inputs = honest_extract(trace, strict=False)
    # forge the next_* columns at the splice row j: claim fall-through
    # (pc+4, pc_idx+1) as the per-row constraints demand, even though the
    # actual next row repeats the same pc.
    inputs.lo[RI.V_NEXT_UNEXPANDED_PC][j] = inputs.lo[RI.V_UNEXPANDED_PC][j] + 4
    inputs.lo[RI.V_NEXT_PC][j] = inputs.lo[RI.V_PC][j] + 1
    bad = C.check_satisfied(inputs)
    print("unsatisfied constraints after forgery:", bad[:5])
    assert not bad, "forged witness does not satisfy R1CS; abort"
    return inputs

PROVER.extract_r1cs_inputs = forged_extract
proof = PROVER.prove(forged)
print("forged proof produced; verifying...")
io = PublicIO.from_trace(forged)
try:
    ok = verify(proof, io)
    print("VERIFY RESULT:", ok, "<-- SOUNDNESS BREAK if True")
except VerificationError as e:
    print("verifier rejected:", e)
