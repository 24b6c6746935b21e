"""jolt_tpu — a TPU-native Jolt zkVM proving stack (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of a16z/jolt
(reference mounted read-only at /root/reference), designed TPU-first:

  * field/      BN254 Fr/Fq limb arithmetic as vectorized uint32 VPU kernels
  * transcript/ bit-exact Blake2b-256 Fiat-Shamir transcript (host)
  * poly/       multilinear polynomials, eq tables, binding
  * sumcheck/   batched sumcheck engine (device round kernels, host transcript)
  * riscv/      RV64IMAC emulator + assembler (host witness producer)
  * tracer/     execution trace SoA format (the witness interface)
  * curve/      BN254 G1 arithmetic + Pippenger MSM
  * pcs/        polynomial commitment schemes (Dory production path)
  * witness/ r1cs/ relations/ prover/ verifier/  — the Jolt protocol proper
  * parallel/   mesh + sharding helpers (pjit/shard_map over the cycle axis)
"""

__version__ = "0.1.0"
