"""The backend seam: runtime-swappable kernel slots.

TPU analog of the reference's `jolt-kernels` backend registry
(`/root/reference/crates/jolt-kernels/src/lib.rs:1-36`,
`src/backend.rs`): every transcript-free heavy-compute unit of the
prover is a named SLOT whose implementation can be swapped at runtime --
"swap/mix/compare = value construction".  The governing contract is
invariant 8 of `specs/clean-slate-prover.md:226-233`: **proof bytes are
backend-invariant** -- any mix of slot implementations/tiers must emit
the identical transcript, so mixing CPU and device tiers per-slot is
always legal.  `tests/test_backend_registry.py` enforces it.

Mapping to the reference's 29 `src/reference/` slot modules: each entry
records which class (or which stage of our restructured DAG) carries the
function.  Our DAG folds several reference claim-reduction slots into
the grouped stage-7/8 instances and the ra-virtualization stage --
those rows point at the carrying slot rather than a standalone class.

Tier selection: every relation class here ships BOTH a host-engine
round loop and the scan-fused device path (ScanFusedInstance); the
per-slot `tier` override forces a slot's instances onto the host engine
(any forced instance makes its whole batched stage fall back -- the
device transcript fuses a stage, so per-slot granularity within a stage
means per-stage fallback, same proof bytes by the invariant).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional


def _lazy(path: str) -> Callable:
    """Import-on-first-use factory for 'module:Class' targets."""
    def make(*args, **kwargs):
        import importlib
        mod_name, cls_name = path.split(":")
        mod = importlib.import_module(f"jolt_tpu.{mod_name}")
        return getattr(mod, cls_name)(*args, **kwargs)
    make.target = path
    return make


#: slot -> (reference module under jolt-kernels/src/reference/,
#:          our implementation: a 'module:Class' target, or a note naming
#:          the slot/stage that carries the function in this DAG)
SLOTS: Dict[str, tuple] = {
    "spartan_outer": ("spartan_outer.rs",
                      "relations.spartan_outer:SpartanOuterProver"),
    "spartan_product": ("spartan_product.rs",
                        "folded: the 3 product rows prove inside stage-1 "
                        "uni-skip (relations/spartan_outer.py)"),
    "spartan_shift": ("spartan_shift.rs", "relations.shift:ShiftSumcheck"),
    "instruction_read_raf": (
        "instruction_read_raf.rs",
        "relations.instruction_read_raf:InstructionReadRaf"),
    "instruction_ra_virtualization": (
        "instruction_ra_virtualization.rs",
        "folded: lk_ra chunks commit directly at log_k_chunk=8; products "
        "prove inside InstructionReadRaf's address phase"),
    "instruction_input": ("instruction_input.rs",
                          "folded: operand columns open as stage-1 R1CS "
                          "inputs (witness/r1cs_inputs.py)"),
    "instruction_claim_reduction": (
        "instruction_claim_reduction.rs",
        "folded: stage-8 (K, point) grouped opening reduction"),
    "ram_read_write": ("ram_read_write.rs",
                       "relations.ram_sparse:SparseRamReadWriteChecking"),
    "ram_val_check": ("ram_val_check.rs",
                      "relations.ram_sparse:SparseRamValEvaluation"),
    "ram_raf_evaluation": ("ram_raf_evaluation.rs",
                           "relations.ram_sparse:SparseRamRafEvaluation"),
    "ram_output_check": ("ram_output_check.rs",
                         "relations.ram_sparse:SparseRamOutputCheck"),
    "ram_ra_virtualization": ("ram_ra_virtualization.rs",
                              "relations.ra_virtual:RaVirtual"),
    "ram_ra_claim_reduction": (
        "ram_ra_claim_reduction.rs",
        "folded: stage-6v ra-virtualization + stage-8 grouping"),
    "ram_hamming_booleanity": (
        "ram_hamming_booleanity.rs",
        "relations.grouped_onehot:GroupedOneHot"),
    "registers_read_write": (
        "registers_read_write.rs",
        "relations.ram_sparse:SparseRegistersReadWriteChecking"),
    "registers_val_evaluation": (
        "registers_val_evaluation.rs",
        "relations.ram_sparse:SparseRegistersValEvaluation"),
    "registers_claim_reduction": (
        "registers_claim_reduction.rs",
        "folded: register raf instances batch into stage 6 "
        "(prover.py stage6) + stage-8 grouping"),
    "bytecode_read_raf": ("bytecode_read_raf.rs",
                          "relations.ram_sparse:SparseOneHotTableEval"),
    "bytecode_claim_reduction": (
        "bytecode_claim_reduction.rs",
        "folded: bytecode ra virtualization (stage 6v) + stage-8"),
    "booleanity": ("booleanity.rs", "relations.grouped_onehot:GroupedOneHot"),
    "hamming_weight_claim_reduction": (
        "hamming_weight_claim_reduction.rs",
        "relations.grouped_onehot:GroupedOneHot"),
    "inc_claim_reduction": ("inc_claim_reduction.rs",
                            "relations.opening_reduction:DenseOpening"),
    "advice_claim_reduction": (
        "advice_claim_reduction.rs",
        "folded: subcube-aligned advice selector split (prover.py "
        "advice_openings) + stage-8 DenseOpening"),
    "program_image_claim_reduction": (
        "program_image_claim_reduction.rs",
        "relations.program_image:ProgramImageReduction"),
    "precommitted_reduction": (
        "precommitted_reduction.rs",
        "relations.program_image:ProgramImageReduction"),
    "commitment": ("commitment.rs", "pcs.scheme:DoryScheme"),
    "opening": ("opening.rs",
                "relations.opening_reduction:SparseOneHotOpening"),
    "naive": ("naive.rs", "claims.naive:NaiveExprProver"),
}

#: slots that resolve to an instantiable class (the rest are folded into
#: a carrying slot, documented above)
_CLASS_SLOTS = {k: v[1] for k, v in SLOTS.items()
                if ":" in v[1] and " " not in v[1]}


@dataclasses.dataclass
class JoltBackend:
    """Per-slot factory table + tier overrides.

    `make(slot, *args)` constructs the slot's prover instance; replacing
    a factory (`with_slot`) or forcing a tier (`with_tier(slot, 'host')`)
    must not change proof bytes (invariant 8)."""

    factories: Dict[str, Callable]
    tiers: Dict[str, str] = dataclasses.field(default_factory=dict)

    @classmethod
    def default(cls) -> "JoltBackend":
        b = cls({name: _lazy(t) for name, t in _CLASS_SLOTS.items()})
        # env override: JOLT_TPU_BACKEND_TIER="slot:host,slot2:host"
        spec = os.environ.get("JOLT_TPU_BACKEND_TIER", "")
        for part in spec.split(","):
            if ":" in part:
                slot, tier = part.split(":", 1)
                b.tiers[slot.strip()] = tier.strip()
        return b

    def with_slot(self, slot: str, factory: Callable) -> "JoltBackend":
        f = dict(self.factories)
        f[slot] = factory
        return JoltBackend(f, dict(self.tiers))

    def with_tier(self, slot: str, tier: str) -> "JoltBackend":
        t = dict(self.tiers)
        t[slot] = tier
        return JoltBackend(dict(self.factories), t)

    def make(self, slot: str, *args, **kwargs):
        inst = self.factories[slot](*args, **kwargs)
        if self.tiers.get(slot) == "host":
            # any host-forced instance drops its whole batched stage to
            # the host engine (sumcheck/scan._supports_scan)
            inst.force_host = True
        return inst


_BACKEND: Optional[JoltBackend] = None


def get_backend() -> JoltBackend:
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = JoltBackend.default()
    return _BACKEND


def set_backend(backend: Optional[JoltBackend]) -> None:
    """Install a backend (None resets to default on next use)."""
    global _BACKEND
    _BACKEND = backend


def default_backend() -> JoltBackend:
    return JoltBackend.default()
