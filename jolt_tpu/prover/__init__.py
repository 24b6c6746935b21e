from .prover import JoltProof, prove
