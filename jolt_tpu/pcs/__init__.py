from .hyperkzg import HyperKZG, HyperKZGProof, KZGSetup
