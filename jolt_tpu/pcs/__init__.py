from .hyperkzg import HyperKZG, HyperKZGProof, KZGSetup
from .dory import Dory, DoryCommitment, DoryProof, DorySetup
from .scheme import DoryScheme, HyperKZGScheme, make_scheme
