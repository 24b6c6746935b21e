from .verifier import VerificationError, verify
