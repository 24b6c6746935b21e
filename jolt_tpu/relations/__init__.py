from .spartan_outer import SpartanOuterProver, SpartanOuterVerifier
