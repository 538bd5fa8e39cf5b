"""porla_tpu — a TPU-native dynamic Proof-of-Retrievability framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
vt-asaplab/porla (NDSS'23): hierarchical-log dynamic PoR with homomorphic
MACs, NTT (ICC) erasure encoding, Pedersen/IPA and KZG commitment schemes.

See DESIGN.md for the architecture.
"""

__version__ = "0.1.0"
