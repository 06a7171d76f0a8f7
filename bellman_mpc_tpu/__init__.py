"""bellman_mpc_tpu — a TPU-native Groth16 zk-SNARK framework with an MPC
trusted-setup ceremony.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
doubiliu/bellman-mpc (a fork of the Rust `bellman` zk-SNARK library extended
with a multi-party trusted-setup ceremony for Groth16).  The compute path —
limb-decomposed BLS12-381 field arithmetic, NTT, multi-scalar multiplication,
and the optimal-ate pairing — is built for the TPU's vector/matrix units and
scales over device meshes with `shard_map`; the circuit DSL, gadget library,
serialization and ceremony orchestration run on the host.
"""

__version__ = "0.1.0"
