"""thaler_study_tpu — a TPU-native interactive-proof framework.

A from-scratch JAX/XLA/Pallas implementation of the protocol stack from Justin
Thaler's *Proofs, Arguments, and Zero-Knowledge*, with the capabilities of the
Rust reference `montekki/thaler-study`:

- ``fields``      prime-field arithmetic as limb-decomposed integer kernels
                  (ref: arkworks ``ark-ff`` Fp64/MontBackend dependency)
- ``mle``         multilinear-extension evaluation + dense MLE tables
                  (ref: multilinear-extensions/src/lib.rs, ark-poly DenseMultilinearExtension)
- ``sumcheck``    the core sumcheck Prover/Verifier state machines
                  (ref: sum-check-protocol/src/lib.rs)
- ``fiat_shamir`` the non-interactive transform with arkworks-compatible
                  serialization + SHA-256 hash-to-field
                  (ref: fiat-shamir/src/lib.rs)
- ``gkr``         layered arithmetic circuits + the GKR protocol
                  (ref: gkr-protocol/src/{lib,circuit,round_polynomial}.rs)
- ``protocols``   special-purpose IPs: matrix multiplication, triangle counting
                  (ref: matrix-multiplication/src/lib.rs, triangle-counting/src/lib.rs)
- ``pcs``         the relaxed polynomial commitment scheme
                  (ref: relaxed-pcs/src/lib.rs)
- ``ops``         the fused TPU round kernels (fold + partial sums, eq tables)
- ``parallel``    mesh sharding of the 2^n hypercube, psum round reductions
- ``utils``       field-op counters, profiling helpers
- ``runtime``     native C++ host runtime (circuit building, host field ops)

Unlike the reference (single-threaded Rust on CPU), the prover hot loops here
are data-parallel over the boolean hypercube: evaluation tables live on device
as uint32 limb arrays, per-round folds and partial sums are jitted/Pallas
kernels, and the table is shardable over a ``jax.sharding.Mesh`` with round
sums reduced via ``psum``.
"""

__version__ = "0.1.0"
