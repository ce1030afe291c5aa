"""Batch proving: N independent proofs data-parallel over the device mesh.

The reference proves one proof at a time in one process (SURVEY.md section 2c:
batch proving listed as the data-parallelism axis the TPU build adds).  Here
each proof is an independent prover pipeline — device kernels interleaved
with host Fiat-Shamir — so the natural batch axis is *whole proofs over
devices*: proof i runs with its default device pinned to devices[i % D],
one host thread per device driving its chip.  Kernel arrays are created
uncommitted, so XLA transfers the shared proving key to each chip once and
caches per-device executables.

For same-circuit batches this gives near-linear throughput scaling until the
host witness-solving thread saturates (witness solving stays host-side by
design — SURVEY.md section 7 hard part #5).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def prove_batch(cc, assignments, devices=None, self_verify: bool = True,
                rng=None):
    """Prove every assignment against one CompiledCircuit, round-robined
    over ``devices`` (default: all of jax.devices()).

    Returns a list of VerifiedProof in assignment order.  ``rng`` follows
    Prover semantics (None = secrets blinding, False = no blinding —
    deterministic proofs byte-identical to the sequential prover).
    """
    import jax

    from .. import VerifiedProof
    from ..frontend import witness as witness_mod
    from ..plonk import verify as verify_mod
    from ..plonk.prove import Prover

    if devices is None:
        devices = jax.devices()
    devices = list(devices)

    def one(item):
        i, assignment = item
        dev = devices[i % len(devices)]
        with jax.default_device(dev):
            prover = Prover(cc.pk, cc.ccs, rng=rng)
            wit = witness_mod.solve(
                cc.ccs, assignment, commitment_solver=prover.bsb_solver
            )
            proof = prover.prove(wit)
            if self_verify and not verify_mod.verify(
                cc.vk, proof, wit.public_values
            ):
                raise RuntimeError(f"proof {i} failed native verification")
            return VerifiedProof(proof, wit, cc.curve)

    n_workers = min(len(devices), max(len(assignments), 1))
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        return list(ex.map(one, enumerate(assignments)))
