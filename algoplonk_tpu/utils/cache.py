"""Compiled-circuit checkpointing (reference utils/utils.go:89-157).

Persists {ccs, pk, vk, curve} so expensive compile+setup runs once per
circuit.  The reference gob-encodes gnark objects; here device arrays go
into an .npz archive and the host-side structures into a pickle — both in
one file.  This is a trusted local cache (same threat model as the
reference's gob files).
"""

from __future__ import annotations

import io
import os
import pickle

import numpy as np


def serialize_compiled_circuit(cc) -> bytes:
    import jax.numpy as jnp  # noqa: F401

    pk = cc.pk
    arrays = {
        name: np.asarray(getattr(pk, name))
        for name in (
            "qk_ev",
            "s1_ev", "s2_ev", "s3_ev",
            "ql_c", "qr_c", "qm_c", "qo_c", "qk_c",
            "s1_c", "s2_c", "s3_c", "srs_g1",
        )
    }
    for i, a in enumerate(pk.qcp_ev):
        arrays[f"qcp_ev_{i}"] = np.asarray(a)
    for i, a in enumerate(pk.qcp_c):
        arrays[f"qcp_c_{i}"] = np.asarray(a)
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    meta = {
        "curve": cc.curve.name,
        "ccs": cc.ccs,
        "vk": cc.vk,
        "pk_scalars": {
            "n": pk.n, "log_n": pk.log_n, "omega": pk.omega,
            "coset_shift": pk.coset_shift, "nb_public": pk.nb_public,
            "n_qcp": len(pk.qcp_ev),
        },
    }
    return pickle.dumps({"meta": meta, "arrays": buf.getvalue()})


def deserialize_compiled_circuit(data: bytes):
    import jax.numpy as jnp

    from .. import CompiledCircuit
    from ..fields.params import CURVES
    from ..plonk.keys import ProvingKey

    blob = pickle.loads(data)
    meta = blob["meta"]
    z = np.load(io.BytesIO(blob["arrays"]))
    curve = CURVES[meta["curve"]]
    s = meta["pk_scalars"]
    arr = {k: jnp.asarray(z[k]) for k in z.files}
    pk = ProvingKey(
        curve=curve,
        n=s["n"], log_n=s["log_n"], omega=s["omega"],
        coset_shift=s["coset_shift"], nb_public=s["nb_public"],
        qk_ev=arr["qk_ev"],
        s1_ev=arr["s1_ev"], s2_ev=arr["s2_ev"], s3_ev=arr["s3_ev"],
        ql_c=arr["ql_c"], qr_c=arr["qr_c"], qm_c=arr["qm_c"],
        qo_c=arr["qo_c"], qk_c=arr["qk_c"],
        s1_c=arr["s1_c"], s2_c=arr["s2_c"], s3_c=arr["s3_c"],
        srs_g1=arr["srs_g1"],
        qcp_ev=[arr[f"qcp_ev_{i}"] for i in range(s["n_qcp"])],
        qcp_c=[arr[f"qcp_c_{i}"] for i in range(s["n_qcp"])],
        vk=meta["vk"],
    )
    return CompiledCircuit(ccs=meta["ccs"], pk=pk, vk=meta["vk"], curve=curve)


def write_compiled_circuit(cc, path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(serialize_compiled_circuit(cc))


def read_compiled_circuit(path: str):
    with open(path, "rb") as fh:
        return deserialize_compiled_circuit(fh.read())
