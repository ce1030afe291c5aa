"""Multi-chip NTT: four-step decomposition with all-to-all stage exchange.

Sharding story (SURVEY.md section 2c "NTT stage parallelism"): a size
n = n1 * n2 transform is a [n2, n1] matrix problem —

  1. local NTT_n1 along rows (each chip owns n2/D rows, full rows local),
  2. pointwise twiddle multiply by w_n^{j2*k1} (local),
  3. all-to-all transpose over ICI -> [n1, n2] sharded on n1,
  4. local NTT_n2 along rows,
  5. all-to-all transpose back to natural output sharding.

Everything between collectives is the single-chip batched butterfly kernel
(ops/ntt.py) vmapped over local rows, so per-chip work stays on the VPU and
the only communication is the two transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.params import CURVES, domain_generator
from ..fields import limbs as limbs_mod
from ..ops.field import field_ops
from ..ops.ntt import ntt_plan


def sharded_ntt_fn(curve_name: str, mesh: Mesh, axis: str, log_n: int,
                   inverse: bool = False, coset_shift: int | None = None):
    """Build a jitted sharded (i)NTT of size 2^log_n over the mesh axis.

    Input/output: [n2, n1, L] limb array sharded on dim 0; input is the
    coefficient vector x laid out as x[j1*n2 + j2] = in[j2, j1]; output is
    evaluations X[k2*n1 + k1] = out[k2, k1] (same natural-order convention).

    ``inverse``: run the inverse transform (inverse twiddles on both local
    stages and on the cross factors; the 1/n1 and 1/n2 scalings of the
    local plans compose to the full 1/n).  ``coset_shift`` g: forward
    evaluates on the coset gH (coefficients pre-scaled by g^j); inverse
    interpolates from gH (outputs post-scaled by g^-j).  These are the
    variants the prover's quotient phase needs (plonk/prove.py round 3)."""
    curve = CURVES[curve_name]
    f = field_ops(curve.fr)
    r = curve.fr.modulus
    n = 1 << log_n
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    ndev = mesh.shape[axis]
    assert n2 % ndev == 0 and n1 % ndev == 0

    plan1 = ntt_plan(curve_name, log_n1)
    plan2 = ntt_plan(curve_name, log_n2)
    w = domain_generator(curve_name, log_n)
    w_eff = pow(w, -1, r) if inverse else w
    # cross twiddles T[j2, k1] = w_eff^(j2*k1)
    tw = [[pow(w_eff, j2 * k1, r) for k1 in range(n1)] for j2 in range(n2)]
    tw_flat = limbs_mod.ints_to_mont_limbs(
        [v for row in tw for v in row], curve.fr
    )
    tw_dev = jnp.asarray(tw_flat).reshape(n2, n1, f.L)

    # coset pre/post scale.  Forward: input position [j2, j1] holds
    # coefficient j1*n2 + j2.  Inverse: OUTPUT position [k2, k1] holds
    # coefficient k2*n1 + k1 (the four-step's transposed output layout),
    # so the g^-k exponents follow that convention instead.
    cs_dev = None
    if coset_shift is not None:
        g = pow(coset_shift, -1, r) if inverse else coset_shift
        if inverse:
            cs = [
                [pow(g, k2 * n1 + k1, r) for k1 in range(n1)]
                for k2 in range(n2)
            ]
        else:
            cs = [
                [pow(g, j1 * n2 + j2, r) for j1 in range(n1)]
                for j2 in range(n2)
            ]
        cs_dev = jnp.asarray(
            limbs_mod.ints_to_mont_limbs(
                [v for row in cs for v in row], curve.fr
            )
        ).reshape(n2, n1, f.L)

    batched_ntt1 = jax.vmap(lambda v: plan1._transform(v, inverse))
    batched_ntt2 = jax.vmap(lambda v: plan2._transform(v, inverse))

    def step(x_local, tw_local, cs_local):
        # x_local: [n2/D, n1, L]
        if cs_local is not None and not inverse:
            x_local = f.mul(x_local, cs_local)
        y = batched_ntt1(x_local)                   # NTT over j1 per row
        y = f.mul(y, tw_local)                      # cross twiddles
        # transpose [n2, n1] -> [n1, n2]: split columns into D chunks,
        # all_to_all, then stitch
        d = ndev
        loc2, _ = y.shape[0], y.shape[1]
        y = y.reshape(loc2, d, n1 // d, f.L)        # [n2/D, D, n1/D, L]
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=0, tiled=False)
        # now [D, n2/D, n1/D, L] with leading D = source shards
        y = jnp.transpose(y, (2, 0, 1, 3)).reshape(n1 // d, n2, f.L)
        z = batched_ntt2(y)                         # NTT over j2 per row
        # transpose back to [n2 shard, n1]
        z = z.reshape(n1 // d, d, n2 // d, f.L)
        z = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=0, tiled=False)
        z = jnp.transpose(z, (2, 0, 1, 3)).reshape(n2 // d, n1, f.L)
        if cs_local is not None and inverse:
            z = f.mul(z, cs_local)
        return z

    if cs_dev is None:
        smapped = jax.shard_map(
            lambda x, tw: step(x, tw, None),
            mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis),
            check_vma=False,
        )

        def run(x_mat):
            return smapped(x_mat, tw_dev)
    else:
        smapped = jax.shard_map(
            step,
            mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False,
        )

        def run(x_mat):
            return smapped(x_mat, tw_dev, cs_dev)

    return jax.jit(run), (n1, n2)


def reference_layout(coeffs_ints, n1: int, n2: int):
    """Host helper: x[j] -> matrix[j2, j1] layout used by sharded_ntt_fn."""
    import numpy as np

    arr = np.asarray(coeffs_ints, dtype=object).reshape(n1, n2)  # [j1, j2]
    return arr.T  # [j2, j1]


def output_to_natural(out_mat):
    """[k2, k1] matrix -> flat evaluations X[k2*n1+k1]... already row-major."""
    return out_mat.reshape(-1, out_mat.shape[-1])
