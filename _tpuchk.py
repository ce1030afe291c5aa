import numpy as np, jax.numpy as jnp
from algoplonk_tpu.fields.params import BN254
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.msm import msm_ctx, host_msm
from algoplonk_tpu.ops.field import field_ops
from algoplonk_tpu.fields import limbs as limbs_mod
ops = curve_ops(BN254); ctx = msm_ctx(BN254)
rng = np.random.default_rng(7)
n = 4096
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BN254.g1] * n)))
pts_dev = ops.to_affine(ops.scalar_mul(base, bits))
pts_host = ctx._points_to_host(pts_dev)
s2 = [(int(x) * 1234567891011121314 + 7) % BN254.fr.modulus
      for x in rng.integers(0, 1 << 63, n, dtype=np.uint64)]
s2[0] = 0; s2[1] = BN254.fr.modulus - 1
want = host_msm(BN254, pts_host, s2)
# path 1: ints
got = ctx.msm_to_affine_int(pts_dev, s2, kind="ints")
assert got == want, ("ints", got, want)
# path 2: mont limbs (digits computed inside the jitted piece)
fr = field_ops(BN254.fr)
mont = jnp.asarray(limbs_mod.ints_to_mont_limbs(s2, BN254.fr))
got2 = ctx.msm_to_affine_int(pts_dev, mont, kind="mont")
assert got2 == want, ("mont", got2, want)
print("TPU MSM (packed sort + 2c-gather + fused piece) matches host: OK")
