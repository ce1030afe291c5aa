import numpy as np, jax, jax.numpy as jnp
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.msm import msm_ctx, host_msm
ops = curve_ops(BLS12_381); ctx = msm_ctx(BLS12_381)
rng = np.random.default_rng(3)
n = 4096
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BLS12_381.g1] * n)))
pts = ops.to_affine(ops.scalar_mul(base, bits))
s2 = [(int(x) * 987654321987654321 + 3) % BLS12_381.fr.modulus
      for x in rng.integers(0, 1 << 63, n, dtype=np.uint64)]
got = ctx.msm_to_affine_int(pts, s2, kind="ints")
want = host_msm(BLS12_381, ctx._points_to_host(pts), s2)
print("pallas_broken:", ctx._pallas_broken)
assert got == want, (got, want)
print("BLS TPU MSM matches host: OK")
