import numpy as np, jax, jax.numpy as jnp, time
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.msm import msm_ctx, host_msm
ops = curve_ops(BLS12_381); ctx = msm_ctx(BLS12_381)
rng = np.random.default_rng(5)
n = 32768
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BLS12_381.g1] * n)))
pts = ops.to_affine(ops.scalar_mul(base, bits))
s2 = [(int(x) * 31415926535897932 + 1) % BLS12_381.fr.modulus
      for x in rng.integers(0, 1 << 63, n, dtype=np.uint64)]
got = ctx.msm_to_affine_int(pts, s2, kind="ints")   # c = 11 at this n
print("pallas_broken:", ctx._pallas_broken)
t0 = time.time()
want = host_msm(BLS12_381, ctx._points_to_host(pts), s2)
print(f"host pippenger: {time.time()-t0:.0f}s")
assert got == want, (got, want)
print("BLS TPU MSM @ n=32768 (scan grid > 1) matches host: OK")
