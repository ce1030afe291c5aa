"""Minimal differential: one 16-step fused signed mixed-add kernel vs the
same adds as two 8-step kernels, identical inputs (BLS12-381, L=33)."""
import numpy as np, jax, jax.numpy as jnp
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.fields import limbs as limbs_mod
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.curve_pallas import (
    pallas_mixed_add_signed_multi, pallas_canon)
ops = curve_ops(BLS12_381); L = ops.L
p = BLS12_381.fp.modulus
rng = np.random.default_rng(11)
W = 6144
n = 4096
# realistic points: random multiples of g1
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BLS12_381.g1] * n)))
pts = np.asarray(ops.to_affine(ops.scalar_mul(base, bits)))  # [n, 2, L]
rows = rng.integers(0, n, (16, W)).astype(np.int32)
neg = rng.integers(0, 2, (16, W)).astype(np.int32)
gath = pts[rows]                                  # [16, W, 2, L]
pts_lm = jnp.asarray(np.transpose(gath, (0, 2, 3, 1)).reshape(32, L, W))
negj = jnp.asarray(neg)
acc0 = jnp.zeros((3, L, W), jnp.int32)
one = np.zeros((L, W), np.int32); one_l = limbs_mod.int_to_limbs(BLS12_381.fp.r, BLS12_381.fp)
acc0 = acc0.at[1].set(jnp.asarray(np.broadcast_to(np.asarray(one_l)[:, None], (L, W))))
k16 = pallas_mixed_add_signed_multi(BLS12_381, 512, 16)
k8 = pallas_mixed_add_signed_multi(BLS12_381, 512, 8)
canon = pallas_canon(BLS12_381.fp, 512)
o16 = jax.block_until_ready(canon(k16(acc0, pts_lm, negj)))
o8 = jax.block_until_ready(canon(k8(k8(acc0, pts_lm[:16], negj[:8]), pts_lm[16:], negj[8:])))
a = np.asarray(o16); b = np.asarray(o8)
def dec(arr):
    bm = np.transpose(arr, (2, 0, 1)).reshape(-1, L)
    return [v % p for v in limbs_mod.limbs_to_ints(bm)]
da, db = dec(a), dec(b)
bad = [i//3 for i, (x, y) in enumerate(zip(da, db)) if x != y]
bad = sorted(set(bad))
print("mismatching lanes:", len(bad), bad[:12])
