"""Differential with the gather STAGED INSIDE the jit (as in the pipeline),
plus infinity rows and signed-zero digits."""
import numpy as np, jax, jax.numpy as jnp
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.fields import limbs as limbs_mod
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.curve_pallas import (
    pallas_mixed_add_signed_multi, pallas_canon)
from algoplonk_tpu.ops.msm import SIGN_SHIFT
ops = curve_ops(BLS12_381); L = ops.L
p = BLS12_381.fp.modulus
rng = np.random.default_rng(11)
W = 6144
n = 4096
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BLS12_381.g1] * n)))
pts = ops.to_affine(ops.scalar_mul(base, bits))       # [n, 2, L] device
pts_pad = jnp.concatenate([pts, jnp.zeros((1, 2, L), jnp.int32)], 0)
pts_flat = pts_pad.reshape(n + 1, 2 * L)
rows = rng.integers(0, n + 1, (16, W)).astype(np.int32)   # incl. inf row
neg = rng.integers(0, 2, (16, W)).astype(np.int32)
packed = jnp.asarray(rows | (neg << SIGN_SHIFT))
one_l = limbs_mod.int_to_limbs(BLS12_381.fp.r, BLS12_381.fp)
acc0 = jnp.zeros((3, L, W), jnp.int32).at[1].set(
    jnp.asarray(np.broadcast_to(np.asarray(one_l)[:, None], (L, W))))
k16 = pallas_mixed_add_signed_multi(BLS12_381, 512, 16)
k8 = pallas_mixed_add_signed_multi(BLS12_381, 512, 8)
canon = pallas_canon(BLS12_381.fp, 512)

def stage(pf, pk, g0, g1):
    pk = pk[g0:g1]
    g = g1 - g0
    r = (pk & ((1 << SIGN_SHIFT) - 1)).reshape(-1)
    t = pf[r].T.reshape(2, L, g, W)
    ptsx = jnp.transpose(t, (2, 0, 1, 3)).reshape(2 * g, L, W)
    ng = ((pk >> SIGN_SHIFT) == 1).astype(jnp.int32)
    return ptsx, ng

@jax.jit
def run16(pf, pk, a):
    px, ng = stage(pf, pk, 0, 16)
    return canon(k16(a, px, ng))

@jax.jit
def run8x2(pf, pk, a):
    px, ng = stage(pf, pk, 0, 8)
    a = k8(a, px, ng)
    px, ng = stage(pf, pk, 8, 16)
    return canon(k8(a, px, ng))

a = np.asarray(jax.block_until_ready(run16(pts_flat, packed, acc0)))
b = np.asarray(jax.block_until_ready(run8x2(pts_flat, packed, acc0)))
def dec(arr):
    bm = np.transpose(arr, (2, 0, 1)).reshape(-1, L)
    return [v % p for v in limbs_mod.limbs_to_ints(bm)]
da, db = dec(a), dec(b)
bad = sorted(set(i // 3 for i, (x, y) in enumerate(zip(da, db)) if x != y))
print("mismatching lanes:", len(bad), bad[:12])
