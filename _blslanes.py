import numpy as np, jax, jax.numpy as jnp
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.fields import limbs as limbs_mod
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.msm import window_sums_scan, scalar_digits
ops = curve_ops(BLS12_381); L = ops.L
p = BLS12_381.fp.modulus
rng = np.random.default_rng(3)
n = 4096
c = 11
scalars = [int(x) for x in rng.integers(1, 1 << 62, n)]
bits = ops.scalar_bits_array(scalars, nbits=64)
base = jnp.asarray(np.asarray(ops.encode_affine([BLS12_381.g1] * n)))
pts = ops.to_affine(ops.scalar_mul(base, bits))
s2 = [(int(x) * 987654321987654321 + 3) % BLS12_381.fr.modulus
      for x in rng.integers(0, 1 << 63, n, dtype=np.uint64)]
digs = jnp.asarray(scalar_digits(s2, c=c))
pts_pad = jnp.concatenate([pts, jnp.zeros((1, 2, L), jnp.int32)], 0)
outs = {}
for up in (True, False):
    fn = jax.jit(lambda P, D, _up=up: window_sums_scan(
        ops, P, D, c, 16, _up, stop_after="p1"))
    outs[up] = np.asarray(jax.block_until_ready(fn(pts_pad, digs)))
def decode_lanes(arr):
    # [3, L, W] -> per-lane (x, y, z) mod p
    W = arr.shape[2]
    bm = np.transpose(arr, (2, 0, 1)).reshape(-1, L)
    ints = limbs_mod.limbs_to_ints(bm)
    return np.array([v % p for v in ints], dtype=object).reshape(W, 3)
da = decode_lanes(outs[True]); db = decode_lanes(outs[False])
bad = [i for i in range(da.shape[0]) if not all(da[i][j] == db[i][j] for j in range(3))]
print("bad lanes:", len(bad))
print("first 30:", bad[:30])
print("mod 512:", sorted(set(b % 512 for b in bad))[:20])
print("mod 128:", sorted(set(b % 128 for b in bad))[:20])
print("blocks (lane%256):", sorted(set(b % 256 for b in bad))[:20])
