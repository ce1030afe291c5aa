import numpy as np, jax, jax.numpy as jnp
from algoplonk_tpu.fields.params import BLS12_381
from algoplonk_tpu.fields import limbs as limbs_mod
from algoplonk_tpu.ops.curve import curve_ops
from algoplonk_tpu.ops.msm import window_sums_scan, scalar_digits, num_windows
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

def vals_mod_p(arr):
    a = np.asarray(arr)
    flat = a.reshape(-1, a.shape[-1]) if a.shape[-1] == L else None
    # limbs axis may be in the middle (limbs-major [.., L, W]): normalize
    return None

for ph in ["p1", "p2", "p3", None]:
    outs = {}
    for up in (True, False):
        fn = jax.jit(lambda P, D, _ph=ph, _up=up: window_sums_scan(
            ops, P, D, c, 16, _up, stop_after=_ph))
        outs[up] = np.asarray(jax.block_until_ready(fn(pts_pad, digs)))
    a, b = outs[True], outs[False]
    # limbs-major [3, L, W] or [nw, 3, L]; compare element VALUES mod p
    def decode(arr):
        if arr.ndim == 3 and arr.shape[1] == L:   # [R, L, W] limbs-major
            bm = np.transpose(arr, (0, 2, 1)).reshape(-1, L)
        else:
            bm = arr.reshape(-1, L)
        ints = limbs_mod.limbs_to_ints(bm)
        return [v % p for v in ints]
    da, db = decode(a), decode(b)
    bad = sum(1 for x, y in zip(da, db) if x != y)
    print(f"phase {ph}: shapes {a.shape} vs {b.shape}, mismatches {bad}/{len(da)}", flush=True)
