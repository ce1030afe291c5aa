import time, jax, jax.numpy as jnp, numpy as np
n = 1 << 18
W = 24 * (n // 16) * 7  # 7-step block, 2.75M rows
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, n, (W,), dtype=np.int32))
rows_sorted = jnp.sort(rows)

def t(name, fn, *a):
    o = fn(*a); s = int(jnp.max(o.reshape(-1)[::4097])); best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(*a); s = int(jnp.max(o.reshape(-1)[::4097]))
        best = min(best, time.perf_counter() - t0)
    gbl = o.nbytes / best / 2**30
    print(f"  {name}: {best*1e3:6.1f} ms ({gbl:5.1f} GB/s logical out)", flush=True)

tab44 = jnp.asarray(rng.integers(0, 1 << 12, (n + 1, 44), dtype=np.int32))
tab128 = jnp.pad(tab44, ((0, 0), (0, 84)))
tab8 = jax.lax.bitcast_convert_type(tab44, jnp.uint8).reshape(n + 1, 176)
tab8p = jnp.pad(tab8, ((0, 0), (0, 80)))  # 256-wide uint8
print(f"W = {W} rows")
t("int32 [N,44] rows", jax.jit(lambda r, p: p[r]), rows, tab44)
t("int32 [N,44] rows SORTED idx", jax.jit(lambda r, p: p[r]), rows_sorted, tab44)
t("int32 [N,128] rows", jax.jit(lambda r, p: p[r]), rows, tab128)
t("uint8 [N,176] rows", jax.jit(lambda r, p: p[r]), rows, tab8)
t("uint8 [N,256] rows", jax.jit(lambda r, p: p[r]), rows, tab8p)
t("uint8 [N,176] rows + bitcast", jax.jit(
    lambda r, p: jax.lax.bitcast_convert_type(p[r].reshape(-1, 44, 4), jnp.int32)),
  rows, tab8)
# half-width rows, two gathers (x table and y table separately)
tx, ty = tab44[:, :22], tab44[:, 22:]
t("2x int32 [N,22] rows", jax.jit(lambda r, a, b: jnp.concatenate([a[r], b[r]], 1)), rows, tx, ty)
