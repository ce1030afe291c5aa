import time, jax, jax.numpy as jnp, numpy as np
n = 1 << 17
W = 24 * (n // 16) * 7
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, n, (W,), dtype=np.int32))
tab = jnp.asarray(rng.integers(0, 100, (n + 1, 44), dtype=np.int32))
def t(name, fn):
    o = fn(rows, tab); s = int(jnp.max(o.reshape(-1)[::4097])); best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(rows, tab); s = int(jnp.max(o.reshape(-1)[::4097]))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name}: {best*1e3:6.1f} ms ({W/best/1e6:4.0f} M rows/s)", flush=True)
t("clip (default)", jax.jit(lambda r, p: p[r]))
t("promise_in_bounds", jax.jit(lambda r, p: p.at[r].get(mode="promise_in_bounds")))
t("fill", jax.jit(lambda r, p: p.at[r].get(mode="fill", fill_value=0)))
t("unique=False sorted=True", jax.jit(lambda r, p: jnp.take(p, r, axis=0, indices_are_sorted=True)))
