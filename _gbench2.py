import time, jax, jax.numpy as jnp, numpy as np
n = 1 << 17
W = 24 * (n // 16) * 7
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(0, n, (W,), dtype=np.int32))

def t(name, fn, *a):
    o = fn(*a); s = int(jnp.max(o.reshape(-1)[::4097].astype(jnp.int32))); best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = fn(*a); s = int(jnp.max(o.reshape(-1)[::4097].astype(jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name}: {best*1e3:6.1f} ms ({W/best/1e6:5.0f} M rows/s)", flush=True)

for wdt, dt in [(44, np.int32), (64, np.int32), (128, np.int32), (256, np.int32),
                (176, np.uint8), (256, np.uint8), (512, np.uint8)]:
    tab = jnp.asarray(rng.integers(0, 100, (n + 1, wdt), dtype=dt))
    t(f"{np.dtype(dt).name} [N,{wdt}]", jax.jit(lambda r, p: p[r]), rows, tab)

# sort cost, forced
nw = 24
digs = jnp.asarray(rng.integers(-1024, 1025, (nw, n), dtype=np.int32))
payload = jnp.asarray(rng.integers(0, n, (nw, n), dtype=np.int32))
def srt(d, p):
    sm, pk = jax.lax.sort((jnp.abs(d), p), dimension=1, num_keys=1)
    return sm[:, ::37] + pk[:, ::37]
t("lax.sort [24, 2^17] (forced)", jax.jit(srt), digs, payload)
