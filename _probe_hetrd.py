import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax import lax

m = 4096
mr = jax.random.normal(jax.random.PRNGKey(0), (m, m), jnp.float32)
mi = jax.random.normal(jax.random.PRNGKey(1), (m, m), jnp.float32)
m2 = jnp.concatenate([mr, mi], 0)  # (2m, m)
xr = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float32)
xi = jax.random.normal(jax.random.PRNGKey(3), (m,), jnp.float32)

def timeit(name, f, *args, iters=64):
    def chained(*a):
        def body(c, _):
            out = f(a[0], a[1], a[2] + c * 1e-30, a[3])
            return jnp.sum(jnp.abs(out[0])) * 1e-30, ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    g = jax.jit(chained)
    np.asarray(g(*args))
    t0 = time.perf_counter(); np.asarray(g(*args)); t1 = time.perf_counter()
    print(f"{name}: {(t1-t0)/iters*1e3:.3f} ms/col", flush=True)

with jax.default_matmul_precision("highest"):
    def four_gemv(mr, mi, xr, xi):
        return mr @ xr - mi @ xi, mr @ xi + mi @ xr
    timeit("4 gemvs          ", four_gemv, mr, mi, xr, xi)

    def stacked128(m2, _, xr, xi):
        rhs = jnp.zeros((m, 128), jnp.float32)
        rhs = rhs.at[:, 0].set(xr).at[:, 1].set(xi)
        y = m2 @ rhs  # (2m, 128)
        pr = y[:m, 0] - y[m:, 1]
        pi = y[:m, 1] + y[m:, 0]
        return pr, pi
    timeit("stacked (m,128)  ", stacked128, m2, mi, xr, xi)

    def stacked8(m2, _, xr, xi):
        rhs = jnp.zeros((m, 8), jnp.float32)
        rhs = rhs.at[:, 0].set(xr).at[:, 1].set(xi)
        y = m2 @ rhs
        pr = y[:m, 0] - y[m:, 1]
        pi = y[:m, 1] + y[m:, 0]
        return pr, pi
    timeit("stacked (m,8)    ", stacked8, m2, mi, xr, xi)
