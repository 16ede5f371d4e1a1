import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from eigensolver_gpu_tpu.ops.planar import ptrinv_lower, pmatmul, ptrsm_left_lower_inv, pcholesky_lower

n = 4096
t = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
ti = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
l = (jnp.tril(t) + n * jnp.eye(n, dtype=jnp.float32), jnp.tril(ti, -1))
b = (jax.random.normal(jax.random.PRNGKey(2), (n, n), jnp.float32),
     jax.random.normal(jax.random.PRNGKey(3), (n, n), jnp.float32))

def timeit(name, f, *args, rep=3):
    gs = jax.jit(lambda *z: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(f(*z))))
    t0 = time.perf_counter(); np.asarray(gs(*args)); tc = time.perf_counter()-t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter(); np.asarray(gs(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms (compile {tc:.1f}s)", flush=True)

timeit("ptrinv_lower n=4096", lambda l0, l1: ptrinv_lower((l0, l1), base=128), *l)
timeit("pmatmul apply", lambda l0, l1, b0, b1: pmatmul((l0, l1), (b0, b1)), *l, *b)
timeit("ptrsm_inv_diag", lambda l0, l1, b0, b1: ptrsm_left_lower_inv((l0, l1), (b0, b1), nb=128), *l, *b)
timeit("inv+3 applies", lambda l0, l1, b0, b1: (lambda iv: pmatmul(iv, pmatmul(iv, pmatmul(iv, (b0, b1)))))(ptrinv_lower((l0, l1), base=128)), *l, *b)
