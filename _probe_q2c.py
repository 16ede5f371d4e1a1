import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from eigensolver_gpu_tpu.ops.sb2st import apply_q2, dense_to_band
from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas

n, b = 4096, 32
rng = np.random.default_rng(0)
t = rng.standard_normal((n, n)).astype(np.float32)
a = (t + t.T) / 2
mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
band = jnp.asarray(dense_to_band(jnp.asarray(a * mask, jnp.float32), b))
d, e, vt, taut = jax.jit(lambda bd: bulge_chase_pallas(bd, b))(band)
for m in (1024, 4096):
    y = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    for g, ts in ((32, "solve"), (32, "inv"), (64, "solve"), (64, "inv")):
        f = jax.jit(lambda vt, taut, y, g=g, ts=ts: jnp.sum(apply_q2(vt, taut, y, n, b, g=g, tsolve=ts)))
        t0 = time.perf_counter(); s1 = float(f(vt, taut, y)); tc = time.perf_counter()-t0
        tt = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f(vt, taut, y)); tt.append(time.perf_counter()-t0)
        print(f"m={m} g={g} tsolve={ts}: {min(tt)*1e3:.1f} ms (compile {tc:.1f}s) sum={s1:.3f}", flush=True)
