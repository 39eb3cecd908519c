#!/usr/bin/env python
"""Quick host->HBM relay bandwidth probe (the rig's streaming bottleneck)."""
import time, json
import jax, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
d = jax.devices()[0]
out = {"device": str(d)}
for mb in (64, 256):
    x = np.ones((mb, 1024, 1024), np.int8)
    t0 = time.perf_counter()
    jax.device_put(x, d).block_until_ready()
    dt = time.perf_counter() - t0
    out[f"h2d_{mb}MB_s"] = round(dt, 3)
    out[f"bw_{mb}MB_GBps"] = round(mb / 1024 / dt, 3)
print(json.dumps(out), flush=True)
