"""Microbenchmark XLA gather formulations on the TPU chip.

The epipolar stereo kernel is gather-bound (BASELINE.md: ~8 ns/lookup
measured round 2).  This probe measures the achievable lookup rate for
the candidate formulations so the kernel design is driven by data:
  flat-take           1D take from the flattened image (current kernel)
  flat-take-sorted    same indices, sorted (locality)
  take-rows           per-row x-gather (take_along_axis on axis 1)
  u8-quad             one 32-bit word fetches a 2x2 corner block
  onehot-matmul       gather expressed as MXU matmul against one-hot rows
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)

H, W = 270, 480
HW = H * W
N = 36 * HW          # lookups per stereo pass (S+4 planes)

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
imgu32 = (img.astype(jnp.uint32)
          | (jnp.roll(img, -1, 1).astype(jnp.uint32) << 8)
          | (jnp.roll(img, -1, 0).astype(jnp.uint32) << 16)
          | (jnp.roll(jnp.roll(img, -1, 0), -1, 1).astype(jnp.uint32) << 24))
idx = jax.random.randint(key, (N,), 0, HW)
idx_sorted = jnp.sort(idx)
xi = jax.random.randint(key, (36, H, W), 0, W)


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    lookups = N
    print(f"{name:20s} {dt*1e3:8.2f} ms   {dt/lookups*1e9:6.2f} ns/lookup",
          flush=True)


flat = img.ravel()
bench("flat-take", jax.jit(lambda f, i: jnp.take(f, i)), flat, idx)
bench("flat-take-sorted", jax.jit(lambda f, i: jnp.take(f, i)), flat,
      idx_sorted)
bench("u32-flat-take", jax.jit(lambda f, i: jnp.take(f, i)),
      imgu32.ravel(), idx)
bench("take-rows(ax1)", jax.jit(
    lambda im, x: jnp.take_along_axis(im[None], x, axis=2)), img, xi)
