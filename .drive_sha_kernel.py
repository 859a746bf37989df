"""Verify drive: public sha256 surface with the Pallas kernel module in
the dispatch path (CPU-forced: kernel probe correctly declines off-TPU,
XLA path serves; kernel itself driven in interpret mode)."""

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.ops.sha256 import _kernel_ok, sha256
from crypto_primitives_tpu.ops.sha256_pallas import sha256_state_pallas

assert _kernel_ok() is False  # CPU: probe must decline, XLA path serves
msgs = [bytes((i + j) % 256 for j in range(32)) for i in range(600)]
out = np.asarray(sha256(jnp.asarray([list(m) for m in msgs], jnp.uint8)))
for i, m in enumerate(msgs[:5]) :
    assert bytes(out[i]) == hashlib.sha256(m).digest()
print("sha256 dispatch (XLA path on CPU) OK", flush=True)

# drive the kernel itself in interpret mode at a Merkle-compress shape
padded = np.zeros((4, 128), np.uint8)
for i in range(4):
    padded[i, :80] = np.frombuffer(bytes((i + j) % 256 for j in range(80)), np.uint8)
    padded[i, 80] = 0x80
    padded[i, -8:] = np.frombuffer((640).to_bytes(8, "big"), np.uint8)
by = padded.reshape(4, 2, 16, 4).astype(np.uint32)
w = (by[..., 0] << 24) | (by[..., 1] << 16) | (by[..., 2] << 8) | by[..., 3]
st = np.asarray(sha256_state_pallas(jnp.asarray(w), block_b=128, interpret=True))
for i in range(4):
    got = b"".join(int(v).to_bytes(4, "big") for v in st[i])
    assert got == hashlib.sha256(bytes((i + j) % 256 for j in range(80))).digest()
print("sha kernel interpret OK", flush=True)
print("DRIVE PASSED", flush=True)
