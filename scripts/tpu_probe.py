import jax, jax.numpy as jnp
jax.devices()
# a REAL device op: jax.devices() alone succeeds while a post-SIGKILL
# relay still futex-hangs the first computation
print(float(jnp.zeros(8).sum().block_until_ready()))
