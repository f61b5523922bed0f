import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
out = f(x)
print("backend:", jax.default_backend())
print("pallas ok:", bool(np.allclose(np.asarray(out),
                                     np.asarray(x) * 2 + 1)))

# matmul kernel with grid
def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32)


@jax.jit
def mm(a, b):
    return pl.pallas_call(
        mm_kernel,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


a = jax.random.normal(jax.random.PRNGKey(0), (256, 128))
b = jax.random.normal(jax.random.PRNGKey(1), (128, 256))
out = mm(a, b)
print("pallas matmul ok:",
      bool(np.allclose(np.asarray(out), np.asarray(a) @ np.asarray(b),
                       atol=1e-4)))
