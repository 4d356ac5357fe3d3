"""Parameter initializers matching PyTorch layer defaults.

The reference model's training dynamics depend on torch's default inits
(kaiming-uniform with a=sqrt(5) for Linear/Conv == U(-1/sqrt(fan_in),
1/sqrt(fan_in)); U(-1/sqrt(H), 1/sqrt(H)) for GRU weights; N(0,1) for
embeddings).  These helpers reproduce those distributions for flax
parameter shapes (Dense kernel (in, out); Conv kernel (k..., in, out))."""

import numpy as np
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Dense kernel (in, out): U(-1/sqrt(in), 1/sqrt(in))."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Conv kernel (k..., in, out): U(-1/sqrt(in*prod(k)), ...)."""
    receptive = int(np.prod(shape[:-2]))
    fan_in = shape[-2] * receptive
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in):
    """Bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch Linear/Conv default)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init
