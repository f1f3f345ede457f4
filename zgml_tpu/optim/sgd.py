"""SGD (+momentum) as pure pytree transforms (ref: src/optim/sgd.zig:21-98)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sgd_update(params, grads, lr):
    """Plain SGD: p -= lr * g."""
    return jax.tree.map(lambda p, g: (p - lr * g).astype(p.dtype), params, grads)


def sgd_init(params):
    """Momentum state: zeros like params."""
    return jax.tree.map(jnp.zeros_like, params)


def sgd_momentum_update(params, grads, state, lr, momentum=0.9):
    """v = mu*v + g; p -= lr*v. Returns (params, state)."""
    new_state = jax.tree.map(lambda v, g: momentum * v + g, state, grads)
    new_params = jax.tree.map(lambda p, v: (p - lr * v).astype(p.dtype),
                              params, new_state)
    return new_params, new_state
