"""Elementwise activations (reference: src/layers.c:24-123, util.h).

XLA fuses these into the surrounding matmuls; no Pallas needed here.
The reference computes tanh via the logistic (util.h:334-337):
``tanh(x) = 2*logistic(2x) - 1`` - semantically identical to tanh, so
we use the native op.
"""

import jax
import jax.numpy as jnp


def swish(x):
    return x * jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def elu(x):
    return jnp.where(x >= 0, x, jnp.expm1(x))


def softplus(x):
    return jax.nn.softplus(x)


ACTIVATIONS = {"swish": swish, "tanh": tanh, "elu": elu}
