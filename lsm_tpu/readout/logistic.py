"""Multinomial logistic regression readout, trained on device with L-BFGS.

TPU-native replacement for the reference's
`sklearn.LogisticRegression(multi_class="multinomial", max_iter=1000)` fit
(train_classifier.py:36-41). sklearn's lbfgs solver minimizes

    0.5 * ||W||^2 + C * sum_i CE(softmax(x_i W + b), y_i)

with the intercept unpenalized; we minimize the same objective scaled by
1/(C*N) (same argmin) using `optax.lbfgs` with zoom line search, full-batch
gradients on device. Under data parallelism the loss/gradient are psum
reductions over the batch shards.

Also provides a closed-form one-hot ridge readout (normal equations solved
on device) as a fast alternative.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class LogisticParams(NamedTuple):
    w: jax.Array   # (D, K)
    b: jax.Array   # (K,)


def _loss_fn(
    params: LogisticParams, x: jnp.ndarray, y: jnp.ndarray, l2: float
) -> jnp.ndarray:
    logits = x @ params.w + params.b
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
    reg = 0.5 * l2 * jnp.sum(params.w * params.w) / x.shape[0]
    return ce + reg


@functools.partial(jax.jit, static_argnames=("num_classes", "max_iter"))
def fit_logistic(
    x: jnp.ndarray,
    y: jnp.ndarray,
    num_classes: int,
    l2_c: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-5,
) -> Tuple[LogisticParams, jnp.ndarray]:
    """Full-batch L-BFGS fit. x: (N, D) float32, y: (N,) int32.

    Returns (params, n_iters_used).
    """
    d = x.shape[1]
    # sklearn objective scaled by 1/(C*N): CE mean + (0.5/C) ||W||^2 / N.
    # _loss_fn divides the reg term by N, so pass l2 = 1/C.
    l2 = 1.0 / l2_c

    params = LogisticParams(
        w=jnp.zeros((d, num_classes), jnp.float32),
        b=jnp.zeros((num_classes,), jnp.float32),
    )
    loss = functools.partial(_loss_fn, x=x, y=y, l2=l2)

    opt = optax.lbfgs()
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss)

    def cond(carry):
        params, state, it, gnorm = carry
        return jnp.logical_and(it < max_iter, gnorm > tol)

    def body(carry):
        params, state, it, _ = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss
        )
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grad)
        return params, state, it + 1, gnorm

    params, state, iters, _ = jax.lax.while_loop(
        cond, body, (params, state, jnp.asarray(0), jnp.asarray(jnp.inf))
    )
    return params, iters


def predict_logits(params: LogisticParams, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params.w + params.b


def predict(params: LogisticParams, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(predict_logits(params, x), axis=-1)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def fit_ridge(
    x: jnp.ndarray, y: jnp.ndarray, num_classes: int, alpha: float = 1.0
) -> LogisticParams:
    """Closed-form one-hot ridge readout via normal equations.

    Solves (X^T X + alpha I) W = X^T Y_onehot with centered features; the
    Gram matrix is a single (D, N) x (N, D) MXU matmul and, under
    shard_map, a psum over batch shards (SURVEY.md section 2.4b).
    """
    n, d = x.shape
    y1 = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
    x_mean = x.mean(axis=0, keepdims=True)
    y_mean = y1.mean(axis=0, keepdims=True)
    xc = x - x_mean
    yc = y1 - y_mean
    gram = xc.T @ xc + alpha * jnp.eye(d, dtype=jnp.float32)
    xty = xc.T @ yc
    w = jax.scipy.linalg.solve(gram, xty, assume_a="pos")
    b = (y_mean - x_mean @ w)[0]
    return LogisticParams(w=w, b=b)
