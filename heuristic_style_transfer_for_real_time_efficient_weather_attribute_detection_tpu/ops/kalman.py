"""Kalman smoothing of per-task probability vectors (camera/stream mode).

The reference smooths each task's softmax vector with
``pykalman.KalmanFilter(initial_state_mean=0, initial_state_covariance=I,
n_dim_obs=M).filter_update`` (utils/camera_utils.py:99-131).  With pykalman's
defaults that is the identity-dynamics filter:

    predict:  x- = x,          P- = P + Q          (Q = I)
    update:   K  = P- (P- + R)^-1                   (R = I)
              x  = x- + K (z - x-),  P = (I - K) P-

Implemented here as a tiny jitted step over a *stacked, padded* state
[T, Kmax] so all 12 tasks update in one fused call per frame, with a
diagonal-covariance fast path (the identity-matrix defaults stay diagonal
forever, so this is exact, not an approximation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KalmanState(NamedTuple):
    mean: jnp.ndarray  # [T, K] state means
    cov: jnp.ndarray  # [T, K] diagonal covariances


def init_state(num_tasks: int, max_classes: int) -> KalmanState:
    """Matches pykalman init: zero mean, identity covariance."""
    return KalmanState(
        mean=jnp.zeros((num_tasks, max_classes), jnp.float32),
        cov=jnp.ones((num_tasks, max_classes), jnp.float32),
    )


@partial(jax.jit, static_argnames=("q", "r"))
def filter_update(
    state: KalmanState, obs: jnp.ndarray, q: float = 1.0, r: float = 1.0
):
    """One identity-dynamics Kalman update.  obs: [T, K] (padded probs).

    Returns (new_state, smoothed_obs).  q/r are the (scalar, diagonal)
    transition/observation covariances; pykalman defaults are 1.0.
    """
    pred_cov = state.cov + q
    gain = pred_cov / (pred_cov + r)
    mean = state.mean + gain * (obs - state.mean)
    cov = (1.0 - gain) * pred_cov
    return KalmanState(mean=mean, cov=cov), mean
