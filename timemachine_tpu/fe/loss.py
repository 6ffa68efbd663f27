"""Losses for fitting forcefield parameters to experimental labels.

Parity target: reference `timemachine/fe/loss.py` (truncated residuals :6-27,
l1 :30-32, pseudo-Huber :35-52, flat-bottom :55-57). Pure JAX scalars/
vectors: compose with the differentiable estimators in fe/reweighting.py and
fe/mbar.py for end-to-end parameter gradients.
"""

import jax
import jax.numpy as jnp

from timemachine_tpu.constants import KCAL_TO_KJ


def truncated_residuals(predictions, labels, reliable_interval=(-jnp.inf, +jnp.inf)):
    """Residuals for labels trusted only inside an interval (bottomed-out or
    saturated assays): against an out-of-interval label, a prediction is only
    penalized for crossing the interval boundary, never for its distance to
    the (unreliable) label value.

    >>> import jax.numpy as jnp
    >>> labels = jnp.array([0.5, 0.5, 0.5, -6, -6, -6])
    >>> predictions = jnp.array([-10, 0, +10, -10, 0, +10])
    >>> print(truncated_residuals(predictions, labels, (-5, +1)))
    [-10.5  -0.5   9.5   0.    5.   15. ]
    """
    lo, hi = reliable_interval
    # residual against the label clipped into the trusted interval; one-sided
    # outside it (a prediction deeper past the boundary than the label is fine)
    r = predictions - jnp.clip(labels, lo, hi)
    below = jnp.maximum(r, 0.0)  # label under-range: only over-predictions count
    above = jnp.minimum(r, 0.0)  # label over-range: only under-predictions count
    return jnp.where(labels < lo, below, jnp.where(labels > hi, above, r))


def l1_loss(residual):
    """|residual|"""
    return jnp.abs(residual)


def pseudo_huber_loss(residual, threshold=KCAL_TO_KJ):
    """hypot(threshold, residual) - threshold: quadratic in the residual well
    below the threshold, asymptotic slope exactly 1 above it (equivalently
    threshold * (sqrt(1 + (r/threshold)^2) - 1), written overflow-safe).
    Default threshold is 1 kcal/mol expressed in kJ/mol."""
    return jnp.hypot(jnp.asarray(threshold, jnp.result_type(residual, float)), residual) - threshold


def flat_bottom_loss(residual, threshold=KCAL_TO_KJ):
    """relu(|residual| - threshold): free inside +/- threshold, L1 outside."""
    return jax.nn.relu(jnp.abs(residual) - threshold)
