"""Loss functions for forcefield fitting against experimental labels.

Parity target: reference `timemachine/fe/loss.py` (truncated residuals :6-27,
l1 :30-32, pseudo-Huber :35-52, flat-bottom :55-57). Pure JAX: compose with
the differentiable estimators in fe/reweighting.py for end-to-end parameter
gradients.
"""

import jax.numpy as jnp

from timemachine_tpu.constants import KCAL_TO_KJ


def truncated_residuals(predictions, labels, reliable_interval=(-jnp.inf, +jnp.inf)):
    """Residuals adapted for labels only reliable within an interval (e.g. a
    bottomed-out assay): outside the interval only the violation counts.

    >>> import jax.numpy as jnp
    >>> labels = jnp.array([0.5, 0.5, 0.5, -6, -6, -6])
    >>> predictions = jnp.array([-10, 0, +10, -10, 0, +10])
    >>> print(truncated_residuals(predictions, labels, (-5, +1)))
    [-10.5  -0.5   9.5   0.    5.   15. ]
    """
    lower, upper = reliable_interval
    residuals = predictions - labels
    residuals = jnp.where(labels < lower, jnp.maximum(0, predictions - lower), residuals)
    residuals = jnp.where(labels > upper, jnp.minimum(0, predictions - upper), residuals)
    return residuals


def l1_loss(residual):
    """loss = |residual|"""
    return jnp.abs(residual)


def pseudo_huber_loss(residual, threshold=KCAL_TO_KJ):
    """threshold * (sqrt(1 + (residual/threshold)²) − 1): ~L2 below the
    threshold, slope-1 ~L1 above it (the leading factor is `threshold`, not
    `threshold²`, so the asymptotic slope is 1). Default threshold 1 kcal/mol
    in kJ/mol."""
    return threshold * (jnp.sqrt(1 + (residual / threshold) ** 2) - 1)


def flat_bottom_loss(residual, threshold=KCAL_TO_KJ):
    """loss = max(0, |residual| − threshold)"""
    return jnp.maximum(0, jnp.abs(residual) - threshold)
