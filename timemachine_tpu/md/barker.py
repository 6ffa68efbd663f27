"""Barker proposal: robust gradient-informed MCMC proposal
(Livingstone & Zanella 2020, arXiv:1908.11812).

Parity target: reference timemachine/md/barker.py. Used for clash-robust host
pre-equilibration (md/minimizer.py equilibrate_host_barker)."""

from __future__ import annotations

import numpy as np


class BarkerProposal:
    def __init__(self, grad_log_q, proposal_sig=0.001, seed=None):
        self.grad_log_q = grad_log_q
        assert proposal_sig > 0
        self.proposal_sig = proposal_sig
        if seed is None:
            seed = np.random.randint(100000)
        self.rng = np.random.default_rng(seed)

    def _sample(self, x, gaussian_rvs, uniform_rvs):
        z = gaussian_rvs * self.proposal_sig
        grad_x = np.asarray(self.grad_log_q(x))
        log_p_xz = -np.logaddexp(0.0, -grad_x * z)
        p_xz = np.exp(log_p_xz)
        b_xz = np.sign(p_xz - uniform_rvs)
        return x + b_xz * z

    def sample(self, x):
        gauss = self.rng.normal(size=x.shape)
        unif = self.rng.uniform(size=x.shape)
        return self._sample(x, gauss, unif)

    def log_density(self, x, y):
        z = y - x
        base = np.sum(-0.5 * (z / self.proposal_sig) ** 2 - np.log(self.proposal_sig * np.sqrt(2 * np.pi)))
        grad_x = np.asarray(self.grad_log_q(x))
        log_p_xz = -np.logaddexp(0.0, -grad_x * z)
        return base + np.sum(log_p_xz) - np.log(0.5)
