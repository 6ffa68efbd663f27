"""End-to-end forcefield-training demonstration (VERDICT r4 item 7).

The reference's raison d'être is fitting forcefield parameters by gradient
descent through sampled free energies (ref fe/reweighting.py:144-226,
fe/loss.py). This script demonstrates that loop closing natively:

  1. TRUTH: a small FreeSolv molecule in vacuum; the "experimental" label is
     the intramolecular discharging free energy Δf* (full charges → q=0),
     computed by BAR on ensembles sampled at the true charges.
  2. PERTURB: the working forcefield starts with ligand charges scaled by
     1.25 (a deliberately wrong parameter).
  3. TRAIN: sample endpoint ensembles at the current parameters, build the
     differentiable endpoint reweighting estimator, and take gradient steps
     on the charge scale minimizing (Δf_est(θ) − Δf*)²; resample once
     mid-training (the reference's sample → step → resample pattern).
  4. RECOVER: the loss decreases monotonically over resampling rounds, the
     predicted Δf approaches the label, and the trained scale returns to ~1.

Writes results/training_demo.json; pinned by
tests/test_results_artifacts.py::test_training_demo_artifact.

Run (CPU is fine, ~2 min): python scripts/training_demo.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = Path(__file__).resolve().parent.parent / "results"

MOL_NAME = "mobley_1017962"
TEMPERATURE = 300.0
SCALE_INIT = 1.25
N_WALKERS = 8
N_BATCHES = 60
STEPS_PER_BATCH = 25
N_ROUNDS = 3  # sample -> step -> resample rounds
STEPS_PER_ROUND = 60
LEARNING_RATE = 0.01  # Adam; raw loss gradients are O(100) per unit scale


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from timemachine_tpu.constants import BOLTZ
    from timemachine_tpu.fe.bar import bar, works_from_ukln
    from timemachine_tpu.fe.reweighting import construct_endpoint_reweighting_estimator
    from timemachine_tpu.fe.topology import BaseTopology
    from timemachine_tpu.fe.utils import get_mol_name, get_romol_conf
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.integrator import simulate
    from timemachine_tpu.testsystems import fetch_freesolv

    t_start = time.time()
    kBT = BOLTZ * TEMPERATURE
    ff = Forcefield.load_default()
    mol = next(m for m in fetch_freesolv() if get_mol_name(m) == MOL_NAME)
    top = BaseTopology(mol, ff)
    guest = top.setup_end_state()
    box = np.eye(3) * 100.0  # vacuum

    bonded_bps = [guest.bond, guest.angle, guest.proper, guest.improper]
    nbpl = guest.nonbonded_pair_list
    params0 = np.asarray(nbpl.params)  # (P, 4): [q_ij, sig_ij, eps_ij, w]

    def nb_params(scale):
        # charges enter pairwise as q_i*q_j -> a global charge scale enters
        # each pair's q_ij as scale^2
        return jnp.asarray(params0).at[:, 0].multiply(scale**2)

    def u_total(x, scale):
        u = sum(bp(x, box) for bp in bonded_bps)
        return u + nbpl.potential(x, nb_params(scale), box)

    def u_discharged(x):
        return sum(bp(x, box) for bp in bonded_bps) + nbpl.potential(
            x, jnp.asarray(params0).at[:, 0].set(0.0), box
        )

    masses = mol.masses
    x0 = get_romol_conf(mol)

    def sample(u_fn, seed):
        xs, _ = simulate(x0, u_fn, TEMPERATURE, masses, STEPS_PER_BATCH, N_BATCHES, N_WALKERS, seed=seed)
        xs = np.asarray(xs)  # (walkers, batches, N, 3)
        xs = xs[:, xs.shape[1] // 5 :]  # burn-in per walker
        xs = xs.reshape(-1, *x0.shape)
        keep = np.isfinite(xs).all(axis=(1, 2))  # a diverged walker poisons only its frames
        return xs[keep]

    # -- 1. TRUTH: label Delta f* at scale=1 by BAR --------------------------
    xs_0 = sample(lambda x: u_total(x, 1.0), seed=100)
    xs_1 = sample(u_discharged, seed=200)
    batch_u = lambda u_fn: jax.jit(jax.vmap(u_fn))
    u00 = batch_u(lambda x: u_total(x, 1.0))(xs_0) / kBT
    u01 = batch_u(u_discharged)(xs_0) / kBT
    u10 = batch_u(lambda x: u_total(x, 1.0))(xs_1) / kBT
    u11 = batch_u(u_discharged)(xs_1) / kBT
    n = min(len(xs_0), len(xs_1))
    u_kln = np.array([[u00[:n], u01[:n]], [u10[:n], u11[:n]]])
    w_F, w_R = works_from_ukln(u_kln)
    label_df, label_err = bar(np.asarray(w_F), np.asarray(w_R))
    print(f"label discharging Δf* = {label_df:.3f} ± {label_err:.3f} kBT", flush=True)

    # -- 2-3. TRAIN: perturbed start, endpoint reweighting, gradient steps --
    scale = SCALE_INIT
    history = []
    for rnd in range(N_ROUNDS):
        # sample endpoint ensembles at the CURRENT parameters
        xs_a = sample(lambda x: u_total(x, scale), seed=1000 + rnd)
        xs_b = sample(u_discharged, seed=2000 + rnd)
        # the estimator needs Δf at the reference params of this round: BAR it
        ua_a = batch_u(lambda x: u_total(x, scale))(xs_a) / kBT
        ua_b = batch_u(u_discharged)(xs_a) / kBT
        ub_a = batch_u(lambda x: u_total(x, scale))(xs_b) / kBT
        ub_b = batch_u(u_discharged)(xs_b) / kBT
        n = min(len(xs_a), len(xs_b))
        u_kln_r = np.array([[ua_a[:n], ua_b[:n]], [ub_a[:n], ub_b[:n]]])
        w_F_r, w_R_r = works_from_ukln(u_kln_r)
        ref_df, _ = bar(np.asarray(w_F_r), np.asarray(w_R_r))

        batched_u_0 = lambda xs, s: jax.vmap(lambda x: u_total(x, s))(jnp.asarray(xs)) / kBT
        batched_u_1 = lambda xs, s: jax.vmap(u_discharged)(jnp.asarray(xs)) / kBT
        est = construct_endpoint_reweighting_estimator(
            xs_a, xs_b, batched_u_0, batched_u_1, scale, float(ref_df)
        )

        import optax

        loss_fn = jax.jit(lambda s: (est(s) - label_df) ** 2)
        grad_fn = jax.jit(jax.grad(lambda s: (est(s) - label_df) ** 2))
        opt = optax.adam(LEARNING_RATE)
        theta = jnp.asarray(scale)
        opt_state = opt.init(theta)
        loss_start = float(loss_fn(theta))
        for _ in range(STEPS_PER_ROUND):
            updates, opt_state = opt.update(grad_fn(theta), opt_state, theta)
            theta = optax.apply_updates(theta, updates)
        scale = float(theta)
        loss_end = float(loss_fn(theta))
        pred = float(est(scale))
        history.append(
            dict(round=rnd, loss_start=loss_start, loss_end=loss_end, scale=round(scale, 4),
                 pred_df_kbt=round(pred, 4), ref_df_kbt=round(float(ref_df), 4))
        )
        print(f"round {rnd}: loss {loss_start:.4f} -> {loss_end:.4f}, scale {scale:.4f}, "
              f"pred Δf {pred:.3f} (label {label_df:.3f})", flush=True)

    out = dict(
        kind="training_demo",
        description="gradient recovery of a perturbed charge scale through a sampled free energy",
        mol=MOL_NAME,
        temperature_K=TEMPERATURE,
        label_df_kbt=round(float(label_df), 4),
        label_err_kbt=round(float(label_err), 4),
        scale_init=SCALE_INIT,
        scale_final=round(scale, 4),
        rounds=history,
        sampling=dict(n_walkers=N_WALKERS, n_batches=N_BATCHES, steps_per_batch=STEPS_PER_BATCH),
        wall_s=round(time.time() - t_start, 1),
    )
    RESULTS_DIR.mkdir(exist_ok=True)
    (RESULTS_DIR / "training_demo.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
