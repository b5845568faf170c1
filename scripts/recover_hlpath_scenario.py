"""Recover the scenario that generated `Sim_Outputs/HLPath.txt` — the pipeline.

The checked-in APF logs (`Sim_Outputs/HLPath.txt` / `HLVelocity.txt`, written
by `src/MPC_dist.cpp:1072-1103`) were produced by an obstacle field recorded
nowhere in the reference source (docs/ROUND4.md §8). This script is the
actual recovery pipeline whose output is frozen as
`srbx.refplan.HLPATH_RECOVERED_POBS`; `scripts/reproduce_hlpath.py`
validates that frozen field. Stages:

1. **Force deconvolution** — each knot-to-knot transition is 40 rollout
   steps of the damped double integrator (`src/MPC_dist.cpp:945-960`,
   reference-matrix mode). Treating the APF force as constant over the
   window, the transition is linear in the force:
       s_{k+1} = Ad^40 s_k + (sum_j Ad^j) Bd f
   and a per-axis least squares over the (position, velocity) rows yields
   the implied net force per agent per knot.
2. **Constant regression** — the implied forces are regressed against the
   attraction + Lennard-Jones structure (obstacle encounters are a
   minority, so a trimmed/robust fit isolates them): recovers
   alpha ~ 150, lj_epsilon ~ 60, lj_sigma ~ 1 (`src/MPC_dist.cpp:932-933`).
3. **Obstacle triangulation** — the residual force on anomaly samples
   points directly away from the responsible obstacle (repulsion acts
   along pos - obs). Contiguous anomaly episodes per agent are
   least-squares ray-intersected into candidate points and greedily
   clustered into obstacle seeds; with seed positions fixed, the repulsion
   law  |r| d^2 = eta/d - eta/dmin  is LINEAR in (eta, eta/dmin), giving
   eta ~ 400, dmin ~ 1.
4. **Multiple-shooting refinement** — Levenberg–Marquardt over the
   n_obs x 2 obstacle coordinates (Jacobian by jax.jacfwd through the
   vmapped 40-step rollout from every gold knot), minimizing the
   knot-transition position error across all 2420 knots x 4 agents; a
   final joint pass frees (eta, dmin) to confirm they stay at the
   published values.

Writes docs/HLPATH_RECOVERY.json with the fitted constants, the recovered
field, its distance to the frozen `HLPATH_RECOVERED_POBS`, and the final
shooting errors. Runtime: a few minutes on CPU (f64).

Usage: python scripts/recover_hlpath_scenario.py [--quick]
  --quick subsamples knots 4x in the LM stage (seed/regression unchanged).
"""

import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import refplan

REF = pathlib.Path("/root/reference/Sim_Outputs")
GOAL = np.array([10.0, 0.0])
K0, K1 = 25, 2445          # knots past the 1000-iter ramp, before the raw tail
ANOM_THR = 40.0            # N: residual force marking an obstacle encounter
CLUSTER_R = 0.45           # m: greedy clustering radius for episode candidates


def load_gold():
    gp = np.loadtxt(REF / "HLPath.txt").reshape(4, 2, -1).transpose(2, 0, 1)
    gv = np.loadtxt(REF / "HLVelocity.txt").reshape(4, 2, -1).transpose(2, 0, 1)
    return gp, gv            # (knot, agent, xy)


def implied_forces(cfg, gp, gv):
    """Stage 1: per-(knot, agent) constant-force deconvolution (both rows)."""
    ad, bd = map(np.asarray, refplan.resolve_matrices(cfg))
    ad40 = np.linalg.matrix_power(ad, 40)
    s40 = sum(np.linalg.matrix_power(ad, j) for j in range(40)) @ bd  # (2,1)
    # per axis: [p1 - (ad40 @ [p0, v0])_0 ; v1 - (..)_1] = s40 * f
    s0 = np.stack([gp[K0:K1], gv[K0:K1]], axis=-2)          # (nk, 4, 2state, 2xy)
    s1 = np.stack([gp[K0 + 1:K1 + 1], gv[K0 + 1:K1 + 1]], axis=-2)
    rhs = s1 - np.einsum("ij,kajx->kaix", ad40, s0)          # (nk, 4, 2, 2)
    # scalar least squares over the two state rows, per axis
    f = np.einsum("i,kaix->kax", s40[:, 0], rhs) / float(s40[:, 0] @ s40[:, 0])
    return f                                                  # (nk, 4, 2) N


def att_lj_model(pos, alpha, eps, sig):
    """Attraction + LJ force for every (knot, agent) sample.
    pos: (nk, 4, 2) -> (nk, 4, 2)."""
    to_goal = pos - GOAL
    d_goal = np.linalg.norm(to_goal, axis=-1, keepdims=True)
    f_att = -alpha * to_goal / np.maximum(d_goal, 1e-12)
    adiff = pos[:, :, None, :] - pos[:, None, :, :]           # (nk, 4, 4, 2)
    ad = np.linalg.norm(adiff, axis=-1)
    not_self = 1.0 - np.eye(4)
    ad_safe = np.maximum(np.where(not_self > 0, ad, 1.0), 1e-4)
    lj_mag = -4.0 * eps * (6.0 * sig**6 / ad_safe**7
                           - 12.0 * sig**12 / ad_safe**13)
    f_lj = np.sum((lj_mag * not_self)[..., None] * adiff / ad_safe[..., None],
                  axis=2)
    return f_att + f_lj


def rep_model(pos, pobs, eta, dmin):
    """Repulsion force of a known field at every (knot, agent) sample.
    pos: (nk, 4, 2), pobs: (n_obs, 2) -> (nk, 4, 2)."""
    diff = pos[:, :, None, :] - pobs[None, None, :, :]
    d = np.linalg.norm(diff, axis=-1)
    mag = np.where(d < dmin,
                   eta * (1.0 / np.maximum(d, 1e-9) - 1.0 / dmin)
                   / np.maximum(d, 1e-9) ** 2, 0.0)
    return np.sum(mag[..., None] * diff / np.maximum(d, 1e-9)[..., None],
                  axis=2)


def fit_constants(pos, f_impl):
    """Stage 2: (alpha, eps, sigma) from the clean subset.

    84% of samples are repulsion-dominated (agents 0/1 spend most of the
    log trapped in the APF local minimum at the obstacle wall, where
    attraction is balanced by repulsion), so a global regression cannot
    work. Instead:
    * alpha — on samples where the implied force is exactly goal-aligned
      (cos > 0.999) and every other agent is beyond LJ range (> 2 m), the
      model predicts |f| = alpha identically; the median over those
      samples is the estimator.
    * (eps, sigma) — consensus (RANSAC-style): over a coarse grid the
      TRUE law explains the most samples (residual < 2.5 N — the clean
      deconvolution noise is ~1 N, repulsion contamination is 1-2 orders
      larger), then least squares on the inlier set sharpens it. This is
      robust to the 84% contamination where any trimmed/robust global fit
      collapses into a contaminated local minimum.
    """
    from scipy.optimize import least_squares

    goal_u = GOAL - pos
    goal_u /= np.linalg.norm(goal_u, axis=-1, keepdims=True)
    fn = np.linalg.norm(f_impl, axis=-1)
    cos = (f_impl * goal_u).sum(-1) / np.maximum(fn, 1e-9)
    d = np.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :], axis=-1)
    d += np.eye(4) * 1e9
    aligned = (cos > 0.999) & (d.min(2) > 2.0)
    alpha = float(np.median(fn[aligned]))

    best = None
    for eps in np.arange(10.0, 130.0, 5.0):
        for sig in np.arange(0.7, 1.35, 0.05):
            rn = np.linalg.norm(
                f_impl - att_lj_model(pos, alpha, eps, sig), axis=-1)
            inl = (rn < 2.5).mean()
            if best is None or inl > best[0]:
                best = (inl, eps, sig)
    _, eps0, sig0 = best
    for _ in range(3):
        rn = np.linalg.norm(
            f_impl - att_lj_model(pos, alpha, eps0, sig0), axis=-1)
        keep = rn < 2.5

        def resid(th, keep=keep):
            return (f_impl - att_lj_model(pos, alpha, th[0], th[1]))[
                keep].ravel()

        eps0, sig0 = least_squares(resid, x0=[eps0, sig0], method="trf",
                                   bounds=([1.0, 0.3], [300.0, 3.0])).x
    return np.array([alpha, eps0, sig0])


def triangulate_obstacles(pos, resid_f, m_end=8, exclude=None,
                          thr=ANOM_THR):
    """Stage 3: anomaly-ray intersection + greedy clustering.

    resid_f: (nk, 4, 2) residual (repulsion) forces. Repulsion acts along
    pos - obs, so each anomaly sample gives a ray pos + t * (-unit(resid)),
    t > 0, through the obstacle. Rays are intersected per group:
    * episode ENDPOOLS — the first/last m_end anomaly samples of each
      contiguous episode (approach and retreat carry the most parallax);
    * INTERIOR windows (120 knots, hop 60) of long episodes — an agent
      trapped at the obstacle wall oscillates for thousands of knots and
      its interior rays sweep across wall obstacles the endpoints never
      see.
    Groups without parallax (rays near-parallel -> intersection
    ill-conditioned) or with the intersection on the wrong side / far
    outside repulsion range are discarded — the LM stage only needs
    ~0.3 m seeds. The endpoint distance t furnishes a self-consistent dmin
    estimate (the force just crosses the threshold there) with no force-law
    constants assumed."""
    rn = np.linalg.norm(resid_f, axis=-1)

    def intersect(win, a):
        p = pos[win, a]                                   # (ne, 2)
        u = resid_f[win, a] / rn[win, a][:, None]         # away from obs
        proj = np.eye(2)[None] - u[:, :, None] * u[:, None, :]
        lhs = proj.sum(0)
        rhs = np.einsum("nij,nj->i", proj, p)
        if np.linalg.cond(lhs) > 2e4:
            return None, None                             # no parallax
        x = np.linalg.solve(lhs, rhs)
        t = np.einsum("nj,nj->n", p - x, u)
        if t.mean() <= 0 or t.mean() > 2.5:
            return None, None
        return x, t.mean()

    candidates, weights, end_dists = [], [], []
    for a in range(4):
        idx = np.flatnonzero(rn[:, a] > thr)
        if idx.size == 0:
            continue
        splits = np.flatnonzero(np.diff(idx) > 10) + 1
        for ep in np.split(idx, splits):
            if ep.size < 2 * m_end:
                continue
            x, t = intersect(np.concatenate([ep[:m_end], ep[-m_end:]]), a)
            if x is not None:
                candidates.append(x)
                weights.append(rn[ep, a].sum())
                end_dists.append(t)
            for w0 in range(0, ep.size - 120, 60):
                x, t = intersect(ep[w0:w0 + 120], a)
                if x is not None:
                    candidates.append(x)
                    weights.append(rn[ep[w0:w0 + 120], a].sum())
    candidates = np.asarray(candidates)
    weights = np.asarray(weights)
    seeds = (_cluster(candidates, weights) if len(candidates)
             else np.zeros((0, 2)))
    if exclude is not None and len(seeds) and len(exclude):
        far = np.linalg.norm(
            seeds[:, None, :] - np.asarray(exclude)[None], axis=-1
        ).min(1) > CLUSTER_R
        seeds = seeds[far]
    dmin0 = float(np.median(end_dists)) if end_dists else 1.0
    return seeds, candidates, dmin0


def _cluster(candidates, weights):
    """Greedy weighted clustering (radius CLUSTER_R), strongest first."""
    order = np.argsort(-weights)
    clusters = []            # list of [wsum, w*x sum]
    for i in order:
        for c in clusters:
            if np.linalg.norm(candidates[i] - c[1] / c[0]) < CLUSTER_R:
                c[0] += weights[i]
                c[1] += weights[i] * candidates[i]
                break
        else:
            clusters.append([weights[i], weights[i] * candidates[i]])
    clusters.sort(key=lambda c: -c[0])
    return np.asarray([c[1] / c[0] for c in clusters]).reshape(-1, 2)


def invert_candidates(pos, resid_f, eta, dmin, thr, exclude=None):
    """Per-sample obstacle candidates by repulsion-MAGNITUDE inversion.

    Ray intersection fails for trapped agents (quasi-static orbiting mixes
    transient directions; VERDICT's t>0 test rejects the pool). But once
    (eta, dmin) are known, each anomaly sample determines the obstacle
    distance directly:  |r| = eta (1/d - 1/dmin) / d^2  is monotone in d on
    (0, dmin), so d follows by bisection and the candidate is p - d*u.
    Clustered greedily, strongest first."""
    rn = np.linalg.norm(resid_f, axis=-1)
    mask = rn > thr
    if not mask.any():
        return np.zeros((0, 2))
    p = pos[mask]
    r = rn[mask]
    u = resid_f[mask] / r[:, None]
    lo = np.full(r.shape, 1e-3)
    hi = np.full(r.shape, dmin - 1e-9)
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        val = eta * (1.0 / mid - 1.0 / dmin) / mid**2
        too_strong = val > r          # val decreasing in d -> move right
        lo = np.where(too_strong, mid, lo)
        hi = np.where(too_strong, hi, mid)
    d = 0.5 * (lo + hi)
    cands = p - d[:, None] * u
    seeds = _cluster(cands, r)
    if exclude is not None and len(seeds) and len(exclude):
        far = np.linalg.norm(
            seeds[:, None, :] - np.asarray(exclude)[None], axis=-1
        ).min(1) > CLUSTER_R
        seeds = seeds[far]
    return seeds


def fit_eta_dmin(pos, resid_f, seeds):
    """Stage 3b: with obstacle positions fixed, the repulsion magnitude is
    linear in (eta, eta/dmin):  |r| d^2 = eta (1/d) - (eta/dmin) * 1."""
    rn = np.linalg.norm(resid_f, axis=-1)
    rows, rhs = [], []
    for a in range(4):
        for k in np.flatnonzero(rn[:, a] > ANOM_THR):
            d = np.linalg.norm(seeds - pos[k, a], axis=-1).min()
            if d > 1.2:      # only near-obstacle samples constrain the law
                continue
            rows.append([1.0 / d, -1.0])
            rhs.append(rn[k, a] * d * d)
    rows, rhs = np.asarray(rows), np.asarray(rhs)
    (eta, eta_over_dmin), *_ = np.linalg.lstsq(rows, rhs, rcond=None)
    return float(eta), float(eta / eta_over_dmin)


def lm_refine(cfg, gp, gv, pobs0, free_law=False, iters=40, stride=1,
              verbose=True, fixed_pobs=None):
    """Stage 4: Levenberg–Marquardt over the obstacle coordinates
    (optionally + the four force-law constants eta, dmin, lj_epsilon,
    lj_sigma) through the vmapped 40-step shooting. The Jacobian comes from
    jax.jacfwd through the rollout; alpha stays at its (exactly identified)
    stage-2 value."""
    pos0 = jnp.asarray(gp[K0:K1:stride])
    vel0 = jnp.asarray(gv[K0:K1:stride])
    gold1 = jnp.asarray(gp[K0 + 1:K1 + 1][::stride])
    n_obs = pobs0.shape[1]
    fixed = (jnp.asarray(fixed_pobs) if fixed_pobs is not None
             and len(fixed_pobs) else None)

    def residual(theta):
        pobs = theta[: 2 * n_obs].reshape(2, n_obs)
        if fixed is not None:
            pobs = jnp.concatenate([fixed, pobs], axis=1)
        c = cfg
        if free_law:
            c = dataclasses.replace(
                cfg, eta=theta[-4], dmin=theta[-3],
                lj_epsilon=theta[-2], lj_sigma=theta[-1])
        shoot = jax.vmap(
            lambda p, v: refplan.rollout_window(c, p, v, pobs, 40, 2000))
        pos1, _ = shoot(pos0, vel0)
        return (pos1 - gold1).ravel()

    res_j = jax.jit(residual)
    jac_j = jax.jit(jax.jacfwd(residual))

    theta = jnp.asarray(pobs0.ravel())
    if free_law:
        theta = jnp.concatenate([theta, jnp.asarray(
            [cfg.eta, cfg.dmin, cfg.lj_epsilon, cfg.lj_sigma])])
    lam = 1e-3
    cost = float(jnp.sum(res_j(theta) ** 2))
    if not np.isfinite(cost):
        # a degenerate field (obstacle on the agent path) explodes the
        # rollout; the caller filters such candidates
        return np.asarray(theta), float("inf")
    for it in range(iters):
        r = np.asarray(res_j(theta))
        J = np.asarray(jac_j(theta))
        JtJ = J.T @ J
        g = J.T @ r
        step_ok = False
        for _ in range(8):
            try:
                dx = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ)), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            theta_new = theta + dx
            cost_new = float(jnp.sum(res_j(theta_new) ** 2))
            if np.isfinite(cost_new) and cost_new < cost:
                theta, cost, lam = theta_new, cost_new, max(lam / 3, 1e-10)
                step_ok = True
                break
            lam *= 10
        rms = np.sqrt(cost / r.size)
        if verbose:
            print(f"  LM it {it:2d}: rms {rms * 1e3:.4f} mm  lam {lam:.1e}")
        if not step_ok or (it > 2 and np.abs(dx).max() < 1e-7):
            break
    return np.asarray(theta), cost


def match_to_frozen(pobs):
    """Greedy nearest-neighbour assignment to HLPATH_RECOVERED_POBS."""
    frozen = refplan.HLPATH_RECOVERED_POBS.T                  # (9, 2)
    rec = pobs.T.copy()
    deltas = []
    used = set()
    for f in frozen:
        d = np.linalg.norm(rec - f, axis=-1)
        for i in np.argsort(d):
            if i not in used:
                used.add(i)
                deltas.append(float(d[i]))
                break
    return deltas


def main():
    quick = "--quick" in sys.argv
    gp, gv = load_gold()
    cfg = refplan.four_agent_config(reference_matrices=True)
    pos = gp[K0:K1]

    print("[1] force deconvolution")
    f_impl = implied_forces(cfg, gp, gv)

    print("[2] constant regression (alpha exact; eps/sigma consensus)")
    alpha, eps0, sig0 = fit_constants(pos, f_impl)
    print(f"    alpha={alpha:.2f} (pub 150)  eps={eps0:.2f} (pub 60)  sigma={sig0:.4f} (pub 1)")

    resid_f = f_impl - att_lj_model(pos, alpha, eps0, sig0)

    print("[3] initial triangulation (episode endpoints)")
    seeds, cands, dmin0 = triangulate_obstacles(pos, resid_f)
    print(f"    {len(cands)} episode candidates -> {len(seeds)} clusters; "
          f"endpoint dmin0={dmin0:.3f}")

    stride = 4 if quick else 1

    print("[3b] eta grid (data-driven scale selection)")
    best_eta = None
    for eta_try in (100.0, 200.0, 400.0, 800.0, 1600.0):
        c_try = dataclasses.replace(
            cfg, alpha=alpha, lj_epsilon=float(eps0), lj_sigma=float(sig0),
            eta=eta_try, dmin=float(dmin0))
        _, cost = lm_refine(c_try, gp, gv, seeds.T, iters=6, stride=4,
                            verbose=False)
        print(f"    eta={eta_try:.0f}: cost {cost:.4f}")
        if best_eta is None or cost < best_eta[1]:
            best_eta = (eta_try, cost)
    eta0 = best_eta[0]
    print(f"    selected eta0={eta0:.0f}")

    print("[4] matching-pursuit obstacle recovery (law fixed)")
    law = dict(alpha=alpha, lj_epsilon=float(eps0), lj_sigma=float(sig0),
               eta=float(eta0), dmin=float(dmin0))
    field = seeds.copy()                       # (k, 2)
    best = None                                # (cost, field, law)
    drops = 0
    history = []
    n_res = ((K1 - K0 + stride - 1) // stride) * 8
    thr_schedule = [25.0, 25.0, 25.0, 12.0, 12.0, 8.0, 8.0, 5.0, 5.0, 5.0,
                    5.0, 5.0]
    for it in range(12):
        cfg_it = dataclasses.replace(cfg, **law)
        theta, cost = lm_refine(cfg_it, gp, gv, field.T,
                                iters=20 if quick else 25, stride=stride,
                                verbose=False)
        field = np.asarray(theta[:2 * len(field)]).reshape(2, -1).T
        print(f"  round {it}: k={len(field)}  rms "
              f"{np.sqrt(cost / n_res) * 1e3:.3f} mm  eta={law['eta']:.0f}")
        history.append({"k": int(len(field)),
                        "rms_mm": float(np.sqrt(cost / n_res) * 1e3)})
        if best is not None and cost > best[0]:
            drops += 1
            if drops >= 2:
                print("    repeated non-improving additions; stopping")
                break
            print("    worse than best; dropping the last addition")
            field, law = best[1].copy(), dict(best[2])
            continue
        drops = 0
        best = (cost, field.copy(), dict(law))
        # refresh the law on the current field (short joint LM; eps/sigma
        # are consensus-pinned and stay put, eta/dmin unlock from the grid)
        th_l, c_l = lm_refine(cfg_it, gp, gv, field.T, free_law=True,
                              iters=6, stride=stride, verbose=False)
        if np.isfinite(c_l) and c_l < cost:
            law.update(eta=float(th_l[-4]), dmin=float(th_l[-3]),
                       lj_epsilon=float(th_l[-2]), lj_sigma=float(th_l[-1]))
            field = np.asarray(th_l[:2 * len(field)]).reshape(2, -1).T
            cfg_it = dataclasses.replace(cfg, **law)
            best = (c_l, field.copy(), dict(law))
            print(f"    law refresh: eta={law['eta']:.1f} "
                  f"dmin={law['dmin']:.3f}")
        # residual after the FULL current model -> next obstacle, by
        # repulsion-magnitude inversion (works for trapped/static agents
        # where ray intersection cannot)
        resid2 = (f_impl - att_lj_model(pos, law["alpha"], law["lj_epsilon"],
                                        law["lj_sigma"])
                  - rep_model(pos, field, law["eta"], law["dmin"]))
        new_seeds = invert_candidates(pos, resid2, law["eta"], law["dmin"],
                                      thr_schedule[it], exclude=field)
        # a genuine obstacle cannot sit on the agent path (the repulsion law
        # would have produced enormous forces the log does not show); such
        # candidates also explode the shooting rollout. Each surviving
        # candidate gets a 2-dof fit (its own coords, rest of the field
        # frozen); the best improving one joins the field.
        path_pts = pos.reshape(-1, 2)
        _, cost_s4 = lm_refine(cfg_it, gp, gv, field.T, iters=0, stride=4,
                               verbose=False)
        trial_best = None
        for cand in new_seeds[:6]:
            d_path = np.linalg.norm(path_pts - cand, axis=-1).min()
            if d_path < 0.15:
                continue
            th_c, c_c = lm_refine(cfg_it, gp, gv,
                                  cand.reshape(2, 1), iters=8, stride=4,
                                  verbose=False, fixed_pobs=field.T)
            fit_xy = np.asarray(th_c[:2])
            # the 2-dof fit can walk distinct seeds into the same inert
            # attractor: dedup the POST-fit position against the field and
            # demand a real (>0.3%) stride-4 cost gain before accepting
            if np.linalg.norm(field - fit_xy, axis=-1).min() < CLUSTER_R:
                continue
            if not np.isfinite(c_c) or c_c > cost_s4 * 0.997:
                continue
            if trial_best is None or c_c < trial_best[0]:
                trial_best = (c_c, fit_xy)
        if trial_best is None:
            nxt = [t for t in thr_schedule[it + 1:] if t < thr_schedule[it]]
            if not nxt:
                print("  residual triangulation exhausted; stopping")
                break
            print(f"    nothing at thr={thr_schedule[it]:.0f} N; annealing")
            continue
        print(f"    + obstacle candidate {np.round(trial_best[1], 3)}")
        field = np.vstack([field, trial_best[1]])
    field, law = best[1], best[2]
    print(f"  pursuit field: k={len(field)}")

    print("[4a] prune (drop obstacles whose removal is free, greedily)")
    # Sequential-greedy: redundant near-duplicates from the pursuit cover
    # for each other, so each is individually removable — evaluating all
    # removals against the ORIGINAL field would wrongly drop every member
    # of a redundant group. Remove the single cheapest obstacle, refit,
    # re-evaluate, repeat. A real obstacle's removal costs 2-100x
    # (leave-one-out on the frozen field: weakest real contributor 3.3x).
    cfg_pr = dataclasses.replace(cfg, **law)
    _, cost_full = lm_refine(cfg_pr, gp, gv, field.T, iters=0,
                             stride=stride, verbose=False)
    while len(field) > 1:
        ratios = []
        for i in range(len(field)):
            sub = np.delete(field, i, axis=0)
            th_i, c_i = lm_refine(cfg_pr, gp, gv, sub.T, iters=10,
                                  stride=stride, verbose=False)
            ratios.append((c_i / cost_full, i, th_i, c_i))
        ratios.sort()
        ratio, i, th_i, c_i = ratios[0]
        if ratio > 2.0:
            break
        print(f"    - pruned {np.round(field[i], 3)} "
              f"(removal cost ratio {ratio:.3f})")
        field = np.asarray(
            th_i[:2 * (len(field) - 1)]).reshape(2, -1).T
        cost_full = c_i
    k_sel = len(field)
    print(f"  final field: k={k_sel}")

    print("[4b] joint LM freeing (eta, dmin, lj_epsilon, lj_sigma) on the "
          "complete field")
    theta2, cost2 = lm_refine(dataclasses.replace(cfg, **law), gp, gv,
                              field.T, free_law=True, iters=40,
                              stride=stride)
    eta_j, dmin_j, eps_j, sig_j = [float(v) for v in theta2[-4:]]
    field = np.asarray(theta2[:2 * k_sel]).reshape(2, k_sel).T
    print(f"    joint: eta={eta_j:.1f} (pub 400)  dmin={dmin_j:.4f} (pub 1)"
          f"  eps={eps_j:.2f} (pub 60)  sigma={sig_j:.4f} (pub 1)")
    law.update(eta=eta_j, dmin=dmin_j, lj_epsilon=eps_j, lj_sigma=sig_j)

    print("[5] final field at the published constants (what "
          "HLPATH_RECOVERED_POBS froze)")
    cfg_pub = dataclasses.replace(
        cfg, alpha=150.0, eta=400.0, dmin=1.0, lj_epsilon=60.0, lj_sigma=1.0)
    theta3, cost3 = lm_refine(cfg_pub, gp, gv, field.T,
                              iters=10 if quick else 20, stride=stride,
                              verbose=False)
    pobs_pub = np.asarray(theta3[:2 * k_sel]).reshape(2, k_sel)

    # final shooting errors with the published-constants fitted field.
    # NOTE the field is passed as a jit ARGUMENT: jit(vmap(f)) with the
    # field as a closure constant miscompiles on CPU (measured 0.23 mm ->
    # 44 mm rms on identical inputs; unjitted and jit-with-arg agree) —
    # see docs/ROUND5.md.
    shoot = jax.jit(lambda P, V, O: jax.vmap(
        lambda p, v: refplan.rollout_window(cfg_pub, p, v, O, 40, 2000)
    )(P, V))
    pos1, _ = shoot(jnp.asarray(gp[K0:K1]), jnp.asarray(gv[K0:K1]),
                    jnp.asarray(pobs_pub))
    err = np.linalg.norm(np.asarray(pos1) - gp[K0 + 1:K1 + 1], axis=2)

    deltas = match_to_frozen(pobs_pub)
    out = {
        "fitted_constants": {
            "alpha": float(alpha),
            "lj_epsilon_consensus": float(eps0), "lj_sigma_consensus": float(sig0),
            "eta_grid": float(eta0), "dmin_endpoint": float(dmin0),
            "eta_joint": eta_j, "dmin_joint": dmin_j,
            "lj_epsilon_joint": eps_j, "lj_sigma_joint": sig_j,
            "published": {"alpha": 150, "eta": 400, "lj_epsilon": 60,
                          "lj_sigma": 1, "dmin": 1},
        },
        "matching_pursuit": history,
        "n_obstacles_selected": int(k_sel),
        "recovered_field_pobs": pobs_pub.tolist(),
        "distance_to_frozen_field_m": deltas,
        "knot_transition_errors_m": {
            "rms": float(np.sqrt((err ** 2).mean())),
            "p99": float(np.percentile(err, 99)),
            "max": float(err.max()),
        },
        "quick_mode": quick,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
        "HLPATH_RECOVERY.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["fitted_constants"], indent=1))
    print("deltas to frozen field (m):", [f"{d:.4f}" for d in deltas])
    print("shooting rms {:.3f} mm  max {:.3f} mm".format(
        out["knot_transition_errors_m"]["rms"] * 1e3,
        out["knot_transition_errors_m"]["max"] * 1e3))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
