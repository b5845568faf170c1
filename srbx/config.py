"""Typed configuration for the srbx engine.

One typed, hashable config tree replaces the reference's three-tier config
system (compile-time macros in `include/global_loco_opts.h:8-31`, positional
`fscanf` param files routed by filename substring in `src/Parameters.cpp:9-166`,
and in-code hard-coded gains, e.g. `src/MPC_dist.cpp:170-188`).

All dataclasses are frozen and contain only hashable leaves so they can be
closed over by `jax.jit` as static configuration. Anything that is a traced
array at runtime lives in state pytrees instead (see srbx.mpc / srbx.agent).
"""

from __future__ import annotations

import dataclasses
import enum


class Gait(enum.IntEnum):
    """Gait IDs (reference: `include/global_loco_opts.h:38-45`)."""

    STAND = 0
    POSE = 1
    TAP = 2
    INPLACE_WALK = 3
    INPLACE_TROT = 4
    WALK = 5
    TROT = 6
    PACE = 7


# Leg ordering FR, FL, RR, RL (reference: `include/global_loco_opts.h:33-36`).
FR, FL, RR, RL = 0, 1, 2, 3

TOTAL_DOF = 18  # floating base (6) + 12 actuated joints
TOTAL_IN = 12   # actuated joints


@dataclasses.dataclass(frozen=True)
class LipConfig:
    """LIP template model (reference: `src/MPC_dist.cpp:99-127`)."""

    g: float = 9.81
    h: float = 0.29           # pendulum height
    ts: float = 0.043         # grid time length TSOPTTICK * 1e-3


@dataclasses.dataclass(frozen=True)
class SrbConfig:
    """Single-rigid-body template (reference: `src/forceUpdate.cpp:5-9`)."""

    mass: float = 12.453
    # Row-major body inertia tensor.
    inertia: tuple = (
        (0.01683993, 8.3902e-5, 0.000597679),
        (8.3902e-5, 0.056579028, 2.5134e-5),
        (0.000597679, 2.5134e-5, 0.064713601),
    )
    g: float = 9.81


@dataclasses.dataclass(frozen=True)
class MpcConfig:
    """Event-based NMPC settings (reference: `src/MPC_dist.cpp:81-454`,
    `include/global_loco_opts.h:8-15`, `include/dec_vars_constr_cost.h:59-60`).
    """

    lip: LipConfig = LipConfig()
    n_state: int = 4          # (x, xd, y, yd)
    n_input: int = 2          # COP (ux, uy)
    horizon: int = 4          # N = CTRL_HORIZ * NDOMAIN
    ndomain: int = 4          # grids per domain
    total_steps: int = 700    # TOTALSTEPNUM
    # Cost weights (reference: `src/MPC_dist.cpp:170-176`).
    q_weight: float = 3e2
    r_weight: float = 1e-1
    p_weight: float = 2e3
    slack_weight: float = 0.3e4
    # COP box half-width mu*h/sqrt(2) uses this mu (reference `:90,315`).
    mu: float = 0.7
    box_bound: float = 1e3    # +-1e3 state/input box (reference `:317-318`)
    goal: tuple = (10.0, 0.0)  # GOAL_X, GOAL_Y
    # CBF-NLP stage (reference: `include/dec_vars_constr_cost.h:262-317,401`).
    use_sqp: bool = True      # analogue of `use_snopt`
    sqp_iters: int = 4
    # Merit-function line search over the SCP step (SURVEY.md §7.4): guards
    # against full steps that worsen the true nonlinear CBF violation when
    # the linearization is poor (tight obstacle). Off by default — the
    # reference's SNOPT stage has its own globalization; this is the batched
    # equivalent, and the campaign runs fine without it in nominal fields.
    sqp_linesearch: bool = False
    merit_mu: float = 1e4     # exact-penalty weight (>> cost scale 2e3)
    cbf_eps: float = 1.9      # squared-distance safety margin epsilon
    vel_sat: float = 0.35     # +-0.35 m/s velocity saturation
    n_obstacles: int = 20     # NUMBER_OF_OBS
    fail_radius: float = 0.5  # failure detector (reference `src/MPC_dist.cpp:28`)
    # Solve the exactly-equivalent condensed QP (dynamics + COP equalities
    # eliminated in closed form, srbx.ocp.expansion): n 41->17, me 28->4.
    # Off by default to keep reference-shape semantics in golden tests; the
    # production/bench path turns it on.
    condensed: bool = False
    # Drop statically-redundant inequality rows (64 of 92): the +-box_bound
    # (1e3) state/input big-M rows, which can never activate at operating
    # scale (values O(10) vs bound 1e3), and the lambda<=1 rows, which are
    # implied by the sum(lambda)=1 equalities together with lambda>=0.
    # Shrinks every IPM iteration's G^T W G work ~3x; equivalence to the
    # full formulation is test-enforced. Off by default for
    # reference-shape parity.
    elide_box_rows: bool = False
    # With `condensed`, also eliminate one lambda per knot through its
    # sum(lambda)=1 simplex row (srbx.ocp.expansion): n 17->13, me 4->0 —
    # the fused kernel then skips the Schur-complement stage entirely.
    # Exact equivalence to the condensed formulation is test-enforced.
    elide_simplex: bool = False

    @property
    def max_contacts(self) -> int:
        return 4

    @property
    def n_lambda(self) -> int:
        """Padded lambda count: ndomain * max_contacts."""
        return self.ndomain * self.max_contacts

    @property
    def num_dec(self) -> int:
        """Padded decision count: n*N + m*N + ndomain*4 + slack."""
        return (
            self.n_state * self.horizon
            + self.n_input * self.horizon
            + self.n_lambda
            + 1
        )

    @property
    def n_eq(self) -> int:
        """Equality rows: n*N (dynamics) + m*N (COP) + m*N/2 (sum lambda)."""
        nN, mN = self.n_state * self.horizon, self.n_input * self.horizon
        return nN + mN + mN // 2

    @property
    def box_row_range(self) -> tuple:
        """(start, stop) of the +-box_bound state/input rows within the
        FULL inequality block (assembly order: COP-COM | box | lambda)."""
        nN, mN = self.n_state * self.horizon, self.n_input * self.horizon
        r1 = 2 * self.n_input * (self.horizon - 1)
        return r1, r1 + 2 * nN + 2 * mN

    @property
    def n_ineq(self) -> int:
        """Padded inequality rows: 2m(N-1) + 2nN + 2mN + 2*ndomain*4,
        minus the elided redundant rows when elide_box_rows is set
        (state/input boxes and the implied lambda<=1 block)."""
        nN, mN = self.n_state * self.horizon, self.n_input * self.horizon
        full = 2 * self.n_input * (self.horizon - 1) + 2 * nN + 2 * mN + 2 * self.n_lambda
        if self.elide_box_rows:
            full -= 2 * nN + 2 * mN + self.n_lambda
        return full

    @property
    def n_ineq_sqp(self) -> int:
        """SQP subproblem inequality rows: QP rows + 4 CBF + 2*8 velocity."""
        return self.n_ineq + 4 + 16


@dataclasses.dataclass(frozen=True)
class QpConfig:
    """Interior-point solver settings, matching iSWIFT semantics
    (reference: `optimization/iSWIFT/include/GlobalOptions.h:23-26`).
    """

    max_iters: int = 25
    abstol: float = 1e-6
    reltol: float = 1e-6
    # Static KKT regularization (the vendored LDL does dynamic regularization;
    # a fixed quasidefinite shift is the batched/lockstep equivalent).
    reg_primal: float = 1e-9
    reg_dual: float = 1e-9
    # Iterative-refinement rounds on every KKT solve against the
    # unregularized operator. Removes the O(δ) direction bias that the
    # static shifts introduce — without it, Ruiz-scaled low-level QPs stall
    # at a δ-limited stationarity floor ~4 Nm off the true optimum (found by
    # the iSWIFT cross-validation, docs/ROUND4.md). Two triangular-solve
    # rounds per Newton step; no extra factorizations.
    kkt_refine_iters: int = 2
    sigma_min: float = 1e-12
    step_frac: float = 0.99
    # Ruiz equilibration sweeps applied to (P, c, A, G) before the IPM and
    # undone on the returned iterates. 0 = off. Tightens f32 convergence
    # when cost/constraint scales span many orders (e.g. the 1e8 CLF
    # penalty next to unit friction rows).
    ruiz_iters: int = 0
    # Bound on every cumulative Ruiz scaling factor (0 = unbounded). Full
    # equilibration makes the LL QP's optimum weakly determined in scaled
    # coordinates (~Nm unscaled error at a converged scaled residual —
    # iSWIFT cross-validation, docs/ROUND4.md); a bounded scaling keeps the
    # factorization f32-feasible while preserving determinedness.
    ruiz_clip: float = 0.0


@dataclasses.dataclass(frozen=True)
class AdmmConfig:
    """OSQP-style ADMM solver settings (srbx.ops.qp_admm) — the factor-once
    solver family next to the IPM's QpConfig. Defaults follow OSQP's
    published defaults where they exist.
    """

    rho: float = 0.1
    # equality rows get a stiffer rho (OSQP scales eq rows by 1e3)
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6             # over-relaxation
    max_iters: int = 400
    check_every: int = 25          # residual test + rho update cadence
    adapt_rho: bool = True
    abstol: float = 1e-4
    reltol: float = 1e-4
    # ADMM is far more scale-sensitive than the IPM; OSQP always scales.
    ruiz_iters: int = 10


@dataclasses.dataclass(frozen=True)
class LowLevelConfig:
    """1 kHz QP torque controller (reference: `src/LowLevelCtrl.cpp:18-226`,
    param file `params/LL_w_CLF.txt` via `src/Parameters.cpp:95-133`).
    """

    # Values from the campaign's param file `params/LL_w_CLF.txt` (ordering
    # documented in `src/Parameters.cpp:95-116`).
    mu: float = 0.7
    kp: float = 400.0
    kd: float = 40.0
    use_clf: bool = False
    tau_pen: float = 1.0
    df_pen: float = 0.1
    aux_pen: float = 1e6
    clf_pen: float = 1e8
    aux_max: float = 100.0
    clf_eps: float = 0.8
    # Per-joint torque saturation (hip, thigh, calf),
    # `include/LowLevelCtrl.hpp:36`: sat = {22, 50, 50}.
    sat: tuple = (22.0, 50.0, 50.0)
    ctrl_hz: int = 1000


@dataclasses.dataclass(frozen=True)
class MotionConfig:
    """Gait scheduling / swing parameters (reference: `src/MotionPlanner.cpp`,
    `params/Walking_Params.txt` ordering in `src/Parameters.cpp:135-166`).
    """

    # `params/Walking_params.txt` via `src/Parameters.cpp:149-166`.
    stand_height: float = 0.28
    swing_height: float = 0.125
    # POSE teach-pendant axis (0/1/2 = x/y/z, 3/4/5 = roll/pitch/yaw)
    pose_type: int = 0
    fwd_speed: float = 0.0
    lat_speed: float = 0.0
    yaw_speed: float = 0.0
    # TROT domain length in ticks = TSOPTTICK ms * 4 grids
    # (reference: `src/MotionPlanner.cpp:230`).
    ts_opt_tick: int = 43
    grids_per_domain: int = 4
    max_phase: float = 1.05   # stale-solution clamp (`src/LocoWrapper.cpp:45`)
    # Swing-foot touchdown aim point. The reference targets toeOffset=0.01 m
    # ABOVE ground but, in sim mode, shifts the estimated base height by
    # Z_TOE_OFFSET=0.02 (`include/global_loco_opts.h:58-62`), so the real aim
    # is 1 cm BELOW ground — this guarantees touchdown (and hence the
    # contact-triggered domain switch) before the swing phase ends. We apply
    # the net offset directly.
    toe_offset_z: float = -0.01

    @property
    def trot_dom_ticks(self) -> int:
        return self.ts_opt_tick * self.grids_per_domain


@dataclasses.dataclass(frozen=True)
class RefPlanConfig:
    """APF reference planner (reference: `src/MPC_dist.cpp:930-1104` (4-agent)
    and `src/LocoWrapper.cpp:254-432` (2-agent))."""

    n_agents: int = 2
    n_obstacles: int = 20
    # (alpha, eta, dmin, epsilon_lj, sigma_lj) — 2-agent variant defaults
    # from `src/LocoWrapper.cpp:256-257`; 4-agent variant uses
    # (150, 400, 1.0, 60, 1.0) with a 1000-iter ramp-up (`src/MPC_dist.cpp:932-933`).
    alpha: float = 100.0
    eta: float = 200.0
    dmin: float = 2.0
    lj_epsilon: float = 1.0
    lj_sigma: float = 0.75
    ramp_up_iters: int = 0
    loop_size: int = 100_000
    downsample: int = 40
    goal: tuple = (10.0, 0.0)
    # Double-integrator discretization constants (reference
    # `src/LocoWrapper.cpp:265-279` / `src/MPC_dist.cpp:942-960`): these are
    # exp(-c/m * Ts)-style entries; we recompute them from (c, m, Ts) —
    # see srbx.refplan.discretize_apf — instead of hard-coding.
    damping_c: float = 625.0
    mass_m: float = 8.0
    ts: float = 0.043 / 10.0
    # Literal hard-coded discrete matrices (reference-matrix mode): when
    # non-empty, generate() uses these VERBATIM instead of the exact-ZOH
    # closed form — (ad_pos_vel, ad_vel) and (bd_pos, bd_vel) as written at
    # `src/MPC_dist.cpp:945-960` / `src/LocoWrapper.cpp:265-279`. The
    # reference's Bd position coupling differs ~1.4% from exact ZOH; this
    # mode reproduces its checked-in Sim_Outputs logs bit-for-bit
    # (scripts/reproduce_hlpath.py, tests/test_refplan.py).
    ad_ref: tuple = ()
    bd_ref: tuple = ()


@dataclasses.dataclass(frozen=True)
class TeamConfig:
    """Multi-agent team layout."""

    n_agents: int = 2
    n_obstacles: int = 20
    goal: tuple = (10.0, 0.0)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level bundle."""

    mpc: MpcConfig = MpcConfig()
    qp: QpConfig = QpConfig()
    lowlevel: LowLevelConfig = LowLevelConfig()
    motion: MotionConfig = MotionConfig()
    refplan: RefPlanConfig = RefPlanConfig()
    team: TeamConfig = TeamConfig()
    srb: SrbConfig = SrbConfig()


DEFAULT = EngineConfig()
