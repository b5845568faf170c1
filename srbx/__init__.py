"""srbx — TPU-native distributed CBF-NMPC engine for quadruped teams.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the HDSRL
SRB-CBF-NMPC controller stack (IEEE RA-L 2025): event-based nonlinear MPC on a
LIP/SRB template model for teams of quadrupeds with distributed discrete-CBF
safety constraints, an APF high-level reference planner, a 1 kHz whole-body
QP low-level controller, and batched closed-loop evaluation.

Design stance (vs the reference C++ OO stack at /root/reference):
  * every controller stage is a pure function over pytrees — `vmap` over
    agents and scenarios, `shard_map` over device meshes;
  * the per-cycle NLP is an SQP loop whose QP subproblems run as batched
    interior-point solves (JAX reference path + Pallas kernel hot path),
    replacing iSWIFT + ifopt/SNOPT;
  * event-based domain switching becomes masked fixed-shape computation;
  * neighbor-state exchange lowers to XLA collectives instead of
    shared-memory stores / LCM / UDP.

Subpackage map (mirrors SURVEY.md §7 build plan):
  srbx.config      typed configs (replaces params/*.txt + macros)
  srbx.ops         batched QP/IPM, Bezier, small linalg, Pallas kernels
  srbx.models      LIP + SRB templates, generic rigid-body algorithms, A1
  srbx.gait        gait cycle index tables, phase machinery
  srbx.refplan     APF multi-agent reference planner
  srbx.ocp         NMPC QP assembly (cost/eq/ineq, footholds, COP)
  srbx.sqp         CBF-NMPC SQP loop (replaces ifopt+SNOPT)
  srbx.mpc         per-cycle NMPC solve + Bezier fit (MPC_dist equivalent)
  srbx.mpc_srb     convex SRB-MPC (the legacy FastMPC reduced-model family)
  srbx.lowlevel    virtual constraints + 1 kHz QP torque controller
  srbx.estimation  contact estimator, Kalman filter, kinematic odometry
  srbx.sim         batched template / whole-body simulators
  srbx.eval        success-rate campaigns, failure detection, benchmarks
  srbx.parallel    meshes, shardings, multi-agent collectives
  srbx.io          structured logging off the hot path
  srbx.runtime     ctypes bindings to the native C++ host runtime
"""

__version__ = "0.1.0"
