"""Plan-time differential fuzz: the optimal-DM generator (D2a, Levin
recurrence) and the adaptive-dt factors (D5) at RANDOM physical
parameters.

The fixed ``dedisperse_optimal_dm`` driver query verifies the Levin
recurrence (``plan.optimal_dm_list``, the public dedisp
``generate_dm_list`` algorithm the reference calls at
``dragnet.cu:125``) against a DuckDB recursive CTE — but only at the
tiny-corpus parameter point (fch1=151, foff=-0.1953125, nchans=16,
tsamp=2ms, tol=1.25, ti=4us, [0, 50]).  This sweep draws random
(f0, df, nchans, dt, ti, tol, dm_start) tuples across the physically
sensible space (L-band to LOFAR-ish bands, us..ms sampling), picks
``dm_end`` strictly between two recurrence points so the termination
boundary itself is exercised, and requires the float32-stored trial
list to match DuckDB's recursive CTE bit-for-bit.

Exactness contract (same as the fixed oracle): the recurrence
constants are pre-multiplied in Python and inlined via ``repr`` (exact
shortest round-trip decimal -> the identical double in DuckDB), and
the SQL recurrence applies the identical operation order, so every
intermediate is the same IEEE double on both sides — no tolerance.

``dt_factor_list`` (D5) has no SQL analog; it is checked against its
complete maximality spec instead: each factor is the unique power of
two with ``fct*dt_us <= tol*max(dt_us, smear(dm)) < 2*fct*dt_us``,
factors are nondecreasing in DM, and the DM=0 factor depends only on
the intrinsic width.

Domain note (found by this sweep's first wide run): with unphysically
small channel smearing the recurrence's steps grow without bound, and
past DM ~1e38 the float32 store overflows to inf (exactly as the
reference's C ``dedisp_float`` would) while past smear ~1e20 us the
dt-factor doubling loop exceeds int64.  Physical dispersion measures
top out around 1e5 pc/cm^3, so the sweep truncates every draw to that
domain rather than pinning reference-matching overflow behavior.

Knobs: DRAGNET_FUZZ_PLAN_SEEDS / DRAGNET_FUZZ_PLAN_BASE.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np

from dragnet_spark.plan import dt_factor_list, optimal_dm_list

N_SEEDS = int(os.environ.get("DRAGNET_FUZZ_PLAN_SEEDS", "20"))
SEED_BASE = int(os.environ.get("DRAGNET_FUZZ_PLAN_BASE", "0"))
MIN_EXECUTED = max(1, (N_SEEDS * 7) // 12)
DM_CAP = 1e5                 # physical DM ceiling (pc/cm^3), see above


def _draw_params(seed: int):
    """One deterministic physical-parameter draw, or None when the
    draw is outside the sensible space (non-positive band centre)."""
    rng = np.random.default_rng([20260819, 2, seed])
    nchans = int(rng.choice([16, 32, 64, 128, 256, 512, 1024, 2048, 4096]))
    f0 = float(rng.uniform(100.0, 1500.0))          # fch1, MHz
    bw = float(rng.uniform(1.0, min(400.0, 0.9 * f0)))
    df = -bw / nchans                               # foff < 0, MHz
    # band centre (GHz) must stay positive: bw < f0 guarantees it
    if (f0 + ((nchans // 2) - 0.5) * df) <= 0:
        return None
    dt = float(10.0 ** rng.uniform(-5.0, math.log10(5e-3)))   # sec
    ti = float(10.0 ** rng.uniform(-1.0, math.log10(500.0)))  # us
    tol = float(rng.uniform(1.01, 2.5))
    dm_start = float(rng.choice([0.0, rng.uniform(0.0, 10.0)]))
    return nchans, f0, df, dt, ti, tol, dm_start, rng


def _consts(dm_start, dt, ti, f0, df, nchans, tol):
    """Pre-multiplied recurrence constants, the IDENTICAL operation
    order as plan.optimal_dm_list (and flagship_oracle._levin_constants
    — which is pinned to the tiny corpus; this is its parameterized
    twin for the fuzz)."""
    dt_us = dt * 1e6
    f = (f0 + ((nchans // 2) - 0.5) * df) * 1e-3
    tol2 = tol * tol
    a = 8.3 * df / (f * f * f)
    a2 = a * a
    b2 = a2 * (nchans * nchans / 16.0)
    c = (dt_us * dt_us + ti * ti) * (tol2 - 1.0)
    return {"b2": b2, "na2b2": -a2 * b2, "a2pb2": a2 + b2,
            "c": c, "t2a2": tol2 * a2, "dm_start": dm_start}


def _recur(k: dict, n: int) -> list[float]:
    """n recurrence points from dm_start, via the pre-multiplied
    constants (used only to PICK a bounded dm_end — correctness is
    judged production-vs-DuckDB below)."""
    dms = [k["dm_start"]]
    while len(dms) < n:
        prev = dms[-1]
        p2 = prev * prev
        nxt = (k["b2"] * prev
               + math.sqrt(k["na2b2"] * p2
                           + k["a2pb2"] * (k["c"] + k["t2a2"] * p2))) \
            / k["a2pb2"]
        if not (nxt > prev and math.isfinite(nxt) and nxt <= DM_CAP):
            return dms       # degenerate or unphysical; caller truncates
        dms.append(nxt)
    return dms


def test_random_levin_dm_lists_match_duckdb():
    con = duckdb.connect()
    executed = 0
    for seed in range(SEED_BASE, SEED_BASE + N_SEEDS):
        drawn = _draw_params(seed)
        if drawn is None:
            continue
        nchans, f0, df, dt, ti, tol, dm_start, rng = drawn
        k = _consts(dm_start, dt, ti, f0, df, nchans, tol)
        n_target = int(rng.integers(3, 400))
        pts = _recur(k, n_target + 1)
        if len(pts) < 3:
            continue
        # dm_end strictly between two points: the expected list is
        # pts[0..cut+1] (the loop appends the first point >= dm_end)
        cut = int(rng.integers(1, len(pts) - 1))
        dm_end = (pts[cut - 1] + pts[cut]) / 2.0
        if not (pts[cut - 1] < dm_end < pts[cut]):
            continue         # adjacent points too close to separate

        got = optimal_dm_list(dm_start, dm_end, dt, ti, f0, df, nchans, tol)
        label = (f"seed {seed} (nchans={nchans}, f0={f0:.3f}, "
                 f"df={df:.6g}, dt={dt:.3g}, ti={ti:.3g}, tol={tol:.3f}, "
                 f"[{dm_start:.3f}, {dm_end:.6f}], n={len(got)})")

        sql = f"""WITH RECURSIVE dms(dm) AS (
  SELECT CAST({dm_start!r} AS DOUBLE)
  UNION ALL
  SELECT ({k['b2']!r} * dm
          + SQRT({k['na2b2']!r} * (dm * dm)
                 + {k['a2pb2']!r} * ({k['c']!r} + {k['t2a2']!r} * (dm * dm))))
         / {k['a2pb2']!r}
  FROM dms WHERE dm < {dm_end!r}
)
SELECT CAST(dm AS FLOAT) AS dmf FROM dms ORDER BY dm
"""
        want = np.asarray([r[0] for r in con.execute(sql).fetchall()],
                          dtype=np.float32)
        assert len(got) == cut + 1 == len(want), label
        mism = np.flatnonzero(got != want)
        assert mism.size == 0, \
            f"{label}: diverged at {mism[:4]}: " \
            f"{got[mism[:4]]} vs {want[mism[:4]]}"
        executed += 1
    assert executed >= MIN_EXECUTED, \
        f"only {executed} of {N_SEEDS} plan draws executed — " \
        "widen the draw space"


def test_random_dt_factors_satisfy_maximality_spec():
    executed = 0
    for seed in range(SEED_BASE, SEED_BASE + N_SEEDS):
        drawn = _draw_params(seed)
        if drawn is None:
            continue
        nchans, f0, df, dt, ti, tol, dm_start, rng = drawn
        k = _consts(dm_start, dt, ti, f0, df, nchans, tol)
        pts = _recur(k, int(rng.integers(3, 200)))
        if len(pts) < 3:
            continue
        dml = np.asarray(pts, dtype=np.float32)
        fcts = dt_factor_list(dml, dt, ti, f0, df, nchans, tol)
        label = f"seed {seed} (nchans={nchans}, tol={tol:.3f})"

        dt_us = dt * 1e6
        f = (f0 + ((nchans // 2) - 0.5) * df) * 1e-3
        a = 8.3 * df / (f * f * f)
        assert len(fcts) == len(dml), label
        for d, fct in zip(np.asarray(dml, dtype=np.float64), fcts):
            smear = math.sqrt(ti * ti + (a * d) * (a * d))
            budget = tol * max(dt_us, smear)
            # complete spec: the unique power of two in (budget/2, budget]
            assert fct >= 1 and (fct & (fct - 1)) == 0, label
            assert fct * dt_us <= budget < 2 * fct * dt_us, \
                f"{label}: dm={d}: fct={fct}, budget/dt={budget / dt_us}"
        assert np.all(np.diff(fcts) >= 0), f"{label}: factors decreased"
        # DM=0 factor depends only on the intrinsic width
        f0ct = dt_factor_list(np.zeros(1, np.float32), dt, ti, f0, df,
                              nchans, tol)[0]
        budget0 = tol * max(dt_us, ti)
        assert f0ct * dt_us <= budget0 < 2 * f0ct * dt_us, label
        executed += 1
    assert executed >= MIN_EXECUTED, \
        f"only {executed} of {N_SEEDS} dt-factor draws executed — " \
        "widen the draw space"
