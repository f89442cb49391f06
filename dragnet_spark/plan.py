"""Plan-time computation: DM trial lists, per-channel delay tables,
max delay, SK thresholds, block-loop geometry.

This is the rebuild's analog of the reference's logical->physical
planning stage (``dragnet.cu:104-229``).  Everything here runs on the
Spark driver in plain NumPy/Python and is broadcast to executors as a
small immutable object — no Spark computation happens at plan time.

Dedispersion formula provenance: the reference delegates the delay
table, DM-list generation and max-delay to the external public
``dedisp`` GPU library (Barsdell, Bailes, Barnes & Fluke 2012, MNRAS
422, 379; call sites ``dragnet.cu:116,123-129,182``).  The formulas
below transcribe that library's published algorithm; where the exact
float rounding of the GPU kernel is not reproducible on CPU we pin an
explicit choice and document it (marked PINNED).

SK thresholds transcribe ``sk_threshold3`` (``skz/skz.c:25-204``;
Nita & Gary 2007/2010).  scipy is unavailable in this environment, so
the complex log-gamma (Lanczos) and the semi-infinite adaptive
Gauss-Kronrod integration (GSL ``qagiu`` analog) are implemented here.
"""

from __future__ import annotations

import cmath
import math
from dataclasses import dataclass, field

import numpy as np

from .params import Header, MaskSpec, RunConfig, ranges_to_ivect

# Dispersion constant, MHz^2 pc^-1 cm^3 s.  PINNED to the value used by
# the fixture pulse injector (FIXTURES.md §1); the public dedisp library
# uses 4.15e3 in its delay table and notes 4.148741601e3 as the
# higher-precision value.
KDM = 4.148808e3


# --------------------------------------------------------------------------
# DM trial lists (D2a/D2b)
# --------------------------------------------------------------------------

def linear_dm_list(dm_start: float, dm_end: float, dm_step: float) -> np.ndarray:
    """Linear DM trials (``dragnet.cu:130-143``):
    ``dm_count = ceil((end-start)/step) + 1; dm[i] = start + step*i``
    in float32 (``dedisp_float``)."""
    dm_count = int(math.ceil((dm_end - dm_start) / dm_step)) + 1
    i = np.arange(dm_count, dtype=np.float32)
    return (np.float32(dm_start) + np.float32(dm_step) * i).astype(np.float32)


def optimal_dm_list(dm_start: float, dm_end: float, dt: float, ti: float,
                    f0: float, df: float, nchans: int, tol: float) -> np.ndarray:
    """Optimal (smearing-bounded) DM trials — transcription of the public
    dedisp library's ``generate_dm_list`` (Lina Levin's recurrence; the
    reference calls it at ``dragnet.cu:125``).

    Args mirror dedisp: ``dt`` sample time in seconds, ``ti`` intrinsic
    pulse width in microseconds, ``f0``/``df`` = fch1/foff in MHz,
    ``tol`` the smearing tolerance.  Computation in float64, list stored
    float32, matching dedisp ("computation done in double precision").
    """
    dt_us = dt * 1e6
    # NB (nchans // 2): dedisp's C `nchans/2` is integer division.
    f = (f0 + ((nchans // 2) - 0.5) * df) * 1e-3         # band-centre, GHz
    tol2 = tol * tol
    a = 8.3 * df / (f * f * f)                           # us smear / (DM unit)
    a2 = a * a
    b2 = a2 * (nchans * nchans / 16.0)
    c = (dt_us * dt_us + ti * ti) * (tol2 - 1.0)
    dms = [float(dm_start)]
    while dms[-1] < dm_end:
        prev = dms[-1]
        prev2 = prev * prev
        k = c + tol2 * a2 * prev2
        dms.append((b2 * prev + math.sqrt(-a2 * b2 * prev2 + (a2 + b2) * k))
                   / (a2 + b2))
    return np.asarray(dms, dtype=np.float32)


def dt_factor_list(dmlist: np.ndarray, dt: float, ti: float, f0: float,
                   df: float, nchans: int, tol: float) -> np.ndarray:
    """Per-DM adaptive time-scrunch factors (D5,
    ``dedisp_enable_adaptive_dt``/``dedisp_get_dt_factors``, called at
    ``dragnet.cu:146-153,185``).

    The exact formula lives in the external dedisp library (SURVEY.md
    §2.6 ⚠); PINNED semantics here, from the same smearing model as
    :func:`optimal_dm_list`: with a = 8.3*df/f**3 (us channel smearing
    per DM unit at band centre) and smear(d) = sqrt(ti^2 + (a*d)^2),
    factor(d) = the largest power of two f with
    f * dt_us <= tol * max(dt_us, smear(d)).  factor(0) == 1 and
    factors are nondecreasing in DM.
    """
    dt_us = dt * 1e6
    f = (f0 + ((nchans // 2) - 0.5) * df) * 1e-3   # C integer division
    a = 8.3 * df / (f * f * f)
    out = np.ones(len(dmlist), dtype=np.int64)
    for i, d in enumerate(np.asarray(dmlist, dtype=np.float64)):
        smear = math.sqrt(ti * ti + (a * d) * (a * d))
        budget = tol * max(dt_us, smear)
        fct = 1
        while 2 * fct * dt_us <= budget:
            fct *= 2
        out[i] = fct
    return out


# --------------------------------------------------------------------------
# Delay table + max delay (D1/D4)
# --------------------------------------------------------------------------

def delay_table(nchan: int, tsamp: float, fch1: float, foff: float) -> np.ndarray:
    """Per-channel delay (samples per unit DM), float64:
    ``delay[c] = KDM * ((fch1 + c*foff)^-2 - fch1^-2) / tsamp``
    (dedisp ``generate_delay_table``; plan creation ``dragnet.cu:116``).
    ``foff < 0`` so delays are >= 0 and increase towards channel nchan-1
    (lowest frequency)."""
    c = np.arange(nchan, dtype=np.float64)
    f = fch1 + c * foff
    return KDM * (f ** -2.0 - fch1 ** -2.0) / tsamp


def delay_samples(dmlist: np.ndarray, dtable: np.ndarray) -> np.ndarray:
    """Integer sample delays, shape (ndm, nchan).  PINNED rounding:
    float64 product, round-half-even (``np.rint``) — the dedisp GPU
    kernel uses CUDA ``__float2uint_rn`` (also round-to-nearest-even,
    but on a float32 product)."""
    d = np.rint(dmlist.astype(np.float64)[:, None] * dtable[None, :])
    return d.astype(np.int64)


# --------------------------------------------------------------------------
# SK thresholds (F3) — transcription of skz.c:25-204 (sk_threshold3)
# --------------------------------------------------------------------------

_LANCZOS_G = 7.0
_LANCZOS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def lngamma_complex(z: complex) -> complex:
    """log Gamma(z) for complex z via the Lanczos approximation
    (g=7, n=9; public coefficients).  Stands in for GSL
    ``gsl_sf_lngamma_complex_e`` (``skz.c:106``)."""
    if z.real < 0.5:
        # Reflection formula
        return (math.log(math.pi)
                - cmath.log(cmath.sin(math.pi * z))
                - lngamma_complex(1.0 - z))
    z = z - 1.0
    a = complex(_LANCZOS[0], 0.0)
    t = z + _LANCZOS_G + 0.5
    for i in range(1, len(_LANCZOS)):
        a += _LANCZOS[i] / (z + i)
    return (0.5 * math.log(2.0 * math.pi)
            + (z + 0.5) * cmath.log(t) - t + cmath.log(a))


def lnbeta(a: float, b: float) -> float:
    """ln B(a,b) (GSL ``gsl_sf_lnbeta``, ``skz.c:136``)."""
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


# Gauss-Kronrod 15(7) nodes/weights (public QUADPACK constants).
_GK_X = (0.991455371120813, 0.949107912342759, 0.864864423359769,
         0.741531185599394, 0.586087235467691, 0.405845151377397,
         0.207784955007898, 0.0)
_GK_WK = (0.022935322010529, 0.063092092629979, 0.104790010322250,
          0.140653259715525, 0.169004726639267, 0.190350578064785,
          0.204432940075298, 0.209482141084728)
_GK_WG = (0.129484966168870, 0.279705391489277,
          0.381830050505119, 0.417959183673469)


def _gk15(f, lo: float, hi: float) -> tuple[float, float]:
    """One Gauss-Kronrod 15/7 panel: (K15 estimate, |K15-G7| error)."""
    c = 0.5 * (lo + hi)
    h = 0.5 * (hi - lo)
    fk = 0.0
    fg = 0.0
    for i, x in enumerate(_GK_X):
        if x == 0.0:
            v = f(c)
            fk += _GK_WK[i] * v
            fg += _GK_WG[3] * v
        else:
            v1 = f(c - h * x)
            v2 = f(c + h * x)
            fk += _GK_WK[i] * (v1 + v2)
            if i % 2 == 1:                      # K15 odd indices = G7 nodes
                fg += _GK_WG[i // 2] * (v1 + v2)
    return fk * h, abs((fk - fg) * h)


def integrate_qagiu(f, a: float, epsabs: float) -> float:
    """Adaptive integral of f over [a, inf) to absolute tolerance
    ``epsabs`` — stands in for GSL ``gsl_integration_qagiu``
    (``skz.c:166,187``).  Uses the QUADPACK variable change
    ``x = a + (1-t)/t`` onto (0,1] then adaptive GK15 bisection."""

    def g(t: float) -> float:
        x = a + (1.0 - t) / t
        return f(x) / (t * t)

    # Stack of (lo, hi, estimate, err)
    est, err = _gk15(g, 1e-300, 1.0)
    stack = [(1e-300, 1.0, est, err)]
    total = est
    total_err = err
    for _ in range(2000):
        if total_err <= max(epsabs, 1e-14 * abs(total)):
            break
        # Split the worst panel
        stack.sort(key=lambda s: s[3])
        lo, hi, e0, r0 = stack.pop()
        mid = 0.5 * (lo + hi)
        e1, r1 = _gk15(g, lo, mid)
        e2, r2 = _gk15(g, mid, hi)
        total += (e1 + e2) - e0
        total_err += (r1 + r2) - r0
        stack.append((lo, mid, e1, r1))
        stack.append((mid, hi, e2, r2))
    return total


def sk_threshold3(m_int: int, s: float, nd: float) -> tuple[float, float, int]:
    """Transcription of ``sk_threshold3`` (``skz/skz.c:25-204``).

    Returns (sk_lo, sk_hi, status).  status!=0 -> k<0 failure path
    (``skz.c:81-87``, limits zeroed).
    Called by the reference at ``dragnet.cu:226`` with
    (mskz, sskz, nskz).
    """
    subdiv_lim = 10          # noqa: F841 — GSL workspace size; our adaptive
    #                          integrator subdivides as needed.
    ptol = 0.0001
    max_its = 1000

    m = float(m_int)
    nn = nd * nd
    nn1 = nd * (nd + 1)
    m1 = m - 1
    mn = m * nd
    mn23 = (mn + 2) * (mn + 3)
    mn45 = (mn + 4) * (mn + 5)
    u2 = 2 * nn1 * m * m / m1 / mn23
    br = mn * (nd + 4) - 5 * nd - 2
    b1 = 8 / nn1 / m1 * mn23 / mn45 / mn45 * br * br
    b2 = (3 / nn1 / m1 * mn23 / mn45 / (mn + 6) / (mn + 7)
          * (mn * mn * mn * (nd + 1) + mn * mn * (3 * nn + 68 * nd + 125)
             - mn * (93 * nn + 245 * nd + 32) + 84 * nn + 48 * nd + 24))

    k = b1 * (b2 + 3) * (b2 + 3) / 4 / (4 * b2 - 3 * b1) / (2 * b2 - 3 * b1 - 6)
    if k < 0:
        return 0.0, 0.0, 1

    if 0 <= k <= 1:
        # Pearson IV (skz.c:92-116)
        u1 = 1.0
        r = 6 * (b2 - b1 - 1) / (2 * b2 - 3 * b1 - 6)
        mvc0 = (r + 2) / 2
        mvc1 = r * (2 - r) * math.sqrt(b1 / (16 * (r - 1) - b1 * (r - 2) * (r - 2)))
        a = math.sqrt(u2 * (16 * (r - 1) - b1 * (r - 2) * (r - 2))) / 4
        l = u1 - (r - 2) * math.sqrt(u2 * b1) / 4
        delta = 0.0
        re_ln_gamma = lngamma_complex(complex(mvc0, mvc1 / 2)).real
        mvc2 = (2 * re_ln_gamma - math.lgamma(2 * mvc0 - 1)
                - math.log(2) * (2 - 2 * mvc0) - math.log(math.pi))

        def pdf(x: float) -> float:           # pearson4, skz.c:9-14
            return math.exp(mvc2 - mvc0 * math.log(1 + x * x)
                            - mvc1 * math.atan(x))
    else:
        # Pearson VI (skz.c:119-141)
        a = 1.0
        l = 0.0
        u23 = m1 / m * mn45 / 4 / br
        u223 = nn1 * m / mn23 * mn45 / 2 / br
        rt = 4 + math.sqrt(16 + (4 + 1 / u2) * b1)
        alpha = u23 + u223 * (((u223 * 8 - 1) * u23 + 1) * rt + 4) - 1
        beta = 3 + 2 * rt / b1
        abc0 = alpha - 1
        abc1 = alpha + beta
        delta = 1 - alpha / (beta - 1)
        abc2 = -lnbeta(alpha, beta)

        def pdf(x: float) -> float:           # pearson6, skz.c:18-23
            if x <= 0.0:
                return 0.0
            return math.exp(abc2 + abc0 * math.log(x) - abc1 * math.log(x + 1))

    # Common steps (skz.c:143-196)
    p_frac = math.erf(s / math.sqrt(2))
    ptol_abs = ptol * (1 - p_frac) / 2
    sig = math.sqrt(u2)

    sk_lims = [0.0, 0.0]
    for ul in (-1, 1):
        p_thresh = (1 - ul * p_frac) / 2
        x_thresh = (1 - l) / a - delta + ul * s * sig
        if x_thresh < 0 and k > 1:
            x_thresh = 0.0
        fill_lo = fill_hi = 0
        x_lo = x_hi = x_thresh
        n = 0
        while (fill_lo == 0 or fill_hi == 0) and n < max_its:
            p = integrate_qagiu(pdf, x_thresh, ptol_abs)
            if p > p_thresh:
                x_lo = x_thresh
                x_thresh += sig
                fill_lo = 1
            else:
                x_hi = x_thresh
                x_thresh -= sig
                fill_hi = 1
            n += 1
        n = 0
        while n < max_its:
            x_thresh = (x_lo + x_hi) / 2
            p = integrate_qagiu(pdf, x_thresh, ptol_abs)
            if p > p_thresh:
                x_lo = x_thresh
            else:
                x_hi = x_thresh
            n += 1
            if abs(p - p_thresh) <= ptol_abs:
                break
        sk_lims[(ul + 1) // 2] = x_thresh * a + l + delta

    return sk_lims[0], sk_lims[1], 0


# --------------------------------------------------------------------------
# The assembled plan
# --------------------------------------------------------------------------

@dataclass
class DedispPlan:
    """Immutable per-(header, config) execution plan — the rebuild's
    ``dedisp_plan`` + derived scalars (``dragnet.cu:104-229``).  Small
    (a few KB): broadcast-friendly."""

    header: Header
    cfg: RunConfig
    tsamp_dec: float                  # header.tsamp * ndec  (dragnet.cu:73)
    nsamp_dec: int                    # header.nsamp // ndec (dragnet.cu:74)
    blocksize: int                    # RAW samples per block (see note)
    dmlist: np.ndarray                # float32, ndm
    delays: np.ndarray                # int64 (ndm, nchan)
    max_delay: int                    # decimated samples
    nsamp_computed: int               # nsamp_dec - max_delay
    zap_channels: np.ndarray          # int, user zap list (raw indices)
    dt_factors: np.ndarray = field(
        default_factory=lambda: np.array([], np.int64))  # D5, per DM
    sk_lims: tuple[float, float] = (0.0, 0.0)
    sk_mint: int = 0                  # ceil(blocksize / mskz), dragnet.cu:220
    mask: MaskSpec | None = None
    # inverse_mask-applied arrays (high-first channel indices), see kernels
    mask_zap_chans: np.ndarray = field(default_factory=lambda: np.array([], int))
    mask_chans_per_int: list[np.ndarray] = field(default_factory=list)
    mask_zap_ints: np.ndarray = field(default_factory=lambda: np.array([], int))
    padvals: np.ndarray = field(default_factory=lambda: np.array([], np.float32))


def build_plan(header: Header, cfg: RunConfig,
               mask: MaskSpec | None = None) -> DedispPlan:
    """Assemble the plan, mirroring ``dragnet.cu:72-229``.

    Unit note (deviation, documented): the reference divides
    ``h.nsamp`` by ndec (``dragnet.cu:74``) but its block loop and
    reader then mix decimated and raw units (``dragnet.cu:241`` vs
    ``sigproc.cxx:137``), which for ndec>1 under-reads the file and
    reads past the input buffer (undefined behaviour).  We define
    ``blocksize`` in RAW samples with the constraints
    ``blocksize % ndec == 0`` and ``blocksize//ndec > max_delay``;
    for ndec==1 this is bit-identical to the reference.
    """
    if header.foff >= 0:
        # delay_table/dedisperse assume the SIGPROC high-first
        # convention (fch1 = highest frequency, foff < 0).  A legal
        # low-first .fil would otherwise produce negative delays and
        # crash with an inscrutable broadcast error deep inside
        # mapInPandas; fail at plan time with the real cause.  (LOFAR
        # low-first inputs are converted at ingest: lofar_hdf5 emits
        # foff < 0 and the channel REVERSAL is handled separately via
        # header.chan_order.)
        raise ValueError(
            f"foff must be negative (fch1 = highest frequency, "
            f"SIGPROC high-first convention); got {header.foff}")
    ndec = cfg.ndec
    tsamp_dec = header.tsamp * ndec
    nsamp_dec = header.nsamp // ndec

    blocksize = cfg.blocksize
    if blocksize <= 0 or blocksize > header.nsamp:   # dragnet.cu:104 (raw units)
        blocksize = header.nsamp
    if blocksize % ndec != 0:
        raise ValueError(f"blocksize {blocksize} not a multiple of ndec {ndec}")

    # DM list (dragnet.cu:123-143); delays computed on the decimated grid
    # (tsamp already multiplied, dragnet.cu:72-74 precede plan creation).
    if cfg.dm_step == 0:
        dmlist = optimal_dm_list(cfg.dm_start, cfg.dm_end, tsamp_dec,
                                 cfg.pulse_width, header.fch1, header.foff,
                                 header.nchan, cfg.dm_tol)
    else:
        dmlist = linear_dm_list(cfg.dm_start, cfg.dm_end, cfg.dm_step)

    dtable = delay_table(header.nchan, tsamp_dec, header.fch1, header.foff)
    delays = delay_samples(dmlist, dtable)
    max_delay = int(delays.max())
    nsamp_computed = nsamp_dec - max_delay

    if blocksize // ndec <= max_delay:               # dragnet.cu:194-197
        raise ValueError(
            f"blocksize ({blocksize}/{ndec}) <= max DM delay ({max_delay})")

    if cfg.use_dt:
        # PINNED semantics: the scrunch (D5) applies to the FINAL
        # assembled series (run_pipeline / chunked reassembly), never
        # per block — so any blocksize is well-defined here, unlike the
        # reference where per-block tails of a partial scrunch group
        # are undefined (use_dt is off-by-default there, dragnet.cu:56).
        dt_factors = dt_factor_list(dmlist, tsamp_dec, cfg.pulse_width,
                                    header.fch1, header.foff, header.nchan,
                                    cfg.dm_tol)
    else:
        dt_factors = np.ones(len(dmlist), dtype=np.int64)

    zap = np.asarray(
        ranges_to_ivect(cfg.zapchan, 0, header.nchan - 1) if cfg.zapchan else [],
        dtype=np.int64)

    sk_lims = (0.0, 0.0)
    sk_mint = 0
    if cfg.use_skz:
        sk_mint = int(math.ceil(blocksize / float(cfg.mskz)))  # dragnet.cu:220
        lo, hi, _status = sk_threshold3(cfg.mskz, cfg.sskz, float(cfg.nskz))
        sk_lims = (lo, hi)

    plan = DedispPlan(
        header=header, cfg=cfg, tsamp_dec=tsamp_dec, nsamp_dec=nsamp_dec,
        blocksize=blocksize, dmlist=dmlist, delays=delays,
        max_delay=max_delay, nsamp_computed=nsamp_computed,
        zap_channels=zap, dt_factors=dt_factors, sk_lims=sk_lims,
        sk_mint=sk_mint, mask=mask)

    if mask is not None and cfg.use_mask:
        from .kernels import inverse_mask     # local import: avoid cycle
        zc, cpi, pv = inverse_mask(mask)
        plan.mask_zap_chans = zc
        plan.mask_chans_per_int = cpi
        plan.mask_zap_ints = np.asarray(mask.zap_ints, dtype=np.int64)
        plan.padvals = pv
    return plan
