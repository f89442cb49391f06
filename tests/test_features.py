"""Per-operator unit tests: statistics, mask machinery, clipper, SK,
decimation, dedispersion, thresholds, range grammar — each against
hand-computed values transcribing the reference C semantics (cited)."""

import math

import numpy as np
import pytest

from dragnet_spark import kernels as K
from dragnet_spark import plan as P
from dragnet_spark.params import MaskSpec, ranges_to_ivect


# ---------- A2 avg_var (mask.c:81-112) ----------

def test_avg_var_sample_variance():
    x = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    mean, var = K.avg_var(x)
    assert mean == pytest.approx(2.5)
    assert var == pytest.approx(5.0 / 3.0)     # ddof=1 (mask.c:109)


def test_avg_var_single_element():
    mean, var = K.avg_var(np.array([7.0], dtype=np.float32))
    assert (mean, var) == (7.0, 0.0)


# ---------- A3 median (mask.c:22-79): LOWER middle element ----------

def test_median_lower_even_is_lower_middle():
    # quickselect index (n-1)/2; np.median would give 2.5
    assert K.median_lower(np.array([4.0, 1.0, 3.0, 2.0])) == 2.0


def test_median_lower_odd():
    assert K.median_lower(np.array([9.0, 1.0, 5.0])) == 5.0


# ---------- A4 calc_avgmedstd (mask.c:300-325) ----------

def test_calc_avgmedstd_mid_fraction():
    arr = np.arange(10, dtype=np.float32)        # sorted already
    avg, med, std = K.calc_avgmedstd(arr, 10, 0.8, 1)
    # len = int(10*0.8+0.5) = 8, start = 1 -> elements 1..8
    sub = np.arange(1, 9, dtype=np.float64)
    assert avg == pytest.approx(sub.mean())
    assert med == 5.0                            # sorted[10//2]
    assert std == pytest.approx(math.sqrt(sub.var(ddof=1)))


def test_calc_avgmedstd_strided_gather():
    # step=2 gathers every other element (determine_padvals per-channel
    # column gather, mask.c:363-366)
    arr = np.array([0, 100, 2, 100, 4, 100, 6, 100], dtype=np.float32)
    avg, med, std = K.calc_avgmedstd(arr, 4, 1.0, 2)
    assert avg == pytest.approx(3.0)
    assert med == 4.0


def test_determine_padvals_trimmed_mean():
    # 5 intervals x 2 channels; channel 0 column = [0,1,2,3,100]
    stats = np.array([[0, 10], [1, 11], [2, 12], [3, 13], [100, 14]],
                     dtype=np.float32)
    pad = K.determine_padvals(stats)
    # len = int(5*0.8+0.5) = 4, start = 0 -> mean of sorted[0:4]
    assert pad[0] == pytest.approx(np.float32((0 + 1 + 2 + 3) / 4.0))
    assert pad[1] == pytest.approx(np.float32((10 + 11 + 12 + 13) / 4.0))


# ---------- J2/J3 merge/find (mask.c:516-553) ----------

def test_merge_no_dupes_sorted():
    assert K.merge_no_dupes([1, 3, 5], [2, 3, 6]) == [1, 2, 3, 5, 6]
    assert K.merge_no_dupes([], [4, 5]) == [4, 5]
    assert K.merge_no_dupes([4, 5], []) == [4, 5]


def test_find_num():
    assert K.find_num(3, [1, 3]) and not K.find_num(9, [1, 3])


# ---------- J1 check_mask (mask.c:418-513) ----------

def _mask_args(numchan=8, numint=4, dtint=1.0, zap_ints=(), zap_chans=(),
               cpi=None):
    return dict(
        dtint=dtint, numint=numint,
        zap_ints=np.asarray(zap_ints, dtype=np.int64),
        zap_chans=np.asarray(zap_chans, dtype=np.int64),
        chans_per_int=[np.asarray(c, dtype=np.int64)
                       for c in (cpi or [[]] * numint)])


def test_check_mask_single_interval():
    n, ch = K.check_mask(0.1, 0.5, **_mask_args(zap_chans=[2],
                                                cpi=[[5], [], [], []]))
    assert (n, ch) == (2, [2, 5])


def test_check_mask_straddle_unions_both():
    n, ch = K.check_mask(0.5, 1.0, **_mask_args(
        zap_chans=[7], cpi=[[1], [3], [], []]))
    assert sorted(ch) == [1, 3, 7] and n == 3


def test_check_mask_straddle_without_zapchans_drops_loint():
    # Reference quirk (mask.c:494-503): with no global zap_chans the
    # loint per-interval list is bypassed entirely in the straddle path.
    n, ch = K.check_mask(0.5, 1.0, **_mask_args(cpi=[[1], [3], [], []]))
    assert (n, ch) == (1, [3])


def test_check_mask_zap_int_returns_all():
    n, ch = K.check_mask(2.2, 0.5, **_mask_args(zap_ints=[2]))
    assert n == -1


def test_check_mask_past_end_clamps():
    # loint >= numint -> numint-1 (mask.c:451-455)
    n, ch = K.check_mask(99.0, 0.5, **_mask_args(cpi=[[], [], [], [6]]))
    assert (n, ch) == (1, [6])


# ---------- J5 inverse_mask (mask.c:720-728) ----------

def test_inverse_mask_flips_channels_but_not_padvals():
    m = MaskSpec(numchan=8, numint=1, zap_chans=[0, 2],
                 chans_per_int=[[1]], padvals=list(np.arange(8.0)))
    zc, cpi, pv = K.inverse_mask(m)
    assert list(zc) == [7, 5]
    assert list(cpi[0]) == [6]
    # padvals double-swap loop (mask.c:727) is a no-op -> unchanged
    assert list(pv) == list(np.arange(8.0, dtype=np.float32))


# ---------- P2 zap (dragnet.cu:249-261) ----------

def test_zap_zeroes_without_mask():
    d = np.full((3, 4), 9, dtype=np.uint8)
    K.zap_channels(d, np.array([0, 2]), None)
    # channel index flipped: nchan-1-zap -> columns 3 and 1
    assert d[:, 3].tolist() == [0, 0, 0] and d[:, 1].tolist() == [0, 0, 0]
    assert d[:, 0].tolist() == [9, 9, 9]


def test_zap_pads_with_truncated_padvals():
    d = np.full((2, 4), 9, dtype=np.uint8)
    pv = np.array([10.9, 11.9, 12.9, 13.9], dtype=np.float32)
    K.zap_channels(d, np.array([0]), pv)
    # column 3, float->uint8 C truncation: 13.9 -> 13 (dragnet.cu:255)
    assert d[:, 3].tolist() == [13, 13]


# ---------- W1 clip_times (mask.c:556-677) ----------

def test_clip_times_replaces_outlier_rows():
    rng = np.random.default_rng(1)
    data = rng.normal(10.0, 0.1, size=(256, 4)).astype(np.float32)
    data[100, :] = 1000.0                       # broadband spike
    levels = np.zeros(4, dtype=np.float32)
    st = K.ClipState()
    clipped = K.clip_times(data, 6.0, levels, st)
    assert clipped == 1
    assert np.allclose(data[100], levels)       # replaced by channel levels
    assert st.blocksread == 1
    assert levels == pytest.approx(st.chan_running_avg)


def test_clip_times_ewma_across_blocks():
    rng = np.random.default_rng(2)
    base = rng.normal(5.0, 0.05, size=(64, 2)).astype(np.float32)
    levels = np.zeros(2, dtype=np.float32)
    st = K.ClipState()
    K.clip_times(base.copy(), 6.0, levels, st)
    a0 = float(st.running_avg)
    st2 = K.ClipState()
    K.clip_times((base + 1.0).copy(), 6.0, levels, st2)
    a1 = float(st2.running_avg)          # what block 2 contributes alone
    st3 = K.ClipState()
    K.clip_times(base.copy(), 6.0, levels, st3)
    K.clip_times((base + 1.0).copy(), 6.0, levels, st3)
    # running = 0.9*prev + 0.1*current (mask.c:632)
    assert float(st3.running_avg) == pytest.approx(0.9 * a0 + 0.1 * a1, rel=1e-5)
    assert st3.blocksread == 2


def test_clip_times_degenerate_first_block_falls_back():
    # Constant data: std=0 -> strict cutoffs reject everything ->
    # numgoodpts<1 path (mask.c:617-621): running stays at 0.
    base = np.full((64, 2), 5.0, dtype=np.float32)
    levels = np.zeros(2, dtype=np.float32)
    st = K.ClipState()
    K.clip_times(base.copy(), 6.0, levels, st)
    assert float(st.running_avg) == 0.0


def test_apply_mask_all_channels_padded_on_zap_int():
    data = np.ones((8, 4), dtype=np.float32)
    pv = np.array([1.5, 2.5, 3.5, 4.5], dtype=np.float32)
    args = _mask_args(numchan=4, numint=4, zap_ints=[0])
    n = K.apply_mask(data, tsamp=0.1, nsamples=8, offset=0, clip_sigma=0.0,
                     padvals=pv, mask_args=args, clip_state=K.ClipState())
    assert np.allclose(data, np.tile(pv, (8, 1)))
    assert n == 0


# ---------- A6/W2 compute_sk_mask (skz.c:451-562) ----------

def test_sk_estimator_value():
    # Constant data: s1 = m*v, s2 = m*v^2 -> sk = (m*nd+1)/(m-1)*(m*m*v^2/(m*v)^2-1) = 0
    z = np.full((8, 2), 3.0, dtype=np.float32)
    nmask, mask = K.compute_sk_mask(z.copy(), my=2, m=4, nd=1.0,
                                    skmin=-1.0, skmax=1.0)
    assert nmask == 0 and mask.sum() == 0


def test_sk_masks_and_fills_from_neighbours():
    rng = np.random.default_rng(0)
    ny, nx, m = 16, 8, 8
    z = rng.normal(10, 0.01, size=(ny, nx)).astype(np.float32)
    # Hot bursty channel: alternating 0/1000 -> sk = (m*nd+1)/(m-1) *
    # (m*s2/s1^2 - 1) = 49/7 * (8*4e6/16e6 - 1) = 7 >> skmax
    z[:, 3] = np.tile([0.0, 1000.0], ny // 2).astype(np.float32)
    zc = z.copy()
    # Low-variance channels have sk ~ 0 (sk ~ 1 expects exponential
    # statistics), so bracket [-1, 5]: only the sk=7 channel trips.
    nmask, mask = K.compute_sk_mask(zc, my=2, m=m, nd=6.0,
                                    skmin=-1.0, skmax=5.0)
    assert mask[:, 3].all()                     # hot channel masked
    # fill per interval: mean-minus-max over <=5 unmasked each side
    j = 0
    right = [4, 5, 6, 7]
    left = [2, 1, 0]
    ks = slice(j * m, j * m + m)
    s1 = 0.0
    s2 = 0.0
    for side in (right, left):
        vals = z[ks][:, side].astype(np.float64)
        s1 += vals.sum() - np.maximum(vals.max(axis=1), 0.0).sum()
        s2 += m * (len(side) - 1)
    assert np.allclose(zc[ks, 3], np.float32(s1 / s2))


def test_sk_tail_interval_masked_not_filled():
    # my overruns ny: the pure-tail interval has mact=0 -> NaN -> masked,
    # fill skipped (skz.c:464-466, 494-497)
    z = np.full((4, 2), 5.0, dtype=np.float32)
    nmask, mask = K.compute_sk_mask(z.copy(), my=2, m=4, nd=1.0,
                                    skmin=-1.0, skmax=1.0)
    assert mask[1].all() and not mask[0].any()
    assert nmask == 2


# ---------- A8 decimate (skz.c:420-438) ----------

def test_decimate_mean():
    z = np.array([[1, 10], [3, 20], [5, 30], [7, 40]], dtype=np.float32)
    out = K.decimate_timeseries(z, 2)
    assert out.tolist() == [[2.0, 15.0], [6.0, 35.0]]


def test_decimate_requires_divisibility():
    with pytest.raises(ValueError):
        K.decimate_timeseries(np.zeros((5, 2), dtype=np.float32), 2)


# ---------- D3 dedisperse ----------

def test_dedisperse_hand_case():
    # 2 channels, delays [0, 1]: out[t] = z[t,0] + z[t+1,1]
    z = np.array([[1, 10], [2, 20], [3, 30], [4, 40]], dtype=np.float32)
    delays = np.array([[0, 1]], dtype=np.int64)
    out = K.dedisperse(z, delays, max_delay=1)
    assert out.tolist() == [[21.0, 32.0, 43.0]]


def test_dedisperse_recovers_injected_pulse():
    from dragnet_spark.generate import make_corpus, scenario_configs, DM_TRUE
    from dragnet_spark.oracle import run_document
    import base64
    doc = make_corpus("tiny")[1]
    res = run_document(doc, scenario_configs("tiny")["s0"])
    best, best_dm = -1, None
    for s in res["spans"]:
        if s["kind"] != "timeseries" or s["media_ref"] == "dm://0.000":
            continue   # DM 0 is dominated by the broadband burst
        arr = np.frombuffer(base64.b64decode(s["text"]), dtype="<f4")
        score = float(arr.max() - np.median(arr))
        if score > best:
            best, best_dm = score, s["media_ref"]
    assert best_dm == "dm://%.3f" % DM_TRUE


# ---------- F3 SK thresholds (skz.c:25-204) ----------

def test_sk_threshold_brackets_unity():
    lo, hi, status = P.sk_threshold3(1024, 4.0, 12.0)
    assert status == 0 and lo < 1.0 < hi
    # 1-sigma scale: u2 = 2*N(N+1)M^2/(M-1)/((MN+2)(MN+3))
    m, nd = 1024.0, 12.0
    u2 = 2 * nd * (nd + 1) * m * m / (m - 1) / ((m * nd + 2) * (m * nd + 3))
    sig = math.sqrt(u2)
    # thresholds roughly mean +/- 4 sigma for large M
    assert lo == pytest.approx(1.0 - 4 * sig, abs=2 * sig)
    assert hi == pytest.approx(1.0 + 4 * sig, abs=2 * sig)


def test_sk_threshold_tightens_with_m():
    lo1, hi1, _ = P.sk_threshold3(64, 4.0, 12.0)
    lo2, hi2, _ = P.sk_threshold3(1024, 4.0, 12.0)
    assert hi2 - lo2 < hi1 - lo1


# ---------- P1 range grammar (range_parse.c) ----------

def test_ranges_basic():
    assert ranges_to_ivect("0,5:10,20:40:2", 0, 63) == (
        [0] + list(range(5, 11)) + list(range(20, 41, 2)))


def test_ranges_clamped_and_defaults():
    assert ranges_to_ivect("60:99", 0, 63) == [60, 61, 62, 63]
    assert ranges_to_ivect(":3", 0, 63) == [0, 1, 2, 3]       # blank min
    assert ranges_to_ivect("61:", 0, 63) == [61, 62, 63]      # blank max
    assert ranges_to_ivect("70:99", 0, 63) == []              # out of window


# ---------- D2 DM lists ----------

def test_linear_dm_list_count():
    dml = P.linear_dm_list(0.0, 50.0, 5.0)
    assert len(dml) == 11 and dml[0] == 0.0 and dml[-1] == 50.0
    # ceil((end-start)/step)+1 (dragnet.cu:132)
    assert len(P.linear_dm_list(0.0, 49.0, 5.0)) == 11


def test_optimal_dm_list_monotone_increasing_spacing():
    dml = P.optimal_dm_list(0.0, 50.0, 0.002, 4.0, 151.0, -0.1953125, 16, 1.25)
    d = np.diff(dml.astype(np.float64))
    assert (d > 0).all()
    assert d[-1] > d[0]          # spacing grows with DM (smearing budget)
    assert dml[-1] >= 50.0


def test_delay_table_monotone():
    dt = P.delay_table(16, 0.002, 151.0, -0.1953125)
    assert dt[0] == 0.0 and (np.diff(dt) > 0).all()


def test_dt_factor_list_properties():
    """D5: factor(0)==1, powers of two, nondecreasing in DM, and grows
    once channel smearing dominates the sample time."""
    import numpy as np
    dml = np.array([0.0, 5.0, 10.0, 20.0, 40.0, 80.0, 160.0],
                   dtype=np.float32)
    f = P.dt_factor_list(dml, 0.00049152, 4.0, 151.0, -0.1953125, 128, 1.25)
    assert f[0] == 1
    assert all(x & (x - 1) == 0 for x in f)          # powers of two
    assert all(f[i] <= f[i + 1] for i in range(len(f) - 1))
    assert f[-1] > 1                                  # big DM => scrunched


def test_scrunch_series_matches_decimate_arithmetic():
    import numpy as np
    from dragnet_spark.kernels import scrunch_series
    rng = np.random.default_rng(7)
    out = rng.random((3, 100), dtype=np.float32)
    factors = np.array([1, 2, 4], dtype=np.int64)
    s = scrunch_series(out, factors)
    assert [len(x) for x in s] == [100, 50, 25]
    assert np.array_equal(s[0], out[0])
    g = out[1][:100].reshape(-1, 2)
    expect = (g.sum(axis=1, dtype=np.float32) / np.float32(2))
    assert np.array_equal(s[1], expect)


def test_sk_fill_fully_masked_fast_path_bitexact():
    """Fully-masked interval fast path (kernels.py): the vectorized
    whole-row write must reproduce the per-cell C semantics exactly —
    with both side lists empty, s1=0 and s2=-2*mact, so every cell
    fills with 0.0/(-2*mact) = -0.0 (sign of zero included)."""
    ny, nx, m = 32, 8, 8
    my = ny // m
    z = np.full((ny, nx), 30.0, dtype=np.float32)  # constant => sk=0 => masked
    nmask, mask = K.compute_sk_mask(z, my, m, 12.0, 0.8, 1.2)
    assert nmask == my * nx and mask.all()
    expect = np.float32(0.0 / (-2.0 * m))
    assert np.all(z == expect)
    assert np.all(np.signbit(z))      # bit-exact: the fill is MINUS zero
