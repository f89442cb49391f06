"""Property-based differential tests (SURVEY.md §5.2 item 4):
randomized shapes/configs with naive reimplementations (or the
whole-document path) as the differential target.  Uses hypothesis with
small bounded sizes so the suite stays fast."""

from __future__ import annotations


import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dragnet_spark import kernels as K
from dragnet_spark.params import Header, RunConfig
from dragnet_spark.plan import build_plan
from dragnet_spark.spans import decode_document, encode_document

SMALL = {"deadline": None, "max_examples": 25}


# --------------------------------------------------------------------------
# D3 dedisperse vs naive per-element loop
# --------------------------------------------------------------------------

@settings(**SMALL)
@given(st.integers(2, 6).flatmap(lambda nchan: st.tuples(
    st.just(nchan),
    st.integers(8, 40),                       # nsamps
    st.integers(1, 4),                        # ndm
    st.integers(0, 1_000_000),                # seed
)))
def test_dedisperse_matches_naive(args):
    nchan, nsamps, ndm, seed = args
    rng = np.random.default_rng(seed)
    z = rng.integers(0, 256, size=(nsamps, nchan)).astype(np.float32)
    max_delay = min(nsamps - 1, 5)
    delays = rng.integers(0, max_delay + 1, size=(ndm, nchan)).astype(np.int64)
    got = K.dedisperse(z, delays, max_delay)
    t_out = nsamps - max_delay
    want = np.zeros((ndm, t_out), dtype=np.float32)
    for d in range(ndm):
        for t in range(t_out):
            acc = np.float32(0.0)
            for c in range(nchan):            # channel order 0..nchan-1
                acc = np.float32(acc + z[t + delays[d, c], c])
            want[d, t] = acc
    assert np.array_equal(got, want)


# --------------------------------------------------------------------------
# A8 decimate vs naive sequential-f32 group mean
# --------------------------------------------------------------------------

@settings(**SMALL)
@given(st.integers(1, 5), st.integers(1, 6), st.integers(1, 5),
       st.integers(0, 10**6))
def test_decimate_matches_naive(groups, mx, nchan, seed):
    rng = np.random.default_rng(seed)
    z = rng.random((groups * mx, nchan), dtype=np.float32) * 100
    got = K.decimate_timeseries(z, mx)
    want = np.zeros((groups, nchan), dtype=np.float32)
    for g in range(groups):
        for c in range(nchan):
            acc = np.float32(0.0)
            for k in range(mx):
                acc = np.float32(acc + z[g * mx + k, c])
            want[g, c] = np.float32(acc / np.float32(mx))
    assert np.array_equal(got, want)


# --------------------------------------------------------------------------
# A3 lower-middle median
# --------------------------------------------------------------------------

@settings(**SMALL)
@given(st.lists(st.floats(-1e6, 1e6, width=32), min_size=1, max_size=200))
def test_median_lower_is_lower_middle(xs):
    x = np.asarray(xs, dtype=np.float32)
    assert K.median_lower(x.copy()) == float(np.sort(x)[(len(x) - 1) // 2])


# --------------------------------------------------------------------------
# J2 merge_no_dupes == set union for sorted inputs
# --------------------------------------------------------------------------

@settings(**SMALL)
@given(st.lists(st.integers(0, 50), max_size=30),
       st.lists(st.integers(0, 50), max_size=30))
def test_merge_no_dupes_is_union_for_sorted(a, b):
    a = sorted(set(a))
    b = sorted(set(b))
    assert set(K.merge_no_dupes(np.array(a, int), np.array(b, int))) \
        == set(a) | set(b)


# --------------------------------------------------------------------------
# Span codec roundtrip (random shapes, media, both channel orders)
# --------------------------------------------------------------------------

@settings(**SMALL)
@given(st.integers(1, 8), st.integers(1, 300), st.integers(0, 3),
       st.sampled_from(["high", "low"]), st.integers(0, 10**6))
def test_codec_roundtrip(nchan, nsamp, n_media, order, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=(nsamp, nchan), dtype=np.uint8)
    h = Header(nchan=nchan, nsamp=nsamp, chan_order=order)
    media = [{"media_ref": f"img://x/{j}", "text": f"c{j}",
              "offset": int(rng.integers(0, nsamp))}
             for j in range(n_media)]
    enc_data = data[:, ::-1] if order == "low" else data
    doc = encode_document("d", h, enc_data, media)
    h2, data2, media2 = decode_document(doc["spans"])
    # decode always yields SIGPROC high-first regardless of storage order
    assert np.array_equal(data2, data)
    assert h2.nchan == nchan and h2.nsamp == nsamp
    # media re-emerge in document (offset-interleaved, stable) order
    expect = sorted(media, key=lambda m: m["offset"])
    assert [m["media_ref"] for m in media2] == [m["media_ref"] for m in expect]


# --------------------------------------------------------------------------
# W3 block loop with halos == whole-document processing
# (zap+dedisperse path; SK/clip are per-block by reference semantics)
# --------------------------------------------------------------------------

@settings(deadline=None, max_examples=10)
@given(st.integers(0, 10**6), st.integers(1, 4))
def test_block_loop_invariant_under_blocksize(seed, nblocks_ish):
    rng = np.random.default_rng(seed)
    nchan, nsamp = 8, 1024
    data = rng.integers(0, 256, size=(nsamp, nchan), dtype=np.uint8)
    h = Header(nchan=nchan, nsamp=nsamp, tsamp=0.002)
    base = dict(prefix="p", dm_start=0.0, dm_end=30.0, dm_step=10.0,
                zapchan="1")
    cfg_whole = RunConfig(config_id="w", blocksize=0, **base)
    plan_whole = build_plan(h, cfg_whole, None)
    out_whole, _ = K.process_document(data, plan_whole)
    bs = max((nsamp // (nblocks_ish + 1)) // 1 * 1,
             plan_whole.max_delay + 1)
    cfg_blk = RunConfig(config_id="b", blocksize=bs, **base)
    out_blk, _ = K.process_document(data, build_plan(h, cfg_blk, None))
    assert np.array_equal(out_whole, out_blk)


# --------------------------------------------------------------------------
# A6/F8: an all-constant channel (s1!=0, sk~0) is SK-masked; zero
# channel hits the isnan guard and is masked too
# --------------------------------------------------------------------------

def test_sk_masks_constant_and_zero_channels():
    nchan, m, my = 4, 16, 4
    z = np.ones((my * m, nchan), dtype=np.float32) * 30.0
    z[:, 1] = 30.0            # constant -> sk ~ 0 < lo -> masked
    z[:, 2] = 0.0             # s1 == 0 -> sk NaN -> masked (skz.c:473)
    rng = np.random.default_rng(0)
    z[:, 0] = rng.poisson(30, size=my * m).astype(np.float32)
    z[:, 3] = rng.poisson(30, size=my * m).astype(np.float32)
    zc = z.copy()
    nmask, _ = K.compute_sk_mask(zc, my, m, 12.0, 0.8, 1.2)
    assert nmask >= 2 * my    # both bad channels masked in every interval


# ---------- S3/S6 SIGPROC binary + S12/S14 mask binary round-trips ----------

@settings(max_examples=25, deadline=None)
@given(st.integers(1, 16), st.integers(1, 200), st.integers(0, 2**32 - 1))
def test_sigproc_roundtrip_property(nchan, nsamp, seed):
    from dragnet_spark.params import Header
    from dragnet_spark.sigproc import read_filterbank, write_filterbank_bytes
    rng = np.random.default_rng(seed)
    h = Header(nchan=nchan, nsamp=nsamp,
               tsamp=float(rng.uniform(1e-5, 1e-2)),
               tstart=float(rng.uniform(40000, 60000)),
               fch1=float(rng.uniform(100, 2000)),
               foff=-float(rng.uniform(0.01, 1.0)))
    data = rng.integers(0, 256, size=(nsamp, nchan), dtype=np.uint8)
    h2, data2 = read_filterbank(write_filterbank_bytes(h, data))
    np.testing.assert_array_equal(data2, data)
    assert (h2.nchan, h2.nsamp) == (nchan, nsamp)
    assert (h2.tsamp, h2.tstart, h2.fch1, h2.foff) == \
        (h.tsamp, h.tstart, h.fch1, h.foff)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_mask_binary_roundtrip_property(data):
    from dragnet_spark.params import MaskSpec
    from dragnet_spark.presto_io import read_mask_bytes, write_mask_bytes
    numchan = data.draw(st.integers(1, 32))
    numint = data.draw(st.integers(1, 8))
    chan_list = st.lists(st.integers(0, numchan - 1), max_size=numchan,
                         unique=True).map(sorted)
    per_int = [data.draw(st.one_of(
        chan_list, st.just(list(range(numchan)))))   # incl. full lists
        for _ in range(numint)]
    m = MaskSpec(mask_id="p", timesigma=10.0, freqsigma=4.0,
                 mjd=56000.25, dtint=0.1, lofreq=100.0, dfreq=0.1,
                 numchan=numchan, numint=numint, ptsperint=16,
                 zap_chans=data.draw(chan_list),
                 zap_ints=data.draw(st.lists(st.integers(0, numint - 1),
                                             max_size=numint, unique=True)
                                    .map(sorted)),
                 chans_per_int=per_int)
    m2 = read_mask_bytes(write_mask_bytes(m), mask_id="p")
    assert m2.zap_chans == m.zap_chans and m2.zap_ints == m.zap_ints
    # full lists are elided on write and regenerated on read; n==numchan
    # always comes back as the explicit 0..numchan-1 list
    assert m2.chans_per_int == [
        list(range(numchan)) if len(c) == numchan else c
        for c in m.chans_per_int]
