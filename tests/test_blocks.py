"""Block-iteration (W3/S6) and codec tests: overlap arithmetic, strip
slicing, halo re-reads, span round-trips — all before any Spark."""

import base64

import numpy as np
import pytest

from dragnet_spark.generate import corpus_header, make_corpus, make_document
from dragnet_spark.kernels import dedisperse, process_document
from dragnet_spark.params import Header, RunConfig
from dragnet_spark.plan import build_plan
from dragnet_spark.spans import (decode_document, encode_document,
                                 span_sequence_hash, writeinf_text)


def _flat_doc(nsamp=512, nchan=16, tsamp=0.002, seed=3):
    rng = np.random.default_rng(seed)
    h = Header(nchan=nchan, nsamp=nsamp, tsamp=tsamp)
    data = rng.integers(0, 255, size=(nsamp, nchan), dtype=np.uint8)
    return h, data


def test_codec_roundtrip():
    h, data = _flat_doc()
    media = [{"media_ref": "img://x/0", "text": "c0", "offset": 100}]
    doc = encode_document("d0", h, data, media)
    h2, data2, media2 = decode_document(doc["spans"])
    assert h2 == h
    assert np.array_equal(data, data2)
    assert media2[0]["media_ref"] == "img://x/0"
    # header first, then ascending offsets
    offs = [s["offset"] for s in doc["spans"]]
    assert offs[0] == -1 and offs[1:] == sorted(offs[1:])


def test_blockloop_equals_wholefile():
    """Multi-block with overlap == single whole-file block (the overlap
    re-read semantics of sigproc.cxx:134-148 + dragnet.cu:237-330)."""
    h, data = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    whole = RunConfig(config_id="w", dm_start=0, dm_end=50, dm_step=5)
    blocked = RunConfig(config_id="b", dm_start=0, dm_end=50, dm_step=5,
                        blocksize=1024)
    p1 = build_plan(h, whole)
    p2 = build_plan(h, blocked)
    assert p1.max_delay == p2.max_delay
    out1, m1 = process_document(data, p1)
    out2, m2 = process_document(data, p2)
    assert m1["n_blocks"] == 1 and m2["n_blocks"] > 1
    assert np.array_equal(out1, out2)           # bit-exact


def test_blockloop_output_length():
    h, data = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    for bs in (0, 1024, 1536, 4096):
        cfg = RunConfig(config_id="x", dm_start=0, dm_end=50, dm_step=5,
                        blocksize=bs)
        plan = build_plan(h, cfg)
        out, _ = process_document(data, plan)
        assert out.shape == (11, 4096 - plan.max_delay)


def test_blockloop_with_decimation():
    h, data = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    cfg = RunConfig(config_id="d", dm_start=0, dm_end=50, dm_step=5,
                    blocksize=1024, ndec=2)
    plan = build_plan(h, cfg)
    assert plan.nsamp_dec == 2048
    out, m = process_document(data, plan)
    assert out.shape == (11, plan.nsamp_computed)
    assert m["n_blocks"] > 1
    # equals whole-file decimated run
    whole = build_plan(h, RunConfig(config_id="dw", dm_start=0, dm_end=50,
                                    dm_step=5, ndec=2))
    out_w, _ = process_document(data, whole)
    assert np.array_equal(out, out_w)


def test_blocksize_must_exceed_max_delay():
    h, _ = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    with pytest.raises(ValueError):             # dragnet.cu:194-197
        build_plan(h, RunConfig(config_id="x", dm_start=0, dm_end=50,
                                dm_step=5, blocksize=128))


def test_block_mutations_do_not_leak():
    """Zap writes into a block must not contaminate the overlap tail
    re-read by the next block (disk re-read semantics)."""
    h, data = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    cfg = RunConfig(config_id="z", dm_start=0, dm_end=50, dm_step=5,
                    blocksize=1024, zapchan="0:3")
    out_blocked, _ = process_document(data, build_plan(h, cfg))
    cfg_w = RunConfig(config_id="zw", dm_start=0, dm_end=50, dm_step=5,
                      zapchan="0:3")
    out_whole, _ = process_document(data, build_plan(h, cfg_w))
    assert np.array_equal(out_blocked, out_whole)
    # input untouched
    _, data2 = _flat_doc(nsamp=4096, nchan=16, tsamp=0.002)
    assert np.array_equal(data, data2)


def test_dedisperse_matches_bandjoin_definition():
    """out[d][t] == sum_c z[t+delay(d,c)][c] — the relational (band
    join + groupBy) definition, checked against the vectorized kernel."""
    rng = np.random.default_rng(7)
    z = rng.normal(size=(64, 5)).astype(np.float32)
    delays = np.array([[0, 2, 3, 5, 9], [0, 0, 1, 1, 2]], dtype=np.int64)
    out = dedisperse(z, delays, max_delay=9)
    for d in range(2):
        for t in range(64 - 9):
            ref = np.float32(0.0)
            for c in range(5):
                ref += z[t + delays[d, c], c]
            assert out[d, t] == ref


def test_inf_text_golden():
    h = Header()
    txt = writeinf_text(h, "test", 25.0, nsamp_dec=512, tsamp_dec=0.002,
                        shift_back=182)
    assert " Number of bins in the time series      =  330\n" in txt
    assert " Dispersion measure (cm-3 pc)           =  25\n" in txt
    # string round-trip MJD split (inf.cxx:141-143)
    assert "Epoch of observation (MJD)             =  56000.1234567" in txt
    assert txt.endswith("    Input filterbank samples have 8 bits.\n")


def test_generator_determinism():
    d1 = make_document("tiny", 0)
    d2 = make_document("tiny", 0)
    assert span_sequence_hash(d1["spans"]) == span_sequence_hash(d2["spans"])
    docs = make_corpus("tiny")
    assert len({d["doc_id"] for d in docs}) == 4


def test_generator_pulse_is_injected():
    doc = make_document("tiny", 0)
    h, data, _ = decode_document(doc["spans"])
    assert h == corpus_header("tiny")
    # channel 0 pulse lands exactly at t_pulse
    assert data[h.nsamp // 3, 0] >= 60
    # broadband burst rows (the hot channel c_bad overwrites the burst
    # in its own column — injected after, generate.py order)
    c_bad = h.nchan // 4
    cols = [c for c in range(h.nchan) if c != c_bad]
    assert (data[h.nsamp // 2][cols] == 200).all()


def test_build_plan_rejects_positive_foff():
    """delay_table/dedisperse assume the SIGPROC high-first convention
    (fch1 = highest frequency, foff < 0); a legal low-first .fil must
    fail at plan time with the real cause, not as a broadcast error
    deep inside an executor."""
    h = corpus_header("tiny", nsamp=64)
    h.foff = abs(h.foff)
    with pytest.raises(ValueError, match="foff must be negative"):
        build_plan(h, RunConfig(config_id="t"), None)


def test_span_sequence_hash_is_injection_safe():
    """Field values containing the old separator byte must not let two
    different sequences hash equal (('a', '\\x00b') vs ('a\\x00', 'b'))
    — a golden-pin hash that reports false equality would mask a real
    divergence."""
    a = [{"kind": "media", "text": "a", "media_ref": "\x00b", "offset": 0}]
    b = [{"kind": "media", "text": "a\x00", "media_ref": "b", "offset": 0}]
    assert span_sequence_hash(a) != span_sequence_hash(b)
