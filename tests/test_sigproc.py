"""SIGPROC filterbank binary ingest (S3/S4/S5/S6) — round-trip and
reference-quirk parity tests (sigproc.cxx:49-148)."""

import struct

import numpy as np
import pytest

from dragnet_spark.generate import make_document
from dragnet_spark.params import Header
from dragnet_spark.sigproc import (SigprocReader, ingest_filterbank,
                                   parse_sigproc_header, read_filterbank,
                                   write_filterbank, write_filterbank_bytes)
from dragnet_spark.spans import decode_document


def _tiny_header_data(nsamp=96, nchan=8):
    h = Header(nchan=nchan, nsamp=nsamp, tsamp=0.002)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 255, size=(nsamp, nchan), dtype=np.uint8)
    return h, data


def test_roundtrip_header_and_payload():
    h, data = _tiny_header_data()
    buf = write_filterbank_bytes(h, data)
    h2, data2 = read_filterbank(buf)
    np.testing.assert_array_equal(data2, data)
    for attr in ("nchan", "nbit", "nif", "tsamp", "tstart", "fch1", "foff",
                 "src_raj", "src_dej", "telescope_id", "machine_id",
                 "nbeam", "ibeam", "az_start", "za_start"):
        assert getattr(h2, attr) == getattr(h, attr), attr
    # nsamp is inferred from the payload size (sigproc.cxx:120-124)
    assert h2.nsamp == h.nsamp


def test_source_name_keyword_bug_transcribed():
    """sigproc.cxx:103 strcpy's the KEYWORD, never the value: an
    ingested file always reads back source_name == 'source_name'."""
    h, data = _tiny_header_data()
    h.source_name = "B0531+21"
    h2, _ = read_filterbank(write_filterbank_bytes(h, data))
    assert h2.source_name == "source_name"


def test_nsamples_key_overridden_by_filesize():
    h, data = _tiny_header_data(nsamp=96)
    h.nsamp = 12345           # lie in the header key
    buf = write_filterbank_bytes(h, data)
    h2, data2 = read_filterbank(buf)
    assert h2.nsamp == 96     # filesize wins (sigproc.cxx:120-124)
    assert data2.shape == (96, 8)


def test_out_of_range_length_records_skipped():
    """Lengths outside (1, 80) are skipped via `continue` exactly like
    the C loop (sigproc.cxx:76)."""
    h, data = _tiny_header_data()
    buf = write_filterbank_bytes(h, data)
    # Inject junk int32s (0 and 4096: both outside (1,80)) before the
    # first record — the parser must skip them.
    junk = struct.pack("<i", 0) + struct.pack("<i", 4096)
    h2, data2 = read_filterbank(junk + buf)
    assert h2.nchan == h.nchan
    np.testing.assert_array_equal(data2, data)


def test_fchannel_table_sets_fch1_foff():
    """FREQUENCY_START/fchannel.../FREQUENCY_END (sigproc.cxx:105-117):
    first fchannel -> fch1, second -> foff = f2 - f1, rest discarded."""
    def rec(s):
        b = s.encode()
        return struct.pack("<i", len(b)) + b

    nchan = 4
    parts = [rec("HEADER_START"),
             rec("nchans") + struct.pack("<i", nchan),
             rec("nifs") + struct.pack("<i", 1),
             rec("nbits") + struct.pack("<i", 8),
             rec("tsamp") + struct.pack("<d", 0.001),
             rec("FREQUENCY_START")]
    for f in (151.0, 150.9, 150.8, 150.7):
        parts.append(rec("fchannel") + struct.pack("<d", f))
    parts += [rec("FREQUENCY_END"), rec("HEADER_END")]
    payload = np.zeros((10, nchan), dtype=np.uint8).tobytes()
    h, headersize = parse_sigproc_header(b"".join(parts) + payload)
    assert h.fch1 == 151.0
    assert h.foff == pytest.approx(-0.1, abs=1e-12)
    assert h.nsamp == 10


@pytest.mark.parametrize("field,val,msg", [("nif", 2, "polarizations"),
                                           ("nbit", 16, "bit depth")])
def test_validation_rejects(field, val, msg):
    h, data = _tiny_header_data()
    setattr(h, field, val)
    if field == "nbit":
        # keep byte count consistent: still write uint8 payload but lie
        buf = write_filterbank_bytes(Header(**{**h.__dict__, "nbit": 8}), data)
        buf = buf.replace(struct.pack("<i", 5) + b"nbits" + struct.pack("<i", 8),
                          struct.pack("<i", 5) + b"nbits" + struct.pack("<i", 16))
    else:
        buf = write_filterbank_bytes(h, data)
    with pytest.raises(ValueError, match=msg):
        read_filterbank(buf)


def test_blocked_read_with_shift_back():
    """Sigproc::read overlap semantics (sigproc.cxx:134-148): each call
    returns read_samples-shift_back, the stream rewinds so the next
    block re-reads the halo tail."""
    h, data = _tiny_header_data(nsamp=100, nchan=8)
    r = SigprocReader(write_filterbank_bytes(h, data))
    blocks = []
    advanced_total = 0
    sb = 10
    while advanced_total < 100 - sb:
        block, adv = r.read(40, sb)
        blocks.append(block)
        advanced_total += adv
    # Block starts step by 30; each block re-reads the previous tail.
    np.testing.assert_array_equal(blocks[0], data[0:40])
    np.testing.assert_array_equal(blocks[1], data[30:70])
    np.testing.assert_array_equal(blocks[2], data[60:100])
    # Final block: clipped read (100-90=10... loop stops once past end)
    assert advanced_total >= 100 - sb


def test_spark_ingest_matches_generator_encoding(spark, tmp_path):
    """End-to-end: .fil files -> ingest_filterbank -> documents table;
    decoded spans must equal the direct generator encoding (same codec)
    and the raw data must round-trip bit-exactly."""
    doc = make_document("tiny", 1)
    header, data, _media = decode_document(doc["spans"])
    write_filterbank(str(tmp_path / "obs1.fil"), header, data)

    df = ingest_filterbank(spark, str(tmp_path / "obs1.fil"))
    rows = df.collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.doc_id == "obs1"
    spans = [{"kind": s.kind, "text": s.text, "media_ref": s.media_ref,
              "offset": s.offset} for s in row.spans]
    h2, data2, media2 = decode_document(spans)
    np.testing.assert_array_equal(data2, data)
    assert media2 == []
    assert h2.nchan == header.nchan and h2.nsamp == header.nsamp
    assert h2.tsamp == header.tsamp and h2.fch1 == header.fch1
    # The ingested document runs through the pipeline identically to a
    # generator document with the same (bug-faithful) header.
    from dragnet_spark.generate import scenario_configs
    from dragnet_spark.pipeline import docs_to_df, run_pipeline
    from pyspark.sql import functions as F
    out = run_pipeline(df, scenario_configs("tiny")["s0"], None)
    n = out.where(F.col("kind") == "timeseries").count()
    assert n == 11  # one series span per DM trial


def test_ingest_rejects_colliding_basenames(spark, tmp_path):
    """Same-named .fil files in different directories would silently
    collide into one doc_id (basename-derived) and merge two
    observations' spans into one corrupt document — ingest must refuse
    up front."""
    import pytest

    doc = make_document("tiny", 1)
    header, data, _media = decode_document(doc["spans"])
    for sub in ("beamA", "beamB"):
        (tmp_path / sub).mkdir()
        write_filterbank(str(tmp_path / sub / "obs.fil"), header, data)

    with pytest.raises(ValueError, match="share the basename"):
        ingest_filterbank(spark, str(tmp_path / "*" / "obs.fil"))
