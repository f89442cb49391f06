"""PRESTO rfifind .mask/.stats binary interop + .dat/.inf export
(mask.c:254-297, 334-372, 384-415; dragnet.cu:83-101, 310-326)."""

import base64

import numpy as np

from dragnet_spark.generate import make_corpus, make_mask, scenario_configs
from dragnet_spark.kernels import determine_padvals
from dragnet_spark.params import MaskSpec
from dragnet_spark.presto_io import (export_presto_files, load_mask,
                                     read_mask_bytes, read_mask_file,
                                     read_stats_bytes, write_mask_bytes,
                                     write_mask_file, write_stats_bytes,
                                     write_stats_file)


def _spec():
    return MaskSpec(
        mask_id="m", timesigma=10.0, freqsigma=4.0, mjd=56000.5,
        dtint=0.128, lofreq=138.0, dfreq=0.1953125, numchan=8, numint=4,
        ptsperint=64, zap_chans=[2, 5], zap_ints=[3],
        chans_per_int=[[], [1, 4], list(range(8)), [7]])


def test_mask_binary_roundtrip():
    m = _spec()
    m2 = read_mask_bytes(write_mask_bytes(m), mask_id="m")
    assert m2.timesigma == m.timesigma and m2.dtint == m.dtint
    assert m2.lofreq == m.lofreq and m2.dfreq == m.dfreq
    assert (m2.numchan, m2.numint, m2.ptsperint) == (8, 4, 64)
    assert m2.zap_chans == [2, 5] and m2.zap_ints == [3]
    # Full-channel interval: elided on write (mask.c:404-411), expanded
    # back to the explicit 0..numchan-1 list on read (mask.c:289-294).
    assert m2.chans_per_int == [[], [1, 4], list(range(8)), [7]]


def test_mask_full_interval_not_serialized():
    m = _spec()
    buf = write_mask_bytes(m)
    # bytes: 6*8 dbls + 3*4 ints + (1+2)+(1+1) zap ints + 4 counts
    #        + lists [1,4] and [7] only (3 ints) — full list NOT stored
    expected = 48 + 12 + 4 * (1 + 2) + 4 * (1 + 1) + 4 * 4 + 4 * 3
    assert len(buf) == expected


def test_stats_roundtrip_and_padvals():
    rng = np.random.default_rng(3)
    numint, numchan = 16, 8
    powers = rng.uniform(0, 2, (numint, numchan)).astype(np.float32)
    avgs = rng.uniform(25, 35, (numint, numchan)).astype(np.float32)
    st = read_stats_bytes(write_stats_bytes(powers, avgs, ptsperint=64))
    assert st["numchan"] == numchan and st["numint"] == numint
    np.testing.assert_array_equal(st["powers"], powers)
    np.testing.assert_array_equal(st["avgs"], avgs)
    pad = determine_padvals(st["avgs"])
    assert pad.shape == (numchan,) and pad.dtype == np.float32


def test_load_mask_with_and_without_stats(tmp_path):
    m = _spec()
    write_mask_file(str(tmp_path / "obs.mask"), m)
    # No stats file: padvals zero (mask.c:373-378)
    loaded = load_mask(str(tmp_path / "obs.mask"))
    assert loaded.padvals == [0.0] * 8
    assert loaded.chans_per_int == m.chans_per_int
    # With stats: padvals = mid-80% trimmed channel means
    rng = np.random.default_rng(4)
    avgs = rng.uniform(25, 35, (m.numint, m.numchan)).astype(np.float32)
    write_stats_file(str(tmp_path / "obs.stats"),
                     np.zeros_like(avgs), avgs, ptsperint=64)
    loaded2 = load_mask(str(tmp_path / "obs.mask"))
    np.testing.assert_array_equal(
        np.asarray(loaded2.padvals, np.float32), determine_padvals(avgs))


def test_binary_mask_pipeline_parity(spark, tmp_path):
    """A binary-loaded mask must produce byte-identical pipeline output
    to the in-memory fixture encoding (VERDICT next-round item 6)."""
    from dragnet_spark.pipeline import docs_to_df, run_pipeline
    from pyspark.sql import functions as F

    fixture = make_mask("tiny")
    # Serialize fixture -> .mask + a .stats whose per-interval averages
    # are constant per channel, so determine_padvals returns exactly
    # float32(padvals[c]) — the same values the fixture path uses after
    # its own float32 cast at plan time.
    write_mask_file(str(tmp_path / "obs.mask"), fixture)
    avgs = np.tile(np.asarray(fixture.padvals, np.float32),
                   (fixture.numint, 1))
    write_stats_file(str(tmp_path / "obs.stats"),
                     np.zeros_like(avgs), avgs, fixture.ptsperint)
    binary = load_mask(str(tmp_path / "obs.mask"))
    np.testing.assert_array_equal(
        np.asarray(binary.padvals, np.float32),
        np.asarray(fixture.padvals, np.float32))

    docs = docs_to_df(spark, make_corpus("tiny"))
    cfg = scenario_configs("tiny")["s2"]      # mask + clip path
    out_a = run_pipeline(docs, cfg, fixture).where(
        F.col("kind") != "metrics").collect()
    out_b = run_pipeline(docs, cfg, binary).where(
        F.col("kind") != "metrics").collect()
    ka = sorted((r.doc_id, r.seq, r.kind, r.text, r.media_ref, r.offset)
                for r in out_a)
    kb = sorted((r.doc_id, r.seq, r.kind, r.text, r.media_ref, r.offset)
                for r in out_b)
    assert ka == kb


def test_export_presto_files(spark, tmp_path):
    """Exported .inf bytes == the span text (writeinf_text transcription)
    and .dat bytes == the decoded series payload (dragnet.cu:310-326)."""
    from dragnet_spark.pipeline import docs_to_df, run_pipeline
    from pyspark.sql import functions as F

    docs = docs_to_df(spark, make_corpus("tiny")[:1])
    cfg = scenario_configs("tiny")["s0"]
    rows = run_pipeline(docs, cfg, None)
    n = export_presto_files(rows, str(tmp_path / "out"), prefix=cfg.prefix)
    spans = rows.where(F.col("kind").isin("timeseries", "inf")).collect()
    assert n == len(spans) == 22      # 11 DMs x (.dat + .inf)
    for s in spans:
        doc_dir = tmp_path / "out" / s.doc_id
        if s.kind == "inf":
            name = s.media_ref.split("//", 1)[1]
            assert (doc_dir / name).read_text() == s.text
        else:
            dm = s.media_ref.split("//", 1)[1]
            got = (doc_dir / f"{cfg.prefix}_DM{dm}.dat").read_bytes()
            assert got == base64.b64decode(s.text)
            # sanity: it really is float32-LE of the series length
            assert len(got) % 4 == 0


def test_read_mask_file_sets_id_from_root(tmp_path):
    write_mask_file(str(tmp_path / "scan7.mask"), _spec())
    assert read_mask_file(str(tmp_path / "scan7.mask")).mask_id == "scan7"


def test_read_mask_bytes_rejects_corrupt_interval_count():
    """An out-of-range per-interval channel count (truncated/corrupt
    file) used to be swallowed as an empty list, desynchronizing every
    later read and returning a structurally valid but garbage mask
    that silently zapped wrong channels — it must fail at load."""
    import pytest
    import struct

    buf = bytearray(write_mask_bytes(_spec()))
    # num_per_int block sits right after the two zap lists; patch the
    # first interval's count to numchan+1 (9 > numchan=8)
    base = 6 * 8 + 3 * 4                       # 6 doubles + 3 ints
    base += 4 + 2 * 4                          # n_zap_chans + 2 entries
    base += 4 + 1 * 4                          # n_zap_ints + 1 entry
    struct.pack_into("<i", buf, base, 9)
    with pytest.raises(ValueError, match="corrupt rfifind mask"):
        read_mask_bytes(bytes(buf), mask_id="m")


def test_export_presto_files_rejects_path_escaping_doc_id(spark, tmp_path):
    """doc_id is joined into the export path; a doc_id containing a
    path separator or '..' must raise instead of writing outside
    out_dir on the driver host."""
    import pytest
    from pyspark.sql import functions as F

    from dragnet_spark.pipeline import docs_to_df, run_pipeline

    docs = make_corpus("tiny")[:1]
    docs[0]["doc_id"] = "../escape"
    rows = run_pipeline(docs_to_df(spark, docs),
                        scenario_configs("tiny")["s0"], None)
    with pytest.raises(ValueError, match="not a safe"):
        export_presto_files(rows, str(tmp_path / "out"), prefix="t")


def test_export_presto_files_dedupes_resume_duplicates(spark, tmp_path):
    """A resumed spans table can hold a doc's rows twice; the export
    must write and count each file once."""
    from pyspark.sql import functions as F

    from dragnet_spark.pipeline import docs_to_df, run_pipeline

    docs = docs_to_df(spark, make_corpus("tiny")[:1])
    rows = run_pipeline(docs, scenario_configs("tiny")["s0"], None)
    n1 = export_presto_files(rows, str(tmp_path / "o1"), prefix="t")
    n2 = export_presto_files(rows.unionByName(rows),
                             str(tmp_path / "o2"), prefix="t")
    assert n1 == n2 == 22
