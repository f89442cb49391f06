"""PRESTO rfifind binary interop + .dat/.inf export.

Round-1 carried the mask only as a JSON/fixture encoding; this module
closes the real-file loop (VERDICT.md "What's missing" #2/#3):

* :func:`read_mask_bytes` / :func:`write_mask_bytes` — the rfifind
  ``.mask`` binary layout (``mask/mask.c:254-297`` read,
  ``mask.c:384-415`` write): 6 doubles ``timesigma freqsigma mjd dtint
  lofreq dfreq``, 3 ints ``numchan numint ptsperint``, the counted
  ``zap_chans``/``zap_ints`` lists, ``num_chans_per_int[numint]``, then
  one int list per interval — stored ONLY when ``0 < n < numchan``; an
  all-channels-bad interval (``n == numchan``) is expanded to the full
  ``0..numchan-1`` list on read (``mask.c:289-294``) and elided on
  write (``mask.c:404-411``).
* :func:`read_stats_bytes` — the ``.stats`` layout the reference reads
  (``mask.c:334-372``): ints ``numchan numint ptsperint lobin
  numbetween`` then two float32 (numint, numchan) matrices (powers,
  then per-interval averages; the reference reads both into the same
  buffer so only the averages survive — we return both).
* :func:`load_mask` — the setup flow of ``dragnet.cu:83-101``: read
  the ``.mask``, derive padvals from the sibling ``root.stats`` via the
  mid-80% trimmed channel means (``determine_padvals``,
  ``mask.c:328-381``) or zeros when absent.
* :func:`export_presto_files` — the reference's output contract
  (``dragnet.cu:310-326``): per (document, DM) a raw float32-LE
  ``.dat`` plus the byte-exact ``.inf`` text.

All binary IO is native little-endian, as the reference's plain
``chkfread`` calls are (no byteswap path taken).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .params import MaskSpec

_MASK_DBLS = ("timesigma", "freqsigma", "mjd", "dtint", "lofreq", "dfreq")


# --------------------------------------------------------------------------
# .mask binary (mask.c:254-297 / 384-415)
# --------------------------------------------------------------------------

def read_mask_bytes(buf: bytes, mask_id: str = "mask-binary") -> MaskSpec:
    pos = 0

    def take(fmt: str):
        nonlocal pos
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, buf, pos)
        pos += size
        return vals

    dbls = dict(zip(_MASK_DBLS, take("<6d")))
    numchan, numint, ptsperint = take("<3i")
    (n_zap_chans,) = take("<i")
    zap_chans = list(take(f"<{n_zap_chans}i")) if n_zap_chans else []
    (n_zap_ints,) = take("<i")
    zap_ints = list(take(f"<{n_zap_ints}i")) if n_zap_ints else []
    num_per_int = list(take(f"<{numint}i"))
    chans_per_int: list[list[int]] = []
    for n in num_per_int:
        if 0 < n < numchan:
            chans_per_int.append(list(take(f"<{n}i")))
        elif n == numchan:
            # all-channels-bad expansion (mask.c:289-294)
            chans_per_int.append(list(range(numchan)))
        elif n == 0:
            chans_per_int.append([])
        else:
            # n < 0 or n > numchan can only come from a truncated /
            # corrupt file (or a numchan disagreeing with the interval
            # lists).  Swallowing it as [] would desynchronize every
            # later take() and return a structurally valid but GARBAGE
            # mask that silently zaps wrong channels — fail at load.
            raise ValueError(
                f"corrupt rfifind mask: per-interval channel count {n} "
                f"outside [0, numchan={numchan}]")
    return MaskSpec(mask_id=mask_id, numchan=numchan, numint=numint,
                    ptsperint=ptsperint, zap_chans=zap_chans,
                    zap_ints=zap_ints, chans_per_int=chans_per_int,
                    **dbls)


def read_mask_file(path: str) -> MaskSpec:
    with open(path, "rb") as fh:
        buf = fh.read()
    root = os.path.splitext(os.path.basename(path))[0]
    return read_mask_bytes(buf, mask_id=root)


def write_mask_bytes(m: MaskSpec) -> bytes:
    parts = [struct.pack("<6d", *(getattr(m, k) for k in _MASK_DBLS)),
             struct.pack("<3i", m.numchan, m.numint, m.ptsperint),
             struct.pack("<i", len(m.zap_chans))]
    if m.zap_chans:
        parts.append(struct.pack(f"<{len(m.zap_chans)}i", *m.zap_chans))
    parts.append(struct.pack("<i", len(m.zap_ints)))
    if m.zap_ints:
        parts.append(struct.pack(f"<{len(m.zap_ints)}i", *m.zap_ints))
    counts = [len(c) for c in m.chans_per_int]
    if len(counts) != m.numint:
        raise ValueError(f"chans_per_int has {len(counts)} entries "
                         f"for numint={m.numint}")
    parts.append(struct.pack(f"<{m.numint}i", *counts))
    for chans in m.chans_per_int:
        if 0 < len(chans) < m.numchan:     # full lists elided (mask.c:404)
            parts.append(struct.pack(f"<{len(chans)}i", *chans))
    return b"".join(parts)


def write_mask_file(path: str, m: MaskSpec) -> None:
    with open(path, "wb") as fh:
        fh.write(write_mask_bytes(m))


# --------------------------------------------------------------------------
# .stats binary (mask.c:334-372)
# --------------------------------------------------------------------------

def read_stats_bytes(buf: bytes) -> dict:
    numchan, numint, ptsperint, lobin, numbetween = struct.unpack_from(
        "<5i", buf, 0)
    n = numchan * numint
    powers = np.frombuffer(buf, dtype="<f4", count=n, offset=20) \
        .reshape(numint, numchan)
    avgs = np.frombuffer(buf, dtype="<f4", count=n, offset=20 + 4 * n) \
        .reshape(numint, numchan)
    return {"numchan": numchan, "numint": numint, "ptsperint": ptsperint,
            "lobin": lobin, "numbetween": numbetween,
            "powers": powers, "avgs": avgs}


def read_stats_file(path: str) -> dict:
    with open(path, "rb") as fh:
        return read_stats_bytes(fh.read())


def write_stats_bytes(powers: np.ndarray, avgs: np.ndarray,
                      ptsperint: int, lobin: int = 0,
                      numbetween: int = 1) -> bytes:
    numint, numchan = avgs.shape
    return (struct.pack("<5i", numchan, numint, ptsperint, lobin, numbetween)
            + np.ascontiguousarray(powers, dtype="<f4").tobytes()
            + np.ascontiguousarray(avgs, dtype="<f4").tobytes())


def write_stats_file(path: str, powers: np.ndarray, avgs: np.ndarray,
                     ptsperint: int, lobin: int = 0,
                     numbetween: int = 1) -> None:
    with open(path, "wb") as fh:
        fh.write(write_stats_bytes(powers, avgs, ptsperint, lobin, numbetween))


# --------------------------------------------------------------------------
# Mask + padvals setup flow (dragnet.cu:83-101)
# --------------------------------------------------------------------------

def load_mask(mask_path: str) -> MaskSpec:
    """Read a binary ``.mask`` and fill ``padvals`` the way the
    reference does at startup: from the sibling ``root.stats`` file's
    mid-80% trimmed per-channel means (``determine_padvals``,
    ``mask.c:328-381``), or zeros when no stats file exists
    (``mask.c:373-378``)."""
    from .kernels import determine_padvals

    m = read_mask_file(mask_path)
    root = os.path.splitext(mask_path)[0]
    stats_path = f"{root}.stats"
    if os.path.exists(stats_path):
        stats = read_stats_file(stats_path)
        if stats["numchan"] != m.numchan:
            raise ValueError(
                f"stats numchan {stats['numchan']} != mask {m.numchan}")
        pad = determine_padvals(stats["avgs"])
        m.padvals = [float(v) for v in pad]
    else:
        m.padvals = [0.0] * m.numchan
    return m


# --------------------------------------------------------------------------
# .dat / .inf export (dragnet.cu:310-326, inf.cxx:107-159)
# --------------------------------------------------------------------------

def export_presto_files(rows, out_dir: str, prefix: str = "test") -> int:
    """Write the pipeline's output span rows as PRESTO-consumable
    files: ``{out_dir}/{doc_id}/{prefix}_DM{%.3f}.dat`` (raw float32-LE
    series — the base64-decoded ``timeseries`` span) and the matching
    ``.inf`` (the byte-exact span text).  Returns the file count.

    Streams with ``toLocalIterator`` so only one partition is resident
    on the driver at a time; this is a local-egress utility — at
    cluster scale the same span rows go to the object store via the
    parquet/Iceberg sink (``io.write_documents``) and files are
    materialized next to the consumer instead.
    """
    import base64

    from pyspark.sql import functions as F

    sel = (rows.where(F.col("kind").isin("timeseries", "inf"))
           .select("doc_id", "kind", "text", "media_ref")
           # Resume can re-append a doc's spans over a partial earlier
           # attempt (identical rows by determinism) — dedupe so the
           # export writes and counts each file once.
           .dropDuplicates(["doc_id", "kind", "media_ref"]))
    count = 0
    for r in sel.toLocalIterator():
        # doc_id is joined into a filesystem path: nothing upstream
        # constrains it to path-safe characters, so a doc_id like
        # '../x' or 'a/b' would escape out_dir (or scatter nested
        # trees) on the driver host.
        if (os.sep in r.doc_id or (os.altsep and os.altsep in r.doc_id)
                or r.doc_id in ("", ".", "..")):
            raise ValueError(f"doc_id {r.doc_id!r} is not a safe "
                             "directory name for file export")
        doc_dir = os.path.join(out_dir, r.doc_id)
        os.makedirs(doc_dir, exist_ok=True)
        if r.kind == "timeseries":
            # media_ref = 'dm://%.3f'; name per dragnet.cu:312
            dm = r.media_ref.split("//", 1)[1]
            path = os.path.join(doc_dir, f"{prefix}_DM{dm}.dat")
            with open(path, "wb") as fh:
                fh.write(base64.b64decode(r.text))
        else:
            name = r.media_ref.split("//", 1)[1]     # '<prefix>_DM%.3f.inf'
            path = os.path.join(doc_dir, name)
            with open(path, "w") as fh:
                fh.write(r.text)
        count += 1
    return count
