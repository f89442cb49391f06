"""LOFAR HDF5 metadata walk + channel-reversal read (S7/S8,
lofarhdf5.cxx:27-341) — exercised via a dict-backed fake of the HDF5
mapping protocol (h5py absent in this sandbox; open_bf_file guards)."""

import numpy as np
import pytest

from dragnet_spark.lofar_hdf5 import (LofarFormatError, LofarReader,
                                      header_from_bf, open_bf_file)


class FakeNode:
    def __init__(self, attrs=None, children=None, data=None):
        self.attrs = attrs or {}
        self._children = children or {}
        self._data = data

    def __contains__(self, k):
        return k in self._children

    def __getitem__(self, k):
        if isinstance(k, str):
            return self._children[k]
        return self._data[k]           # dataset slicing

    @property
    def shape(self):
        return self._data.shape


def _bf_file(nsamp=64, nchan=16, complex_voltage=0, npol=1,
             coord_types=("Time", "Spectral"), sap_index=0, beam_index=0):
    data = (np.arange(nsamp * nchan, dtype=np.float32)
            .reshape(nsamp, nchan))
    stokes = FakeNode(attrs={"NOF_SAMPLES": nsamp,
                             "STOKES_COMPONENT": "I"}, data=data)
    coords = FakeNode(attrs={"COORDINATE_TYPES": list(coord_types)})
    beam = FakeNode(
        attrs={"TARGETS": [b"B1919+21"], "COMPLEX_VOLTAGE": complex_voltage,
               "OBSERVATION_NOF_STOKES": npol,
               "BEAM_FREQUENCY_CENTER": 149.9,        # MHz
               "SAMPLING_TIME": 0.00131072,           # s
               "CHANNEL_WIDTH": 12207.03125,          # Hz
               "POINT_RA": 295.0, "POINT_DEC": -21.5},
        children={"STOKES_0": stokes, "COORDINATES": coords})
    sap = FakeNode(attrs={"OBSERVATION_NOF_BEAMS": beam_index + 1},
                   children={f"BEAM_{beam_index:03d}": beam})
    root = FakeNode(
        attrs={"OBSERVATION_NOF_SUB_ARRAY_POINTINGS": sap_index + 1,
               "OBSERVATION_START_MJD": 56789.25},
        children={f"SUB_ARRAY_POINTING_{sap_index:03d}": sap})
    return root, data


def test_header_derivation():
    root, _ = _bf_file()
    h, stokes = header_from_bf(root)
    assert h.telescope_id == 11 and h.machine_id == 11
    assert h.source_name == "B1919+21"
    assert h.nsamp == 64 and h.nchan == 16
    assert h.nbit == 32 and h.nif == 1 and h.nbeam == 1 and h.ibeam == 0
    assert h.tstart == 56789.25
    assert h.tsamp == 0.00131072
    assert h.foff == pytest.approx(-0.01220703125)   # -channelWidth*1e-6 MHz
    # fch1: literal transcription incl. the double-1e-6 quirk
    bw = 16 * 12207.03125 * 1e-6
    assert h.fch1 == pytest.approx(
        149.9 + bw / 2.0 - abs(h.foff * 1e-6) / 2.0)
    assert h.chan_order == "low"


def test_ra_dec_only_under_verbose():
    """lofarhdf5.cxx:281-306: the packing runs inside `if (verbose)`."""
    root, _ = _bf_file()
    h_quiet, _ = header_from_bf(root, verbose=False)
    from dragnet_spark.params import Header
    assert h_quiet.src_raj == Header().src_raj      # untouched defaults
    h_verb, _ = header_from_bf(root, verbose=True)
    # RA 295 deg = 19h40m00s -> packed 194000.000000
    assert h_verb.src_raj == pytest.approx(194000.0, abs=1e-6)
    # DEC -21.5 deg -> -21d30m00s -> packed -213000.0
    assert h_verb.src_dej == pytest.approx(-213000.0, abs=1e-6)


def test_spectral_dim_from_coordinates():
    root, _ = _bf_file(coord_types=("Spectral", "Time"))
    h, _ = header_from_bf(root)
    assert h.nchan == 64      # dims[0] when Spectral is coordinate 0


def test_rejects_complex_voltage_and_npol():
    root, _ = _bf_file(complex_voltage=1)
    with pytest.raises(LofarFormatError, match="complex-voltage"):
        header_from_bf(root)
    root, _ = _bf_file(npol=4)
    with pytest.raises(LofarFormatError, match="more than one IF"):
        header_from_bf(root)


def test_sap_beam_probing():
    """First existing SAP/beam group wins (lofarhdf5.cxx:73-92)."""
    root, _ = _bf_file(sap_index=1, beam_index=2)
    root.attrs["OBSERVATION_NOF_SUB_ARRAY_POINTINGS"] = 3
    h, _ = header_from_bf(root)
    assert h.nchan == 16


def test_blocked_read_reverses_channels():
    """HDF5::read (lofarhdf5.cxx:313-341): low-first storage comes back
    high-first, with the shift_back overlap rewind."""
    root, data = _bf_file(nsamp=32, nchan=8)
    r = LofarReader(root)
    b1, adv1 = r.read(16, 4)
    np.testing.assert_array_equal(b1, data[0:16, ::-1].astype(np.float32))
    assert adv1 == 12
    b2, adv2 = r.read(16, 4)
    np.testing.assert_array_equal(b2, data[12:28, ::-1].astype(np.float32))


def test_open_bf_file_guard():
    with pytest.raises(RuntimeError, match="h5py is required"):
        open_bf_file("/nonexistent.h5")
