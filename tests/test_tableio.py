"""Native table reader/writer (io/_native/fasttab.cpp via io/tableio.py).

The native scanner must be BIT-EXACT against numpy's loadtxt/savetxt —
the ASCII fixture formats are the parity surface with the reference's
list-directed Fortran I/O (model_IO.F90:135-241, data_gravmag.f90:204-239).
"""

import numpy as np
import pytest

from tomofastx_tpu.io import _native
from tomofastx_tpu.io.tableio import load_table, save_table


def _numpy_load(path, skiprows=0, ndmin=2):
    with open(path) as f:
        for _ in range(skiprows):
            f.readline()
        return np.loadtxt(f, ndmin=ndmin)


def test_native_library_builds():
    """g++ is in the image; the lazy build must succeed here (the
    runtime fallback exists for environments without a toolchain)."""
    assert _native.lib() is not None


def test_load_table_messy_whitespace(tmp_path):
    p = str(tmp_path / "t.txt")
    with open(p, "w") as f:
        f.write("2 7\n")  # header (skipped)
        f.write("1.5 -2e3\n")
        f.write("# full comment line\n")
        f.write("  3.25e-12\t4 \r\n")
        f.write("\n")
        f.write("5 6.0E+2  # trailing comment\n")
    got = load_table(p, skiprows=1)
    want = _numpy_load(p, skiprows=1)
    assert np.array_equal(got, want)
    assert got.shape == (3, 2)


def test_load_table_bit_exact_fuzz(tmp_path):
    """repr() round-trip (17 significant digits -> exercises the strtod
    fallback) and %.9E (Clinger fast path) both parse bit-exactly."""
    rng = np.random.default_rng(42)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 500),
        rng.normal(0.0, 1e-12, 500),
        rng.normal(0.0, 1e30, 500),  # exponents beyond the fast path
        np.array([0.0, -0.0, 1e-300, 1e300, 3.141592653589793,
                  np.pi * 1e-250, np.inf, -np.inf]),
    ])
    p = str(tmp_path / "fuzz.txt")
    with open(p, "w") as f:
        for v in vals:
            f.write(repr(float(v)) + "\n")
    got = load_table(p, ndmin=1)
    want = _numpy_load(p, ndmin=1)
    assert np.array_equal(got, want)

    p2 = str(tmp_path / "fmt.txt")
    fin = vals[np.isfinite(vals)].reshape(-1, 2)
    with open(p2, "w") as f:
        np.savetxt(f, fin, fmt="%.9E")
    assert np.array_equal(load_table(p2), _numpy_load(p2))


def test_save_table_byte_parity(tmp_path):
    rng = np.random.default_rng(7)
    data = np.concatenate([
        rng.uniform(-1e4, 1e4, (100, 3)),
        rng.normal(0.0, 1e-20, (100, 3)),
        np.array([[0.0, -0.0, 1e300]]),
    ])
    p1 = str(tmp_path / "native.txt")
    p2 = str(tmp_path / "numpy.txt")
    save_table(p1, data, fmt="%.9E", header=" 201")
    with open(p2, "w") as f:
        f.write(" 201\n")
        np.savetxt(f, data, fmt="%.9E")
    assert open(p1).read() == open(p2).read()


def test_save_table_multispec_byte_parity(tmp_path):
    """Per-column row formats ("%.1f ... %d", the grid-fixture writers'
    pattern) match np.savetxt byte-for-byte, incl. %d-on-float
    truncation semantics."""
    rng = np.random.default_rng(3)
    data = np.column_stack([
        rng.uniform(-1e4, 1e4, 200),
        rng.normal(0, 1e-8, 200),
        np.concatenate([rng.integers(-50, 50, 198), [2.0, -3.0]]),
    ])
    fmt = "%.1f %.9E %d"
    p1 = str(tmp_path / "native.txt")
    p2 = str(tmp_path / "numpy.txt")
    save_table(p1, data, fmt=fmt)
    with open(p2, "w") as f:
        np.savetxt(f, data, fmt=fmt)
    assert open(p1).read() == open(p2).read()


def test_load_table_result_is_writable(tmp_path):
    p = str(tmp_path / "w.txt")
    with open(p, "w") as f:
        f.write("1 2 3\n4 5 6\n")
    t = load_table(p)
    t[0, 0] = 99.0  # zero-copy view over the native buffer must be owned
    assert t[0, 0] == 99.0


def test_model_grid_roundtrip_uses_native(tmp_path):
    """read_model_grid through the native path gives the same Grid as the
    numpy fallback."""
    from tests.util_fixtures import make_base_config
    from tomofastx_tpu.io import model_io, tableio

    cfg, grid_path, _ = make_base_config(str(tmp_path), 4, 3, 2, ndata=5)
    g1 = model_io.read_model_grid(grid_path, 4, 3, 2)

    orig = _native.lib
    try:
        _native_lib_none = lambda: None
        _native.lib = _native_lib_none
        g2 = model_io.read_model_grid(grid_path, 4, 3, 2)
    finally:
        _native.lib = orig
    for name in ("X1", "X2", "Y1", "Y2", "Z1", "Z2"):
        assert np.array_equal(getattr(g1, name), getattr(g2, name))


def test_load_table_missing_file_raises():
    with pytest.raises(Exception):
        load_table("/nonexistent/definitely_missing.txt")
