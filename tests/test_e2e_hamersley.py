"""End-to-end tests on the Hamersley real-data fixtures (13x133x33 cells,
113 observed data): gravity-only, magnetics-only, and the cross-gradient
joint inversion (parfiles/hamersley/*)."""

import numpy as np
import pytest

from tomofastx_tpu.config.parfile import GRAV, MAGN, read_parfile
from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

REF = "/root/reference"
HAM = f"{REF}/parfiles/hamersley"


def _run(parfile, tmp_path, niter):
    cfg = read_parfile(parfile)
    cfg.path_output = str(tmp_path) + "/"
    cfg.inversion.ninversions = niter
    return cfg, solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)


def test_hamersley_grav(tmp_path):
    cfg, res = _run(f"{HAM}/Parfile_hamersley_grav.txt", tmp_path, 3)
    assert res.cost_data[GRAV] < 0.05
    assert GRAV in res.models and MAGN not in res.models


def test_hamersley_mag(tmp_path):
    cfg, res = _run(f"{HAM}/Parfile_hamersley_mag.txt", tmp_path, 3)
    assert res.cost_data[MAGN] < 0.05


def test_hamersley_xgrad_joint(tmp_path):
    """Joint gravity + magnetics with cross-gradient structural coupling
    (weight 80, derivative type 1)."""
    cfg, res = _run(f"{HAM}/Parfile_hamersley_xgrad_joint.txt", tmp_path, 4)
    assert cfg.inversion.cross_grad_weight == 80.0
    assert res.cost_data[GRAV] < 0.1
    assert res.cost_data[MAGN] < 0.1
    # Both models produced, finite.
    for i in (GRAV, MAGN):
        assert np.all(np.isfinite(res.models[i].val))
    # The cross-gradient magnitude output exists.
    import os

    assert os.path.exists(
        str(tmp_path) + "/Paraview/cross_grad_final_model3D_full.vtk"
    )


def test_noddy_mag_simple(tmp_path):
    """Noddy ellipsoid magnetic inversion from synthetic susceptibility."""
    cfg, res = _run(f"{REF}/parfiles/noddy/Parfile_Noddy_mag_ellipsoid_simple.txt", tmp_path, 2)
    assert res.cost_data[MAGN] < 1e-3
