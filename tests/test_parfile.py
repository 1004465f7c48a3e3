"""Parfile parser tests against the shipped reference parfiles."""

import glob

import pytest

from tomofastx_tpu.config.parfile import GRAV, MAGN, parse_parfile_lines, read_parfile

REF = "/root/reference/parfiles"


def test_mansf_slice():
    cfg = read_parfile(f"{REF}/Parfile_mansf_slice.txt")
    g, inv = cfg.grav, cfg.inversion
    assert (g.nx, g.ny, g.nz) == (2, 128, 32)
    assert g.ndata == 256
    assert g.use_synthetic_model == 1
    assert g.depth_weighting_type == 1
    assert g.depth_weighting_power == 2.0
    assert g.compression_type == 1
    assert g.compression_rate == 0.15
    assert inv.ninversions == 60
    assert inv.niter == 100
    assert inv.rmin == 1e-13
    assert inv.alpha[GRAV] == 0.0
    assert inv.problem_weight == (1.0, 0.0)
    assert inv.admm_type == 1
    assert inv.nlithos == 3
    assert inv.admm_bounds[GRAV] == [-20.0, 20.0, 90.0, 130.0, 220.0, 260.0]
    assert inv.rho_ADMM[GRAV] == 1e-5
    assert cfg.solve_problem(GRAV) and not cfg.solve_problem(MAGN)


def test_2body_induced():
    cfg = read_parfile(f"{REF}/Parfile_2body_induced.txt")
    m = cfg.magn
    assert m.nmodel_components == 3
    assert cfg.inversion.problem_weight[MAGN] != 0.0


def test_defaults():
    cfg = parse_parfile_lines([])
    assert cfg.inversion.alpha == (1.0e-11, 1.0e-8)
    assert cfg.inversion.column_weight_multiplier == (4.0e3, 1.0)
    assert cfg.grav.depth_weighting_type == 2
    assert cfg.magn.depth_weighting_power == 3.0
    assert cfg.magn.mi == 90.0
    assert cfg.magn.intensity == 50000.0
    assert cfg.inversion.nclusters == 4
    assert cfg.inversion.clustering_opt_type == 2


def test_fortran_literals_and_comments():
    cfg = parse_parfile_lines(
        [
            "# a comment\n",
            "====================\n",
            "inversion.modelDamping.grav.weight = 1.d-11  # trailing comment\n",
            "inversion.admm.grav.bounds = -20. 20. 90. 130.\n",
            "inversion.admm.nLithologies = 2\n",
            "inversion.admm.enableADMM = 1\n",
        ]
    )
    assert cfg.inversion.alpha[GRAV] == 1e-11
    assert cfg.inversion.admm_bounds[GRAV] == [-20.0, 20.0, 90.0, 130.0]


@pytest.mark.parametrize("path", sorted(glob.glob(f"{REF}/**/*.txt", recursive=True)))
def test_all_shipped_parfiles_parse(path):
    cfg = read_parfile(path, warn_unknown=False)
    assert cfg.grav.nx > 0 and cfg.grav.ny > 0 and cfg.grav.nz > 0


def test_unknown_key_warns(capsys):
    import sys

    parse_parfile_lines(["bogus.key = 42\n"])
    assert "unknown Parfile key" in capsys.readouterr().err


def test_magnetisation_vector_requires_gravity_disabled():
    """Reference parity: parameters_init.f90:192-196 rejects
    nModelComponents > 1 while the gravity problem is enabled."""
    with pytest.raises(ValueError, match="gravity problem should be disabled"):
        parse_parfile_lines(
            [
                "modelGrid.size = 2 2 2\n",
                "modelGrid.magn.nModelComponents = 3\n",
                "inversion.joint.grav.problemWeight = 1.0\n",
                "inversion.joint.magn.problemWeight = 1.0\n",
            ]
        )
