"""CLI-level tests: drive ``cli.main()`` through real Parfile text files.

The reference's CLI is exercised by its shipped-parfile acceptance runs
(README.md:50-56); these tests cover the argv surface the workflow-level
tests bypass — in particular ``--resume``, which round 2 shipped parsed
but never forwarded.
"""

import os

import numpy as np
import pytest

from tests.util_fixtures import (
    surface_data_points,
    write_data_grid_file,
    write_grid_file,
    write_values_file,
)
from tomofastx_tpu import cli

NX, NY, NZ, NDATA = 6, 6, 5, 25


def _write_parfile(tmp, out, ninversions, extra=()):
    grid_path = os.path.join(tmp, "grid.txt")
    data_path = os.path.join(tmp, "data.txt")
    synth_path = os.path.join(tmp, "synth.txt")
    if not os.path.exists(grid_path):
        write_grid_file(grid_path, NX, NY, NZ)
        X, Y, Z = surface_data_points(NX, NY)
        idx = np.linspace(0, len(X) - 1, NDATA).astype(int)
        write_data_grid_file(data_path, X[idx], Y[idx], Z[idx])
        vals = np.zeros((NX * NY * NZ, 1))
        vals[NX * NY : 2 * NX * NY] = 300.0
        write_values_file(synth_path, vals)
    lines = [
        f"global.outputFolderPath = {tmp}/{out}/",
        f"modelGrid.size = {NX} {NY} {NZ}",
        f"modelGrid.grav.file = {grid_path}",
        f"forward.data.grav.nData = {NDATA}",
        f"forward.data.grav.dataGridFile = {data_path}",
        "forward.data.grav.useSyntheticModelForDataValues = 1",
        f"forward.data.grav.syntheticModelFile = {synth_path}",
        "forward.depthWeighting.type = 1",
        f"inversion.nMajorIterations = {ninversions}",
        "inversion.nMinorIterations = 30",
        "inversion.writeModelEveryNiter = 2",
        "inversion.admm.enableADMM = 1",
        "inversion.admm.nLithologies = 1",
        "inversion.admm.grav.bounds = -50.0 350.0",
        "inversion.admm.grav.weight = 1.e-5",
        "inversion.admm.weightMultiplier = 2.0",
        *extra,
    ]
    path = os.path.join(tmp, f"Parfile_{out}_{ninversions}.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def _read_final_model(tmp, out):
    from tomofastx_tpu.io.model_io import read_model_values

    return read_model_values(
        os.path.join(tmp, out, "model", "grav_final_model_full.txt"), NX * NY * NZ, 1
    )


def test_cli_end_to_end(tmp_path, capsys):
    """``python -m tomofastx_tpu -p Parfile`` runs to THE END and writes the
    final model + provenance Parfile copy (program_tomofastx.F90:77-101)."""
    tmp = str(tmp_path)
    parfile = _write_parfile(tmp, "out", 2)
    rc = cli.main(["-p", parfile, "--quiet"])
    assert rc == 0
    assert "THE END" in capsys.readouterr().out
    assert os.path.exists(os.path.join(tmp, "out", "Parfile_run.txt"))
    assert _read_final_model(tmp, "out").shape == (1, NX * NY * NZ)


def test_cli_resume_matches_uninterrupted(tmp_path):
    """--resume must actually reach the workflow: a run interrupted at the
    it=4 checkpoint and resumed to 6 equals an uninterrupted 6-iteration
    run. Red when cli.main drops the flag (the round-2 bug: parsed but
    never forwarded)."""
    tmp = str(tmp_path)

    # Uninterrupted 6 iterations.
    rc = cli.main(["-p", _write_parfile(tmp, "full", 6), "--quiet"])
    assert rc == 0

    # Interrupted at 4 (checkpoint.npz lands at it=4), resumed to 6.
    rc = cli.main(["-p", _write_parfile(tmp, "res", 4), "--quiet"])
    assert rc == 0
    ckpt = os.path.join(tmp, "res", "checkpoint.npz")
    assert os.path.exists(ckpt)
    with np.load(ckpt) as z:
        assert int(z["it"]) == 4

    rc = cli.main(["-p", _write_parfile(tmp, "res", 6), "--quiet", "--resume"])
    assert rc == 0
    with np.load(ckpt) as z:
        assert int(z["it"]) == 6, "resume flag never reached the workflow"

    np.testing.assert_allclose(
        _read_final_model(tmp, "res"), _read_final_model(tmp, "full"),
        rtol=1e-8, atol=1e-9,
    )


def test_cli_missing_parfile_errors(capsys):
    rc = cli.main(["-p", "/nonexistent/Parfile.txt", "--quiet"])
    assert rc == 1
    assert "ERROR" in capsys.readouterr().err


def test_cli_requires_parfile():
    with pytest.raises(SystemExit):
        cli.main(["--quiet"])


def test_cli_build_precision_single(tmp_path, capsys):
    """--build-precision single runs the compensated-f32 build end-to-end
    (far-field quadrature on by default) and still converges."""
    import os

    from tomofastx_tpu import cli

    out = tmp_path / "out"
    parfile = tmp_path / "Parfile.txt"
    parfile.write_text(
        "global.outputFolderPath = " + str(out) + "/\n"
        "modelGrid.size = 13 133 33\n"
        "modelGrid.grav.file = data/gravmag/hamersley/grav_grid.txt\n"
        "forward.data.grav.nData = 113\n"
        "forward.data.grav.dataGridFile = "
        "data/gravmag/hamersley/grav_observed_data.txt\n"
        "forward.depthWeighting.type = 1\n"
        "forward.depthWeighting.grav.power = 2.0\n"
        "inversion.nMajorIterations = 2\n"
        "inversion.nMinorIterations = 30\n"
        "inversion.modelDamping.grav.weight = 1e-7\n"
    )
    rc = cli.main([
        "-p", str(parfile), "--base-dir", "/root/reference",
        "--build-precision", "single", "--platform", "cpu", "-q",
    ])
    assert rc == 0
    assert os.path.exists(out / "costs.txt")
    rows = [
        line for line in open(out / "costs.txt") if not line.startswith("#")
    ]
    final_cost = float(rows[-1].split()[1])
    assert final_cost < 0.05
