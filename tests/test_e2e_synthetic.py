"""Synthetic end-to-end tests for capability paths without shipped fixtures:
magnetization-vector inversion (3 model components), FTG gradiometry (Gzz
and full tensor), clustering constraints, multiple prior models, data-error
weighting, elevation-space (z up) inputs, and the stop file."""

import os

import numpy as np
import pytest

from tests.util_fixtures import (
    make_base_config,
    surface_data_points,
    write_data_grid_file,
    write_values_file,
)
from tomofastx_tpu.config.parfile import GRAV, MAGN
from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

NX, NY, NZ = 6, 6, 4
N = NX * NY * NZ


def _synthetic_block_model(value=100.0, ncomp=1):
    """A dense block in the middle of the grid."""
    m = np.zeros((NZ, NY, NX, ncomp))
    m[1:3, 2:4, 2:4, :] = value
    return m.reshape(-1, ncomp)


def test_magnetization_vector_inversion(tmp_path):
    """nModelComponents = 3 (Mx, My, Mz) with TMI data and ADMM bounds on Mz
    (the 2-body remanent workflow, Parfile_2body_remanent.txt)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36, problem="magn")
    cfg.magn.nmodel_components = 3
    cfg.inversion.nmodel_components = 3
    synth = os.path.join(tmp, "synth3.txt")
    write_values_file(synth, _synthetic_block_model(2.0, ncomp=3))
    cfg.magn.use_synthetic_model = 1
    cfg.magn.synthetic_model_file = synth
    cfg.inversion.alpha = (1e-11, 1e-8)
    cfg.inversion.admm_type = 1
    cfg.inversion.nlithos = 1
    cfg.inversion.admm_bounds = (None, [-5.0, 5.0])
    cfg.inversion.ninversions = 4

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[MAGN] < 0.3
    assert res.models[MAGN].val.shape == (3, N)
    assert np.all(np.isfinite(res.models[MAGN].val))


def test_ftg_gzz_inversion(tmp_path):
    """Gravity gradiometry, Gzz only (forward.data.grav.type = 2)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    cfg.grav.data_type = 2
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[GRAV] < 0.2


def test_ftg_full_tensor_inversion(tmp_path):
    """Full 6-component FTG tensor (nDataComponents = 6)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=18)
    # Rewrite the data file with 6 value columns.
    X, Y, Z = surface_data_points(NX, NY)
    idx = np.linspace(0, len(X) - 1, 18).astype(int)
    write_data_grid_file(data_path, X[idx], Y[idx], Z[idx], ncomponents=6)
    cfg.grav.data_type = 2
    cfg.grav.ndata_components = 6
    cfg.inversion.ndata_components = (6, 1)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.data[GRAV].val_calc.shape == (18, 6)
    assert res.cost_data[GRAV] < 0.2


def test_clustering_constraints(tmp_path):
    """Joint grav+mag inversion with a 2-cluster petrophysical prior."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    cfg.magn.model_grid_file = grid_path
    cfg.magn.ndata = 36
    cfg.magn.data_grid_file = data_path
    cfg.inversion.ndata = (36, 36)
    cfg.inversion.problem_weight = (1.0, 1.0e-3)

    synth_g = os.path.join(tmp, "sg.txt")
    synth_m = os.path.join(tmp, "sm.txt")
    write_values_file(synth_g, _synthetic_block_model(300.0))
    write_values_file(synth_m, _synthetic_block_model(0.05))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth_g
    cfg.magn.use_synthetic_model = 1
    cfg.magn.synthetic_model_file = synth_m

    mixture = os.path.join(tmp, "mixture.txt")
    with open(mixture, "w") as f:
        f.write("2\n")
        # weight mu1 sigma11 mu2 sigma22 sigma12
        f.write("0.5 0.0 20.0 0.0 0.01 0.0\n")
        f.write("0.5 300.0 20.0 0.05 0.01 0.0\n")
    cfg.inversion.clustering_weight_glob = (1e-4, 1e-4)
    cfg.inversion.nclusters = 2
    cfg.inversion.mixture_file = mixture
    cfg.inversion.clustering_constraints_type = 1  # global weights
    cfg.inversion.clustering_opt_type = 2
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert np.all(np.isfinite(res.models[GRAV].val))
    out = cfg.path_output
    assert os.path.exists(os.path.join(out, "Paraview/clustering_final_model3D_full.vtk"))
    # costs.txt records clustering costs in columns 19-20.
    lines = open(os.path.join(out, "costs.txt")).read().splitlines()
    row = lines[2].split()
    assert float(row[18]) > 0.0


def test_multiple_prior_models(tmp_path):
    """inversion.priorModel.nModels = 2 creates the _2 output folder
    (problem_joint_gravmag.F90:374-391)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    prior1 = os.path.join(tmp, "prior.txt")
    prior2 = os.path.join(tmp, "prior.txt_2")
    write_values_file(prior1, np.zeros((N, 1)))
    write_values_file(prior2, np.full((N, 1), 10.0))
    cfg.grav.prior_model_type = 2
    cfg.grav.prior_model_file = prior1
    cfg.grav.number_prior_models = 2
    cfg.inversion.ninversions = 2

    solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert os.path.exists(os.path.join(cfg.path_output, "costs.txt"))
    assert os.path.exists(cfg.path_output.rstrip("/") + "_2/costs.txt")


def test_data_error_weighting(tmp_path):
    """forward.data.*.useError = 1 bakes 1/sigma into residuals and kernel."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    err = os.path.join(tmp, "err.txt")
    with open(err, "w") as f:
        f.write("36\n")
        for _ in range(36):
            f.write("1.0e-6\n")
    cfg.grav.use_data_error = 1
    cfg.grav.data_error_file = err
    cfg.inversion.ninversions = 2

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert np.all(res.data[GRAV].weight == 1e6)
    assert res.cost_data[GRAV] < 0.5


def test_elevation_space_z_up(tmp_path):
    """global.zAxisDirection = -1: grids and data are given in elevation
    space and flipped on input (model_IO.F90:226-232,
    data_gravmag.f90:186-189)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)

    # Rewrite grid + data in elevation space (z up: depths negated and
    # corner order swapped).
    from tests.util_fixtures import write_grid_file

    with open(grid_path) as f:
        lines = f.read().splitlines()
    with open(grid_path, "w") as f:
        f.write(lines[0] + "\n")
        for ln in lines[1:]:
            t = ln.split()
            x1, x2, y1, y2, z1, z2 = (float(v) for v in t[:6])
            f.write(f"{x1} {x2} {y1} {y2} {-z2} {-z1} {t[6]} {t[7]} {t[8]}\n")
    X, Y, Z = surface_data_points(NX, NY)
    idx = np.linspace(0, len(X) - 1, 36).astype(int)
    write_data_grid_file(data_path, X[idx], Y[idx], -Z[idx])  # z up

    cfg.grav.z_axis_dir = -1
    cfg.magn.z_axis_dir = -1
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 2

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[GRAV] < 0.5


def test_stop_file(tmp_path, monkeypatch):
    """A 'stop' file in the base dir exits the major loop
    (problem_joint_gravmag.F90:476-479, 680-700)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 50
    # The stop file is polled in the cwd (reference semantics,
    # problem_joint_gravmag.F90:688) or in the run's output folder (since
    # input trees may be read-only).
    os.makedirs(cfg.path_output, exist_ok=True)
    with open(os.path.join(cfg.path_output, "stop"), "w") as f:
        f.write("")

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert len(res.costs_history) == 0  # loop exited before iteration 1


def test_magnetic_three_component_data(tmp_path):
    """ndata_components = 3 magnetic data (Bx, By, Bz)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=18, problem="magn")
    X, Y, Z = surface_data_points(NX, NY)
    idx = np.linspace(0, len(X) - 1, 18).astype(int)
    write_data_grid_file(data_path, X[idx], Y[idx], Z[idx], ncomponents=3)
    cfg.magn.ndata_components = 3
    cfg.inversion.ndata_components = (1, 3)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(0.05))
    cfg.magn.use_synthetic_model = 1
    cfg.magn.synthetic_model_file = synth
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.data[MAGN].val_calc.shape == (18, 3)
    assert res.cost_data[MAGN] < 0.2


def test_admm_local_bounds_file(tmp_path):
    """inversion.admm.boundType = 2: per-cell bounds + weights from file
    (model_IO.F90:312-380); also forces WAVELET_DOMAIN = False."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth

    bounds = os.path.join(tmp, "bounds.txt")
    with open(bounds, "w") as f:
        f.write(f"{N} 2\n")
        for _ in range(N):
            f.write("-10. 10. 280. 320. 1.0\n")
    cfg.inversion.admm_type = 1
    cfg.inversion.admm_bound_type = 2
    cfg.inversion.nlithos = 2
    cfg.inversion.bounds_ADMM_file = (bounds, "None")
    cfg.inversion.rho_ADMM = (1e-5, 1e5)
    cfg.grav.compression_type = 1
    cfg.magn.compression_type = 1
    cfg.inversion.compression_type = 1
    cfg.grav.compression_rate = 0.4
    cfg.inversion.ninversions = 6

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    m = res.models[GRAV].val[0]
    dist = np.minimum(
        np.maximum(np.maximum(-10 - m, m - 10), 0),
        np.maximum(np.maximum(280 - m, m - 320), 0),
    )
    assert np.quantile(dist, 0.9) < 60.0


def test_admm_dynamic_weight_adjustment(tmp_path):
    """weightMultiplier > 1 grows rho once the data cost crosses the
    threshold (problem_joint_gravmag.F90:618-638)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.admm_type = 1
    cfg.inversion.nlithos = 1
    cfg.inversion.admm_bounds = ([-400.0, 400.0], None)
    cfg.inversion.rho_ADMM = (1e-7, 1e5)
    cfg.inversion.weight_multiplier_ADMM = 10.0
    cfg.inversion.data_cost_threshold_ADMM = 1.0  # always triggers
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    lines = open(os.path.join(cfg.path_output, "costs.txt")).read().splitlines()
    rho_col = [float(l.split()[7]) for l in lines[1:-1]]
    assert rho_col[-1] > rho_col[0]  # grew by the multiplier


def test_lp_norm_damping_e2e(tmp_path):
    """inversion.modelDamping.normPower = 1 exercises the Lp reweighting."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.alpha = (1e-6, 1e-8)
    cfg.inversion.norm_power = 1.0
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[GRAV] < 0.5


def test_magnetization_vector_with_compression(tmp_path):
    """nModelComponents = 3 with wavelet compression: per-component 3-D
    transforms and thresholds (sensitivity_gravmag.F90:222-272)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36, problem="magn")
    cfg.magn.nmodel_components = 3
    cfg.inversion.nmodel_components = 3
    synth = os.path.join(tmp, "synth3.txt")
    write_values_file(synth, _synthetic_block_model(2.0, ncomp=3))
    cfg.magn.use_synthetic_model = 1
    cfg.magn.synthetic_model_file = synth
    cfg.magn.compression_type = 1
    cfg.grav.compression_type = 1
    cfg.inversion.compression_type = 1
    cfg.magn.compression_rate = 0.5
    cfg.inversion.ninversions = 3

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[MAGN] < 0.5
    assert np.all(np.isfinite(res.models[MAGN].val))


def test_min_distance_depth_weighting(tmp_path):
    """forward.depthWeighting.type = 3 (min-distance weighting,
    weights_gravmag.f90:140-161)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    cfg.grav.depth_weighting_type = 3
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 2

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert res.cost_data[GRAV] < 0.5


def test_sensit_read_2_reuses_depth_weight(tmp_path):
    """sensit.readFromFiles = 2: the depth weight is read from the cache but
    the kernel is recomputed (problem_joint_gravmag.F90:189-202)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 2
    res1 = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    cfg2 = cfg
    cfg2.path_output = tmp + "/out2/"
    cfg2.grav.sensit_read = 2
    cfg2.magn.sensit_read = 2
    cfg2.grav.sensit_path = os.path.join(tmp, "out", "SENSIT") + "/"
    # make_base_config put output at tmp/out/
    import glob

    sensit_dirs = glob.glob(tmp + "/**/SENSIT", recursive=True)
    cfg2.grav.sensit_path = sensit_dirs[0] + "/"
    res2 = solve_problem_joint_gravmag(cfg2, base_dir="/", verbose=False)
    np.testing.assert_allclose(res2.models[GRAV].val, res1.models[GRAV].val, atol=1e-9)


def test_sensit_read_uses_stored_weight_not_parfile(tmp_path):
    """The reference takes the depth weight from the cache for BOTH read
    modes: it is computed only when sensit_read = 0
    (problem_joint_gravmag.F90:171-193) and read_sensitivity_kernel
    unconditionally re-reads it from file (sensitivity_gravmag.F90:873-879).
    A weighting config changed between cache write and reload must therefore
    be IGNORED: read = 1 reuses the stored kernel and weight verbatim;
    read = 2 recomputes the kernel but still with the stored weight."""
    tmp = str(tmp_path)

    def make(out, power, mult):
        cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
        cfg.path_output = tmp + f"/{out}/"
        synth = os.path.join(tmp, "synth.txt")
        write_values_file(synth, _synthetic_block_model(300.0))
        cfg.grav.use_synthetic_model = 1
        cfg.grav.synthetic_model_file = synth
        cfg.grav.depth_weighting_power = power
        cfg.inversion.column_weight_multiplier = (mult, cfg.inversion.column_weight_multiplier[1])
        cfg.inversion.ninversions = 2
        return cfg

    res0 = solve_problem_joint_gravmag(make("w0", 2.0, 4.0e3), base_dir="/", verbose=False)
    sensit_dir = tmp + "/w0/SENSIT/"

    # Negative control: the changed weighting config DOES change the result
    # when actually recomputed (read = 0) — so the reuse assertions below
    # prove the stored weight was used, not that the config is inert.
    res_neg = solve_problem_joint_gravmag(make("wneg", 3.5, 1.0), base_dir="/", verbose=False)
    assert not np.allclose(res_neg.models[GRAV].val, res0.models[GRAV].val, atol=1e-6)

    # read = 1 with a CHANGED weighting config: stored kernel + weight win.
    cfg1 = make("w1", 3.5, 1.0)
    cfg1.grav.sensit_read = 1
    cfg1.magn.sensit_read = 1
    cfg1.grav.sensit_path = sensit_dir
    res1 = solve_problem_joint_gravmag(cfg1, base_dir="/", verbose=False)
    np.testing.assert_allclose(res1.models[GRAV].val, res0.models[GRAV].val, atol=1e-9)

    # read = 2 with a CHANGED weighting config: kernel recomputed, but with
    # the STORED weight — still identical to the original run.
    cfg2 = make("w2", 3.5, 1.0)
    cfg2.grav.sensit_read = 2
    cfg2.magn.sensit_read = 2
    cfg2.grav.sensit_path = sensit_dir
    res2 = solve_problem_joint_gravmag(cfg2, base_dir="/", verbose=False)
    np.testing.assert_allclose(res2.models[GRAV].val, res0.models[GRAV].val, atol=1e-9)


def test_units_multipliers(tmp_path):
    """global.*.dataUnitsMultiplier and modelUnitsMultiplier convert on
    input and divide back on output (Parameters_all.txt:17-23)."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 3
    res_plain = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    cfg.path_output = tmp + "/out_units/"
    cfg.grav.data_units_mult = 1.0e-5  # e.g. input data in mGal
    cfg.grav.model_units_mult = 1.0e3
    res_units = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    # The internal model is scaled by the multiplier; the written ASCII model
    # divides it back out, so files agree with the unscaled run.
    from tomofastx_tpu.io.model_io import read_model_values

    m_plain = read_model_values(tmp + "/out/model/grav_final_model_full.txt", N, 1)
    m_units = read_model_values(tmp + "/out_units/model/grav_final_model_full.txt", N, 1)
    np.testing.assert_allclose(m_units, m_plain, rtol=1e-4, atol=1e-6)


def test_intermediate_model_snapshots(tmp_path):
    """inversion.writeModelEveryNiter writes restartable snapshots
    (problem_joint_gravmag.F90:504-509), in both loop modes."""
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, _synthetic_block_model(300.0))
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 4
    cfg.inversion.write_model_niter = 2
    solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    out = cfg.path_output
    assert os.path.exists(os.path.join(out, "Paraview/grav_inter_2_model3D_full.vtk"))
    assert os.path.exists(os.path.join(out, "Paraview/grav_inter_4_model3D_full.vtk"))

    cfg.path_output = tmp + "/fused/"
    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False, fused_chunk=3)
    assert os.path.exists(tmp + "/fused/Paraview/grav_inter_2_model3D_full.vtk")
    assert os.path.exists(tmp + "/fused/Paraview/grav_inter_4_model3D_full.vtk")


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Crash-resume: a run checkpointed at iteration 4 and resumed to 6
    equals an uninterrupted 6-iteration run (model + ADMM duals + rho are
    all restored — beyond the reference's model-snapshot-only restart)."""
    tmp = str(tmp_path)

    def make(out):
        cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=36)
        synth = os.path.join(tmp, "synth.txt")
        write_values_file(synth, _synthetic_block_model(300.0))
        cfg.grav.use_synthetic_model = 1
        cfg.grav.synthetic_model_file = synth
        cfg.inversion.admm_type = 1
        cfg.inversion.nlithos = 1
        cfg.inversion.admm_bounds = ([-50.0, 350.0], None)
        cfg.inversion.rho_ADMM = (1e-5, 1e5)
        cfg.inversion.write_model_niter = 2
        cfg.path_output = tmp + "/" + out + "/"
        return cfg

    # Uninterrupted 6 iterations.
    cfg_full = make("full")
    cfg_full.inversion.ninversions = 6
    res_full = solve_problem_joint_gravmag(cfg_full, base_dir="/", verbose=False)

    # Interrupted: 4 iterations (checkpoint lands at it=4), then resume to 6.
    cfg_a = make("resumed")
    cfg_a.inversion.ninversions = 4
    solve_problem_joint_gravmag(cfg_a, base_dir="/", verbose=False)
    assert os.path.exists(tmp + "/resumed/checkpoint.npz")

    cfg_b = make("resumed")
    cfg_b.inversion.ninversions = 6
    res_resumed = solve_problem_joint_gravmag(
        cfg_b, base_dir="/", verbose=False, resume=True
    )

    np.testing.assert_allclose(
        res_resumed.models[GRAV].val, res_full.models[GRAV].val, rtol=1e-8, atol=1e-9
    )


def test_wavelet_domain_solve_matches_model_domain(tmp_path):
    """WAVELET_DOMAIN = True (solve for the update in wavelet coordinates,
    joint_inverse_problem.F90:189-200): triggered when compression is on
    and only damping-type constraints are active. A/B against the same
    system with a negligible damping-gradient weight (beta = 1e-20), which
    flips the decision to model-domain while leaving the math unchanged —
    both parameterizations must converge to the same model."""
    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import GRAV
    from tomofastx_tpu.inversion.joint import decide_wavelet_domain
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tests.util_fixtures import make_base_config, write_values_file

    nx, ny, nz, nd = 8, 8, 8, 36

    def build(tag, beta):
        rng = np.random.default_rng(3)  # same true model for both runs
        cfg, grid_path, _ = make_base_config(str(tmp_path), nx, ny, nz, nd)
        cfg.path_output = str(tmp_path) + f"/out_{tag}/"
        true_path = str(tmp_path / "true_vals.txt")
        write_values_file(true_path, 100.0 * rng.standard_normal((nx * ny * nz, 1)))
        cfg.grav.use_synthetic_model = 1
        cfg.grav.synthetic_model_file = true_path
        cfg.grav.compression_type = 1
        cfg.grav.compression_rate = 0.4
        cfg.inversion.compression_type = 1
        cfg.inversion.compression_rate = 0.4
        cfg.inversion.alpha = (1e-9, 1e-9)
        cfg.inversion.beta = (beta, 0.0)
        cfg.inversion.ninversions = 4
        cfg.inversion.niter = 100
        return cfg

    cfg_w = build("wav", 0.0)
    assert decide_wavelet_domain(cfg_w.inversion) is True
    res_w = solve_problem_joint_gravmag(cfg_w, base_dir="/", verbose=False)

    cfg_m = build("mod", 1e-20)
    assert decide_wavelet_domain(cfg_m.inversion) is False
    res_m = solve_problem_joint_gravmag(cfg_m, base_dir="/", verbose=False)

    assert res_w.cost_data[GRAV] < 1e-4
    np.testing.assert_allclose(
        res_w.models[GRAV].val, res_m.models[GRAV].val, rtol=1e-4, atol=1e-4
    )


def test_compensated_f32_build_on_irregular_grid(tmp_path):
    """Round-3 verdict item 3 gate: on a NON-lattice (topography) grid —
    where neither the corner-lattice f64 build nor f64BuildF32Compress
    apply — the compensated-f32 build (far-field quadrature, pure f32)
    must land within 1e-3 of the f64 anchor's truth correlation."""
    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import parse_parfile_lines
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops.matrixfree import detect_lattice
    from tests.util_fixtures import write_data_grid_file, write_values_file

    tmp = str(tmp_path)
    nx, ny, nz = 32, 32, 8
    n = nx * ny * nz
    hx, hy, hz = 100.0, 100.0, 50.0
    grid_path = os.path.join(tmp, "grid.txt")
    with open(grid_path, "w") as f:
        f.write(f"{n}\n")
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    # Smooth per-column topography offset: breaks the
                    # tensor-product lattice (z edges vary by column).
                    topo = 15.0 + 14.0 * np.sin(0.4 * i) * np.cos(0.3 * j)
                    f.write(
                        f"{i * hx:.3f} {(i + 1) * hx:.3f} "
                        f"{j * hy:.3f} {(j + 1) * hy:.3f} "
                        f"{topo + k * hz:.3f} {topo + (k + 1) * hz:.3f} "
                        f"{i + 1} {j + 1} {k + 1}\n"
                    )

    ndata = 256
    gx, gy = np.meshgrid(
        (np.arange(16) + 0.5) * nx * hx / 16,
        (np.arange(16) + 0.5) * ny * hy / 16, indexing="ij",
    )
    data_path = os.path.join(tmp, "data.txt")
    write_data_grid_file(data_path, gx.ravel(), gy.ravel(), np.full(ndata, -1.0))

    true = np.zeros((nz, ny, nx))
    true[2:5, 6:12, 6:12] = 500.0
    true[1:4, 20:27, 18:26] = -400.0
    synth = os.path.join(tmp, "synth.txt")
    write_values_file(synth, true.reshape(-1, 1))

    def run(tag, compute_dtype):
        cfg = parse_parfile_lines([
            f"global.outputFolderPath = {tmp}/out_{tag}/\n",
            f"modelGrid.size = {nx} {ny} {nz}\n",
            f"modelGrid.grav.file = {grid_path}\n",
            f"forward.data.grav.nData = {ndata}\n",
            f"forward.data.grav.dataGridFile = {data_path}\n",
            "forward.depthWeighting.type = 1\n",
            "forward.depthWeighting.grav.power = 2.0\n",
            "forward.matrixCompression.type = 0\n",
            "inversion.nMajorIterations = 20\n",
            "inversion.nMinorIterations = 40\n",
            "inversion.modelDamping.grav.weight = 1e-7\n",
            "forward.data.grav.useSyntheticModelForDataValues = 1\n",
            f"forward.data.grav.syntheticModelFile = {synth}\n",
        ])
        res = solve_problem_joint_gravmag(
            cfg, base_dir="/", verbose=False, compute_dtype=compute_dtype
        )
        m = np.asarray(res.models[GRAV].val).reshape(-1)
        return np.corrcoef(m, true.reshape(-1))[0, 1]

    # The fixture must actually be non-lattice, or this test silently
    # stops covering the general per-cell path.
    from tomofastx_tpu.io.model_io import read_model_grid

    grid = read_model_grid(grid_path, nx, ny, nz)
    assert detect_lattice(grid) is None

    corr64 = run("f64", jnp.float64)
    corr32q = run("f32quad", jnp.float32)  # far_field_quad defaults on
    assert abs(corr32q - corr64) <= 1e-3, (
        f"compensated-f32 deviates from the f64 anchor: "
        f"{corr32q:.6f} vs {corr64:.6f}"
    )
