"""Fused on-device major loop: must reproduce the host-driven loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.inversion.joint import make_fused_solver, make_solver


def _system_with_data(dtype):
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    spec, arrays = ge._tiny_joint_system(dtype)
    rng = np.random.default_rng(7)
    arrays["val_meas"] = tuple(
        jnp.asarray(rng.normal(size=(nd, 1)), dtype) for nd in spec.ndata_rows
    )
    arrays["data_weight"] = tuple(
        jnp.asarray(1.0 + rng.random((nd, 1)), dtype) for nd in spec.ndata_rows
    )
    return spec, arrays


def _host_loop(spec, arrays, n_steps):
    """Reference host-driven loop (what workflow.py does per iteration)."""
    solver = make_solver(spec)
    model = [np.asarray(m) for m in arrays["model"]]
    z = list(arrays["admm_z"])
    u = list(arrays["admm_u"])
    rho = np.asarray(arrays["rho_admm"])

    def forward(model):
        ds = []
        for a, i in enumerate(spec.active):
            cw = np.asarray(arrays["cw"][a])[None, :]
            x = model[a] / cw
            from tomofastx_tpu.ops import wavelet as W

            xw = x.reshape(-1)
            if spec.compression_type > 0:
                xw = np.asarray(
                    W.forward_wavelet_flat(
                        jnp.asarray(x), spec.nx, spec.ny, spec.nz, spec.compression_type
                    )
                ).reshape(-1)
            d = np.asarray(arrays["S"][a].matvec(jnp.asarray(xw)))
            d = d.reshape(np.asarray(arrays["val_meas"][a]).shape)
            ds.append(d / spec.problem_weight[i] / np.asarray(arrays["data_weight"][a]))
        return ds

    for _ in range(n_steps):
        d_calc = forward(model)
        residuals = tuple(
            jnp.asarray(
                (np.asarray(arrays["data_weight"][a]) * (np.asarray(arrays["val_meas"][a]) - d_calc[a])).reshape(-1)
            )
            for a, i in enumerate(spec.active)
        )
        arr2 = dict(arrays)
        arr2.update(
            model=tuple(jnp.asarray(m) for m in model),
            admm_z=tuple(z), admm_u=tuple(u),
            rho_admm=jnp.asarray(rho), residuals=residuals,
        )
        out = solver(arr2)
        model = [m + np.asarray(d) for m, d in zip(model, out["delta"])]
        z = list(out["admm_z"])
        u = list(out["admm_u"])
    return model, z, u


def test_fused_matches_host_loop():
    spec, arrays = _system_with_data(jnp.float64)
    n = 3
    fused = make_fused_solver(spec, n)
    out = fused(arrays)

    model_ref, z_ref, u_ref = _host_loop(spec, arrays, n)
    for a in range(len(spec.active)):
        np.testing.assert_allclose(np.asarray(out["model"][a]), model_ref[a], rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(out["admm_z"][a]), np.asarray(z_ref[a]), atol=1e-11)

    per = out["per_iteration"]
    assert per["pre_cost_data"].shape == (n, 2)
    assert per["lsqr_iters"].shape == (n,)
    # First iteration starts from the initial model: pre-cost equals the
    # initial data cost.
    assert float(per["pre_cost_data"][0, 0]) > 0.0
    # Final cost equals the last post cost.
    np.testing.assert_allclose(
        np.asarray(out["final_cost_data"]), np.asarray(per["post_cost_data"][-1]), atol=1e-12
    )


def test_fused_active_steps_masking():
    """active_steps = k on an n-step program must equal a k-step program
    exactly: masked trailing steps advance NO state (model, ADMM duals,
    rho, d_calc) and the per-iteration rows of the first k steps match.
    This is what lets one compiled program serve every chunk length."""
    spec, arrays = _system_with_data(jnp.float64)
    import dataclasses

    # Make rho adjustment live so a leaking masked step would corrupt it.
    spec = dataclasses.replace(spec, admm_weight_multiplier=10.0, admm_cost_threshold=1e6)

    fused5 = make_fused_solver(spec, 5)
    fused2 = make_fused_solver(spec, 2)

    arr5 = dict(arrays)
    arr5["active_steps"] = jnp.asarray(2, jnp.int32)
    out5 = fused5(arr5)
    out2 = fused2(arrays)

    for a in range(len(spec.active)):
        np.testing.assert_array_equal(
            np.asarray(out5["model"][a]), np.asarray(out2["model"][a])
        )
        np.testing.assert_array_equal(
            np.asarray(out5["admm_z"][a]), np.asarray(out2["admm_z"][a])
        )
        np.testing.assert_array_equal(
            np.asarray(out5["admm_u"][a]), np.asarray(out2["admm_u"][a])
        )
    np.testing.assert_array_equal(
        np.asarray(out5["rho_admm"]), np.asarray(out2["rho_admm"])
    )
    np.testing.assert_array_equal(
        np.asarray(out5["final_cost_data"]), np.asarray(out2["final_cost_data"])
    )
    for key in ("pre_cost_data", "post_cost_data", "pre_cost_model", "rho"):
        np.testing.assert_array_equal(
            np.asarray(out5["per_iteration"][key])[:2],
            np.asarray(out2["per_iteration"][key]),
        )
    # Masked steps ran a 0-iteration LSQR.
    assert np.all(np.asarray(out5["per_iteration"]["lsqr_iters"])[2:] == 0)


def test_fused_admm_weight_growth():
    """The on-device dynamic rho adjustment multiplies rho when the data
    cost is under threshold."""
    import dataclasses

    spec, arrays = _system_with_data(jnp.float64)
    spec = dataclasses.replace(
        spec, admm_weight_multiplier=10.0, admm_cost_threshold=1e6  # always triggers
    )
    fused = make_fused_solver(spec, 2)
    out = fused(arrays)
    rho0 = np.asarray(arrays["rho_admm"])
    assert np.allclose(np.asarray(out["rho_admm"]), rho0 * 100.0)


def test_fused_workflow_matches_host_workflow(tmp_path):
    """Full Mansfield workflow with fused_chunk == host-driven loop."""
    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    REF = "/root/reference"
    cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
    cfg.path_output = str(tmp_path) + "/host/"
    cfg.inversion.ninversions = 5
    res_host = solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)

    cfg.path_output = str(tmp_path) + "/fused/"
    res_fused = solve_problem_joint_gravmag(
        cfg, base_dir=REF, verbose=False, fused_chunk=3
    )

    # Host residuals are computed in numpy, fused ones on device: summation
    # order differs at the last ulp, so agreement is near-f64, not bitwise.
    np.testing.assert_allclose(
        res_fused.models[0].val, res_host.models[0].val, rtol=1e-6, atol=1e-7
    )
    assert abs(res_fused.cost_data[0] - res_host.cost_data[0]) < 1e-8

    # costs.txt rows must agree (same 20-column layout and values).
    rows_h = open(str(tmp_path) + "/host/costs.txt").read().splitlines()
    rows_f = open(str(tmp_path) + "/fused/costs.txt").read().splitlines()
    assert len(rows_h) == len(rows_f)
    for lh, lf in zip(rows_h[1:], rows_f[1:]):
        vh = np.array([float(t) for t in lh.split()])
        vf = np.array([float(t) for t in lf.split()])
        np.testing.assert_allclose(vf, vh, rtol=1e-6, atol=1e-12)


def test_fused_workflow_on_mesh(tmp_path):
    """Fused chunks sharded over the 8-device mesh == unsharded fused."""
    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tomofastx_tpu.parallel.mesh import make_mesh

    REF = "/root/reference"
    cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
    cfg.path_output = str(tmp_path) + "/plain/"
    cfg.inversion.ninversions = 3
    res_plain = solve_problem_joint_gravmag(
        cfg, base_dir=REF, verbose=False, fused_chunk=3
    )

    cfg.path_output = str(tmp_path) + "/mesh/"
    res_mesh = solve_problem_joint_gravmag(
        cfg, base_dir=REF, verbose=False, fused_chunk=3, mesh=make_mesh(8)
    )
    # Sharded reductions reorder sums; differences compound across chained
    # major iterations, so parity is tolerance-based (SURVEY.md §7 hard
    # parts), not bitwise.
    np.testing.assert_allclose(
        res_mesh.models[0].val, res_plain.models[0].val, rtol=1e-5, atol=1e-6
    )


def test_fused_workflow_bttb_matches_host(tmp_path):
    """Mansfield with tpu.kernelFormat = matrixfree engages the FFT/BTTB
    operator (the fixture's 2x128 survey lies on the cell lattice at one
    height) and the fused on-device loop reproduces the host loop through
    it — the operator is a pytree carried into the jitted scan."""
    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tomofastx_tpu.io import data_io, model_io
    from tomofastx_tpu.ops.bttb import detect_bttb

    REF = "/root/reference"
    cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
    cfg.inversion.ninversions = 4
    # Compression off (matrix-free requires it): the Parfile key sets the
    # per-problem AND inversion fields together; mirror that here.
    cfg.grav.compression_type = 0
    cfg.inversion.compression_type = 0
    cfg.grav.kernel_format = "matrixfree"

    # The fixture must actually qualify for the FFT operator.
    import os

    grid = model_io.read_model_grid(
        os.path.join(REF, cfg.grav.model_grid_file),
        cfg.grav.nx, cfg.grav.ny, cfg.grav.nz, cfg.grav.z_axis_dir,
    )
    data = data_io.read_data_points(
        os.path.join(REF, cfg.grav.data_grid_file), cfg.grav.ndata,
        cfg.grav.ndata_components, cfg.grav.data_units_mult,
        cfg.grav.z_axis_dir, grid_only=True,
    )
    assert detect_bttb(grid, data) is not None

    cfg.path_output = str(tmp_path) + "/host/"
    res_host = solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)
    cfg.path_output = str(tmp_path) + "/fused/"
    res_fused = solve_problem_joint_gravmag(
        cfg, base_dir=REF, verbose=False, fused_chunk=4
    )
    np.testing.assert_allclose(
        res_fused.models[0].val, res_host.models[0].val, rtol=1e-6, atol=1e-7
    )
    assert abs(res_fused.cost_data[0] - res_host.cost_data[0]) < 1e-8
