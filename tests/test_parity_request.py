"""Golden-request packet tests (convert/parity.py `request` subcommand).

The packet must be self-contained and byte-reproducible: the probe arrays
match probe_inputs()/ghost_probe_points() exactly (so `dump` on this side
and `golden_runner.py` on a reference machine see identical inputs), and
the embedded torch runner must at least be valid Python.
"""

import json

import numpy as np

from act3d_tpu.convert.parity import (
    ghost_probe_points,
    main as parity_main,
    probe_inputs,
)

BOUNDS = np.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])


def test_request_act3d_packet(tmp_path):
    out = tmp_path / "req"
    parity_main(["request", "--model", "act3d", "--out", str(out)])

    assert (out / "golden_runner.py").exists()
    assert (out / "README.md").exists()
    data = np.load(out / "probe.npz")
    config = json.loads(str(data["config"]))
    assert config["model"] == "act3d"
    assert config["num_sampling_level"] == 3

    probe = probe_inputs("act3d")
    for k, v in probe.items():
        np.testing.assert_array_equal(data[k], v)
    for i, g in enumerate(ghost_probe_points(BOUNDS, 3)):
        np.testing.assert_array_equal(data[f"ghost_level{i}"], g)

    src = (out / "golden_runner.py").read_text()
    compile(src, "golden_runner.py", "exec")  # syntax-valid standalone script


def test_request_diffusion_packet(tmp_path):
    out = tmp_path / "req"
    parity_main(["request", "--model", "diffusion", "--out", str(out)])
    data = np.load(out / "probe.npz")
    config = json.loads(str(data["config"]))
    assert config["model"] == "diffusion"
    assert config["diffusion_timesteps"] == 100
    probe = probe_inputs("diffusion")
    for k, v in probe.items():
        np.testing.assert_array_equal(data[k], v)
    np.testing.assert_array_equal(data["gripper_loc_bounds"], BOUNDS)


def test_compare_detects_mismatch(tmp_path, capsys):
    import pytest

    a, b = tmp_path / "a.npz", tmp_path / "b.npz"
    x = np.ones((3, 3), np.float32)
    np.savez(a, out=x)
    np.savez(b, out=x + 0.01)
    with pytest.raises(SystemExit):
        parity_main(["compare", str(a), str(b), "--tol", "1e-3"])
    parity_main(["compare", str(a), str(b), "--tol", "0.1"])
