"""Trajectory capture/inject (pixel-level parity route, SURVEY §7 hard-part 4):
file-format round trips, torch-NCHW capture loading, and a CLI capture ->
re-inject run that must reproduce the output PNG bit-for-bit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.core.schedule import Schedule
from hedit_tpu.invert.ddpm import invert_ddpm
from hedit_tpu.io_utils.trajectory import load_trajectory, save_trajectory


def _tiny_inversion(S=6, skip_zs=False):
    sched = Schedule.create(S)
    rs = np.random.RandomState(0)
    w0 = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32) * 0.2)
    ctx = jnp.asarray(rs.randn(1, 77, 16).astype(np.float32) * 0.1)

    def eps_fn(x, t, c):
        return 0.1 * x + 0.01 * jnp.mean(c)

    return invert_ddpm(eps_fn, sched, w0, uncond_ctx=ctx, src_ctx=ctx,
                       cfg_scale_src=1.0, eta=1.0, rng=jax.random.PRNGKey(1),
                       step_chunk=3, skip_zs=skip_zs)


def test_trajectory_save_load_bitexact(tmp_path):
    inv = _tiny_inversion()
    path = str(tmp_path / "traj.npz")
    save_trajectory(path, inv)
    back = load_trajectory(path, expect_steps=6)
    assert np.array_equal(np.asarray(back.xts), np.asarray(inv.xts))
    assert np.array_equal(np.asarray(back.zs), np.asarray(inv.zs))
    assert np.array_equal(np.asarray(back.noise_added), np.asarray(inv.noise_added))
    assert np.array_equal(np.asarray(back.xT), np.asarray(inv.xT))


def test_trajectory_save_load_without_zs(tmp_path):
    inv = _tiny_inversion(skip_zs=True)
    assert inv.zs is None
    path = str(tmp_path / "traj.npz")
    save_trajectory(path, inv)
    back = load_trajectory(path)
    assert back.zs is None
    assert np.array_equal(np.asarray(back.xts), np.asarray(inv.xts))


def test_trajectory_torch_nchw_capture(tmp_path):
    """A reference-side capture stores NCHW (optionally with a singleton
    batch dim); the loader normalizes to NHWC."""
    inv = _tiny_inversion()
    xts = np.asarray(inv.xts)  # [S+1, 8, 8, 4]
    zs = np.asarray(inv.zs)
    path = str(tmp_path / "ref_capture.npz")
    np.savez(path,
             xts=xts.transpose(0, 3, 1, 2)[:, None],  # [S+1, 1, 4, 8, 8]
             zs=zs.transpose(0, 3, 1, 2))             # [S, 4, 8, 8]
    back = load_trajectory(path, expect_steps=6)
    assert np.array_equal(np.asarray(back.xts), xts)
    assert np.array_equal(np.asarray(back.zs), zs)


def test_trajectory_length_mismatch_raises(tmp_path):
    inv = _tiny_inversion()
    path = str(tmp_path / "traj.npz")
    save_trajectory(path, inv)
    with pytest.raises(ValueError, match="steps"):
        load_trajectory(path, expect_steps=50)


def test_cli_capture_reinject_bit_identical(tmp_path):
    """main_p2p --save_trajectory then --load_trajectory must write a
    bit-identical PNG (the whole edit is deterministic given the
    trajectory)."""
    from PIL import Image

    from hedit_tpu.cli.main_p2p import main as p2p_main

    rng = np.random.RandomState(0)
    img = tmp_path / "in.png"
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(img)
    traj = str(tmp_path / "traj.npz")

    def run(out_name, extra):
        out = tmp_path / out_name
        rc = p2p_main([
            "--mode", "h_edit_R_p2p", "--implicit",
            "--num_diffusion_steps", "6",
            "--image", str(img),
            "--source_prompt", "a cat", "--target_prompt", "a dog",
            "--output_path", str(out),
            "--tiny", "--platform", "cpu",
        ] + extra)
        assert rc == 0
        pngs = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(out) for f in fs if f.endswith(".png")
        )
        assert len(pngs) == 1
        return open(pngs[0], "rb").read()

    first = run("out1", ["--save_trajectory", traj])
    assert os.path.exists(traj)
    second = run("out2", ["--load_trajectory", traj])
    assert first == second


def test_cli_trajectory_guards():
    """Trajectory flags are single-image-only: dataset sweeps, data-parallel
    sweeps, and face --data_file runs must be rejected at parse time (a
    trajectory encodes ONE source image; replaying it across a sweep would
    silently edit every sample against the wrong trajectory)."""
    from hedit_tpu.cli.main_face import parse_args as face_args
    from hedit_tpu.cli.main_p2p import parse_args as p2p_args

    with pytest.raises(SystemExit):  # dataset mode (no --image)
        p2p_args(["--mode", "h_edit_R_p2p", "--save_trajectory", "t.npz"])
    with pytest.raises(SystemExit):  # data-parallel sweep
        p2p_args(["--mode", "h_edit_R_p2p", "--image", "x.jpg",
                  "--load_trajectory", "t.npz", "--data_parallel", "2"])
    with pytest.raises(SystemExit):  # face dataset mode
        face_args(["--data_file", "d.json", "--save_trajectory", "t.npz"])
    # single-image capture parses fine
    a = p2p_args(["--mode", "h_edit_R_p2p", "--image", "x.jpg",
                  "--save_trajectory", "t.npz"])
    assert a.save_trajectory == "t.npz"


def test_masactrl_start_layer_validation():
    """start_layer out of the backbone's self-attn layer range must raise at
    construction (reference SDXL map masactrl.py:12-15 carried as config)."""
    from hedit_tpu.control.masactrl import MODEL_TYPE_LAYERS, MasaCtrlControl

    step = jnp.zeros((), jnp.int32)
    with pytest.raises(ValueError, match="start_layer"):
        MasaCtrlControl(step=step, start_step=4, start_layer=16)  # SD: 16
    ctrl = MasaCtrlControl(step=step, start_step=4, start_layer=45,
                           total_layers=MODEL_TYPE_LAYERS["SDXL"])
    assert ctrl.total_layers == 70
