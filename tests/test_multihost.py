"""Multi-host (DCN) data-parallel execution (parallel/dist.py; VERDICT r3 #2).

The reference is single-process/single-GPU (SURVEY.md §2), so the pod story
is this framework's own: ``jax.distributed.initialize`` wiring, a global
mesh whose 'data' axis spans processes, per-process sample loading and
process-local output writes.  Validated here with a REAL two-process run:
two subprocesses (2 fake CPU devices each, gloo collectives) execute the
actual ``hedit-p2p --data_parallel`` CLI against a shared dataset/output
directory; their outputs must be disjoint by row ownership and pixel-match
a serial single-process sweep.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hedit_tpu.parallel import dist  # noqa: E402
from hedit_tpu.parallel.mesh import make_mesh  # noqa: E402


# ----------------------------- single-process helper semantics ------------ #

def test_owned_slice_single_process():
    mesh = make_mesh(4)
    assert dist.owned_slice(mesh, 8) == slice(0, 8)


def test_put_batch_and_owned_rows_single_process():
    mesh = make_mesh(4)
    x = np.arange(8, dtype=np.float32).reshape(8, 1)
    with jax.set_mesh(mesh):
        g = dist.put_batch(x, mesh, 8)
        assert g.shape == (8, 1) and "data" in str(g.sharding.spec)
        rows = dist.owned_rows(g)
    assert [gi for gi, _ in rows] == list(range(8))
    assert all(float(r[0]) == gi for gi, r in rows)


def test_put_replicated_single_process():
    mesh = make_mesh(4)
    tree = {"w": np.ones((3, 2), np.float32)}
    out = dist.put_replicated(tree, mesh)
    assert out["w"].sharding.is_fully_replicated


def test_init_distributed_requires_full_config():
    with pytest.raises(ValueError):
        dist.init_distributed("localhost:1", num_processes=0, process_id=-1)


# --------------------------------- real two-process CLI run --------------- #

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_dataset(root, n=4):
    from PIL import Image

    (root / "annotation_images").mkdir(parents=True)
    rs = np.random.RandomState(7)
    mapping = {}
    for i in range(n):
        Image.fromarray(
            rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(root / "annotation_images" / f"im{i}.png")
        mapping[f"k{i}"] = {
            "image_path": f"im{i}.png",
            "original_prompt": f"a photo number {i}",
            "editing_prompt": f"a painting number {i}",
            "blended_word": "",
            "editing_type_id": "0",
        }
    mp = root / "mapping.json"
    json.dump(mapping, mp.open("w"))
    return mp


ARGS = [
    "--mode", "h_edit_R", "--num_diffusion_steps", "4",
    "--tiny", "--platform", "cpu",
]


def test_two_process_dp_matches_serial_with_disjoint_writes(tmp_path):
    from PIL import Image

    from hedit_tpu.cli.main_p2p import main

    mapping = _make_dataset(tmp_path / "data")

    # serial single-process reference (in-process)
    out_serial = tmp_path / "serial"
    rc = main(ARGS + [
        "--data_path", str(tmp_path / "data"), "--mapping_file", str(mapping),
        "--output_path", str(out_serial),
    ])
    assert rc == 0

    # two-process DP run over a SHARED output dir
    out_dp = tmp_path / "dp"
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()}
    env_base.pop("XLA_FLAGS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["JAX_PLATFORMS"] = "cpu"
    # share the suite's validated compile cache for warm re-runs
    cache = jax.config.jax_compilation_cache_dir
    if cache:
        env_base["JAX_COMPILATION_CACHE_DIR"] = cache
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "hedit_tpu.cli.main_p2p"] + ARGS + [
                "--data_path", str(tmp_path / "data"),
                "--mapping_file", str(mapping),
                "--output_path", str(out_dp),
                "--data_parallel", "4",
                "--dist_coordinator", f"localhost:{port}",
                "--dist_num_processes", "2",
                "--dist_process_id", str(pid),
            ],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            so, se = p.communicate()
            pytest.fail(f"worker timed out; stderr tail: {se[-2000:]}")
        assert p.returncode == 0, f"worker failed: {se[-3000:]}"
        outs.append(so)

    # disjoint process-local writes covering the whole dataset: with 4
    # global rows over 4 devices across 2 processes, each process owns 2
    saved = [sorted(line.split("saved ", 1)[1]
                    for line in so.splitlines() if "saved " in line)
             for so in outs]
    assert len(saved[0]) == 2 and len(saved[1]) == 2, saved
    assert not set(saved[0]) & set(saved[1]), saved

    serial_pngs = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out_serial)
        for f in fs if f.endswith(".png"))
    dp_pngs = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out_dp)
        for f in fs if f.endswith(".png"))
    assert len(serial_pngs) == 4 and len(dp_pngs) == 4

    # pixel parity vs the serial sweep: same per-sample PRNG key, same
    # numerics modulo batched-matmul accumulation order (latent drift
    # O(1e-4), quantization +/-1 after decode)
    for sp, dp in zip(serial_pngs, dp_pngs):
        assert os.path.basename(sp) == os.path.basename(dp)
        a = np.asarray(Image.open(sp), dtype=np.int16)
        b = np.asarray(Image.open(dp), dtype=np.int16)
        d = np.abs(a - b)
        assert d.max() <= 4 and d.mean() < 0.5, (
            os.path.basename(sp), d.max(), float(d.mean()))
