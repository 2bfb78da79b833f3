"""CLI smoke tests: every driver runs end-to-end in tiny mode over the
REFERENCE'S OWN demo assets (VERDICT r2 #4 — the round-2 demo driver failed
on the reference's demo.yaml because the ``data_path + item['image']`` join
was dropped; these tests pin all three data-contract joins:

* demo:  ``text-guided/main_demo.py:98,131`` — ``data_path + image``
  (demo.yaml stores ``/lizard.jpg`` with a leading slash, so os.path.join
  would misread it as absolute),
* face:  ``face-swapping/main_edit.py:42,148`` — ``os.path.join(image_path,
  source)`` over bare filenames,
* style: ``text-guided-n-style/main_edit.py:41,110,119`` —
  ``dataset + image_path`` / ``dataset + style``.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import os

import numpy as np
import pytest

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

TG_DEMO = os.path.join(REF, "text-guided/assets/demo")
FACE_DEMO = os.path.join(REF, "face-swapping/assets/demo")
STYLE_DEMO = os.path.join(REF, "text-guided-n-style/assets/demo")

TINY = ["--tiny", "--platform", "cpu"]


def _pngs(root):
    return sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(root) for f in fs if f.endswith(".png")
    )


@needs_reference
def test_p2p_cli_smoke(tmp_path):
    from hedit_tpu.cli.main_p2p import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--source_prompt", "a green lizard is sitting on a branch",
        "--target_prompt", "a brown lizard is sitting on a branch",
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) == 1


@needs_reference
def test_demo_cli_smoke_on_reference_yaml(tmp_path):
    """The exact round-2 failure scenario: the reference's own demo.yaml
    (image: /lizard.jpg) with --data_path, nothing absolute."""
    from hedit_tpu.cli.main_demo import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--data_path", TG_DEMO,
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_masactrl_cli_smoke(tmp_path):
    from hedit_tpu.cli.main_masactrl import main

    rc = main([
        "--mode", "h_edit_R_masactrl", "--num_diffusion_steps", "4",
        "--step", "1", "--layer", "0",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--target_prompt", "a brown lizard",
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_plugnplay_cli_smoke(tmp_path):
    from hedit_tpu.cli.main_plugnplay import main

    rc = main([
        "--mode", "h_edit_R_pnp", "--num_diffusion_steps", "4",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--source_prompt", "a green lizard",
        "--target_prompt", "a brown lizard",
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_face_cli_smoke_on_reference_json(tmp_path):
    """--data_file with the reference's demo.json (bare filenames): the
    --image_path/base-dir join must resolve 1368.jpg / 7522.jpg."""
    from hedit_tpu.cli.main_face import main

    rc = main([
        "--mode", "h_edit_R", "--num_diffusion_steps", "4",
        "--optimization_steps", "1",
        "--data_file", os.path.join(FACE_DEMO, "demo.json"),
        "--output_path", str(tmp_path),
        "--tiny", "--platform", "cpu",
    ])
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_style_cli_smoke_on_reference_json(tmp_path):
    """--data_file with the reference's demo.json: image_path AND style are
    dataset-relative ('000000000022.jpg', 'styles/colorful.jpg')."""
    from hedit_tpu.cli.main_style import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--num_diffusion_steps", "4",
        "--data_file", os.path.join(STYLE_DEMO, "demo.json"),
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


# The 7th driver (hedit-evaluate) is smoke-covered end-to-end by
# tests/test_eval.py::test_evaluation_cli_end_to_end (mapping iteration,
# RLE mask, right-square crop, all 9 metrics, CSV).


@needs_reference
def test_p2p_cli_data_parallel_flagship(tmp_path):
    """--data_parallel with the flagship mode: 3 samples at batch 2 must
    bucket, pad the tail batch, dedupe it, and write 3 PNGs through the
    library runner (parallel/sweep.py:make_flagship_runner)."""
    import shutil

    from hedit_tpu.cli.main_p2p import main

    imgs = tmp_path / "imgs"
    # PieBench layout: images live under <data_path>/annotation_images/
    (imgs / "annotation_images").mkdir(parents=True)
    for i in range(3):
        shutil.copy(os.path.join(TG_DEMO, "lizard.jpg"),
                    imgs / "annotation_images" / f"im{i}.jpg")
    mapping = tmp_path / "mapping.json"
    import json

    json.dump({
        f"k{i}": {
            "image_path": f"im{i}.jpg",
            "original_prompt": "a green lizard",
            "editing_prompt": "a brown lizard",
            "blended_word": "",
            "editing_type_id": "0",
        } for i in range(3)
    }, mapping.open("w"))
    out_root = tmp_path / "out"
    rc = main([
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--data_path", str(imgs), "--mapping_file", str(mapping),
        "--data_parallel", "2",
        "--output_path", str(out_root),
    ] + TINY)
    assert rc == 0 and len(_pngs(out_root)) == 3


def test_resume_skips_existing_outputs(tmp_path):
    """--resume (SURVEY.md §5.3): a sample whose output PNG already exists is
    skipped; without the flag it is recomputed/overwritten (reference
    behavior)."""
    from PIL import Image

    from hedit_tpu.cli.main_p2p import main

    rs = np.random.RandomState(0)
    img = tmp_path / "in.png"
    Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(img)
    out_root = tmp_path / "out"
    argv = [
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--image", str(img),
        "--source_prompt", "a cat", "--target_prompt", "a dog",
        "--output_path", str(out_root),
    ] + TINY
    assert main(argv) == 0
    pngs = _pngs(out_root)
    assert len(pngs) == 1
    mtime = os.path.getmtime(pngs[0])

    assert main(argv + ["--resume"]) == 0
    assert os.path.getmtime(pngs[0]) == mtime  # untouched: skipped

    assert main(argv) == 0  # default recomputes
    assert os.path.getmtime(pngs[0]) > mtime


@needs_reference
def test_face_cli_data_parallel(tmp_path):
    """--data_parallel on the face driver: 2 pairs at batch 2 through the
    sharded face_batch_fn path (with the full tiny reward stack) must save
    both result grids."""
    from hedit_tpu.cli.main_face import main

    rc = main([
        "--mode", "h_edit_R", "--num_diffusion_steps", "4",
        "--optimization_steps", "1", "--data_parallel", "2",
        "--data_file", os.path.join(FACE_DEMO, "demo.json"),
        "--output_path", str(tmp_path),
        "--tiny", "--platform", "cpu",
    ])
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_masactrl_cli_data_parallel(tmp_path):
    """--data_parallel on the MasaCtrl driver through the generic
    ctrl_batch_fn path (pad-to-batch with a single sample)."""
    from hedit_tpu.cli.main_masactrl import main

    rc = main([
        "--mode", "h_edit_R_masactrl", "--num_diffusion_steps", "4",
        "--step", "1", "--layer", "0", "--data_parallel", "2",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--target_prompt", "a brown lizard",
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_plugnplay_cli_data_parallel(tmp_path):
    """--data_parallel on the PnP driver, DDIM + derive_zs fast path
    (pnp_inv_w_pnp at eta 0)."""
    from hedit_tpu.cli.main_plugnplay import main

    rc = main([
        "--mode", "pnp_inv_w_pnp", "--eta", "0",
        "--num_diffusion_steps", "4", "--data_parallel", "2",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--source_prompt", "a green lizard",
        "--target_prompt", "a brown lizard",
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_style_cli_data_parallel(tmp_path):
    """--data_parallel on the style driver: both reference demo samples
    through the sharded style_batch_fn path (per-sample Gram matrices +
    stacked P2P controls)."""
    from hedit_tpu.cli.main_style import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--num_diffusion_steps", "4",
        "--data_parallel", "2",
        "--data_file", os.path.join(STYLE_DEMO, "demo.json"),
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 2


@needs_reference
def test_demo_cli_data_parallel(tmp_path):
    """--data_parallel on the demo driver: YAML samples routed through
    main_p2p's sharded sweep with the demo_{i} naming override."""
    from hedit_tpu.cli.main_demo import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--data_parallel", "2",
        "--data_path", TG_DEMO,
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_demo_cli_image_fallback_joins_yaml_dir(tmp_path):
    """Ad-hoc demo use: --image <dir>/lizard.jpg with NO --data_path/--mapping
    must find demo.yaml next to the image AND join its (slash-prefixed) image
    entries against that directory, not the default --data_path."""
    from hedit_tpu.cli.main_demo import main

    rc = main([
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--image", os.path.join(TG_DEMO, "lizard.jpg"),
        "--output_path", str(tmp_path),
    ] + TINY)
    assert rc == 0 and len(_pngs(tmp_path)) >= 1


@needs_reference
def test_p2p_dp_ddim_mode_avoids_flagship_runner(tmp_path):
    """h_edit_D_p2p (DDIM inversion) under --data_parallel must route to the
    general batched editor (edit_batch_p2p_fn runs invert_ddim), NEVER the
    flagship runner, whose trajectory is random DDPM q-sampling.  Regression:
    the eta->1.0 rewrite for the DDPM coefficient tables once made the
    flagship predicate's eta>0 term vacuously true for DDIM."""
    import json
    import shutil

    import hedit_tpu.parallel.sweep as sweep
    from hedit_tpu.cli.main_p2p import main

    imgs = tmp_path / "imgs"
    (imgs / "annotation_images").mkdir(parents=True)
    for i in range(2):
        shutil.copy(os.path.join(TG_DEMO, "lizard.jpg"),
                    imgs / "annotation_images" / f"im{i}.jpg")
    mapping = tmp_path / "mapping.json"
    json.dump({
        f"k{i}": {
            "image_path": f"im{i}.jpg",
            "original_prompt": "a green lizard",
            "editing_prompt": "a brown lizard",
            "blended_word": "",
            "editing_type_id": "0",
        } for i in range(2)
    }, mapping.open("w"))

    real = sweep.make_flagship_runner

    def _trap(*a, **k):
        raise AssertionError("flagship runner must not serve DDIM modes")

    sweep.make_flagship_runner = _trap
    try:
        rc = main([
            "--mode", "h_edit_D_p2p", "--implicit", "--eta", "0",
            "--num_diffusion_steps", "4",
            "--data_path", str(imgs), "--mapping_file", str(mapping),
            "--data_parallel", "2",
            "--output_path", str(tmp_path / "out"),
        ] + TINY)
    finally:
        sweep.make_flagship_runner = real
    assert rc == 0 and len(_pngs(tmp_path / "out")) == 2


@needs_reference
def test_p2p_dp_resume_rebatch_reproduces_outputs(tmp_path):
    """Per-sample outputs must be invariant to batch composition: after a
    partial sweep, --resume re-batches the remaining samples at new batch
    indices, and the recomputed files must be byte-identical to an
    uninterrupted run's.  Regression: per-row keys were once derived from
    batch position (split(key, B)[row]) instead of the serial path's
    fixed per-sample key."""
    import json
    import shutil

    from hedit_tpu.cli.main_p2p import main

    imgs = tmp_path / "imgs"
    (imgs / "annotation_images").mkdir(parents=True)
    for i in range(3):
        shutil.copy(os.path.join(TG_DEMO, "lizard.jpg"),
                    imgs / "annotation_images" / f"im{i}.jpg")
    mapping = tmp_path / "mapping.json"
    json.dump({
        f"k{i}": {
            "image_path": f"im{i}.jpg",
            # distinct prompts so rows are NOT interchangeable
            "original_prompt": f"a green lizard number {i}",
            "editing_prompt": f"a brown lizard number {i}",
            "blended_word": "",
            "editing_type_id": "0",
        } for i in range(3)
    }, mapping.open("w"))
    out_root = tmp_path / "out"
    argv = [
        "--mode", "h_edit_R_p2p", "--implicit", "--num_diffusion_steps", "4",
        "--data_path", str(imgs), "--mapping_file", str(mapping),
        "--data_parallel", "2",
        "--output_path", str(out_root),
    ] + TINY
    assert main(argv) == 0
    pngs = _pngs(out_root)
    assert len(pngs) == 3
    golden = {p: open(p, "rb").read() for p in pngs}

    # drop im1 and im2: the uninterrupted run batched [im0, im1] + [im2, pad];
    # the resume run batches [im1, im2] — every survivor at a new batch index
    os.remove(pngs[1])
    os.remove(pngs[2])
    assert main(argv + ["--resume"]) == 0
    for p in pngs:
        assert open(p, "rb").read() == golden[p], p


@needs_reference
def test_p2p_cli_data_parallel_ef_and_nmg(tmp_path):
    """The last two --data_parallel mode holes (VERDICT r3 #5): 'ef' rides
    the controller-less batched editor (edit_batch_fn mode='ef'); 'nmg_p2p'
    takes edit_batch_p2p_fn with the through-UNet L1 gradient inside the
    vmapped per-sample body."""
    import json
    import shutil

    from hedit_tpu.cli.main_p2p import main

    imgs = tmp_path / "imgs"
    (imgs / "annotation_images").mkdir(parents=True)
    for i in range(2):
        shutil.copy(os.path.join(TG_DEMO, "lizard.jpg"),
                    imgs / "annotation_images" / f"im{i}.jpg")
    mapping = tmp_path / "mapping.json"
    json.dump({
        f"k{i}": {
            "image_path": f"im{i}.jpg",
            "original_prompt": "a green lizard",
            "editing_prompt": "a brown lizard",
            "blended_word": "word lizard",
            "editing_type_id": "0",
        } for i in range(2)
    }, mapping.open("w"))
    common = [
        "--num_diffusion_steps", "4",
        "--data_path", str(imgs), "--mapping_file", str(mapping),
        "--data_parallel", "2",
    ] + TINY

    rc = main(["--mode", "ef",
               "--output_path", str(tmp_path / "out_ef")] + common)
    assert rc == 0 and len(_pngs(tmp_path / "out_ef")) == 2

    rc = main(["--mode", "nmg_p2p", "--eta", "0",
               "--output_path", str(tmp_path / "out_nmg")] + common)
    assert rc == 0 and len(_pngs(tmp_path / "out_nmg")) == 2
