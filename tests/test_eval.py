"""Evaluation-harness tests: metric oracles and plumbing."""

import numpy as np
import jax.numpy as jnp
import pytest

from hedit_tpu.eval_harness import metrics as M
from hedit_tpu.io_utils.images import mask_decode


def test_psnr_mse_basics():
    rng = np.random.RandomState(0)
    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    assert M.calculate_psnr(a, a) == float("inf")
    assert M.calculate_mse(a, a) == 0.0
    b = np.clip(a.astype(int) + 10, 0, 255).astype(np.uint8)
    p = M.calculate_psnr(a, b)
    assert 20 < p < 40
    # masked: zero mask makes everything equal
    zero_mask = np.zeros((32, 32, 3), np.float32)
    assert M.calculate_mse(a, b, zero_mask, zero_mask) == 0.0


def test_ssim_oracle():
    rng = np.random.RandomState(1)
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    assert abs(M.calculate_ssim(a, a) - 1.0) < 1e-5
    noise = np.clip(a + rng.randn(64, 64, 3) * 40, 0, 255).astype(np.uint8)
    s = M.calculate_ssim(a, noise)
    assert 0.0 < s < 0.95


def test_ssim_matches_torchmetrics():
    torchmetrics = pytest.importorskip("torchmetrics")
    import torch

    rng = np.random.RandomState(2)
    a = rng.rand(48, 48, 3).astype(np.float32)
    b = np.clip(a + rng.randn(48, 48, 3).astype(np.float32) * 0.1, 0, 1)
    tm = torchmetrics.image.StructuralSimilarityIndexMeasure(data_range=1.0)
    want = float(tm(torch.tensor(b).permute(2, 0, 1)[None],
                    torch.tensor(a).permute(2, 0, 1)[None]))
    got = M.calculate_ssim((b * 255).astype(np.uint8), (a * 255).astype(np.uint8))
    assert abs(got - want) < 0.02  # uint8 quantization + border handling


def test_mask_decode_borders_and_rle():
    mask = mask_decode([10, 5], image_size=8)
    assert mask.shape == (8, 8)
    assert mask[0].all() and mask[-1].all()
    assert mask[:, 0].all() and mask[:, -1].all()
    flat = mask.reshape(-1)
    assert flat[10] == 1 and flat[14] == 1


def test_dino_structure_distance_zero_same_image():
    import jax

    from hedit_tpu.models.vit_dino import DINOViT, ViTConfig, structure_distance

    cfg = ViTConfig.tiny()
    model = DINOViT(cfg)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img)
    apply = lambda x: model.apply(params, x)  # noqa: E731
    d_same = float(structure_distance(apply, img, img))
    assert d_same < 1e-8
    img2 = jnp.asarray(np.random.RandomState(1).rand(1, 224, 224, 3).astype(np.float32))
    assert float(structure_distance(apply, img, img2)) > d_same


def test_directional_clip_metric_sign():
    # synthetic embedders: image embed = mean color; text embed maps 'white'
    # and 'black' templates to +/- directions
    from hedit_tpu.eval_harness.local_clip import DirectionalCLIPMetric

    def image_embed(x):  # [B,224,224,3] normalized-ish
        return jnp.mean(x, axis=(1, 2))

    def text_embed(texts):
        out = []
        for t in texts:
            v = np.ones(3, np.float32) if "white" in t else -np.ones(3, np.float32)
            out.append(v)
        return jnp.asarray(out)

    metric = DirectionalCLIPMetric(image_embed, text_embed)
    dark = np.zeros((224, 224, 3), np.float32)
    light = np.ones((224, 224, 3), np.float32) * 255
    # editing dark -> light should align with 'black' -> 'white'
    assert metric(dark, "black", light, "white") > 0.9
    assert metric(light, "white", dark, "black") > 0.9
    assert metric(dark, "white", light, "black") < -0.9


def test_evaluation_cli_end_to_end(tmp_path):
    """Drive the full evaluation driver (mapping iteration, RLE mask, crop
    rules, 9 metrics, CSV) on a synthetic fixture with tiny towers."""
    import csv as csvmod
    import json

    from PIL import Image

    from hedit_tpu.cli.evaluation import main as eval_main

    rng = np.random.RandomState(0)
    src_dir = tmp_path / "src"
    method = tmp_path / "methodA"
    src_dir.mkdir()
    method.mkdir()
    Image.fromarray(rng.randint(0, 255, (512, 512, 3), dtype=np.uint8)).save(
        src_dir / "img1.jpg")
    # non-square target exercises the right-square crop rule
    Image.fromarray(rng.randint(0, 255, (512, 1024, 3), dtype=np.uint8)).save(
        method / "img1.png")
    mapping = {"img1": {
        "image_path": "img1.jpg",
        "original_prompt": "a [cat] sitting",
        "editing_prompt": "a [dog] sitting",
        "editing_type_id": "0",
        "mask": [1000, 5000],
    }}
    mf = tmp_path / "mapping_file.json"
    mf.write_text(json.dumps(mapping))
    out_csv = tmp_path / "out.csv"
    rc = eval_main([
        "--annotation_mapping_file", str(mf),
        "--src_image_folder", str(src_dir),
        "--tgt_methods", str(method),
        "--result_path", str(out_csv),
        "--tiny", "--platform", "cpu",
    ])
    assert rc == 0
    rows = list(csvmod.reader(out_csv.open()))
    assert len(rows) == 2 and rows[1][0] == "img1"
    vals = [float(v) for v in rows[1][1:]]
    assert len(vals) == 9 and all(np.isfinite(vals))


def test_evaluation_cli_batched_matches_serial(tmp_path):
    """--batch N (VERDICT r3 #6): the throughput lane — one DINO/CLIP/LPIPS
    forward per unit stack + chunked batched text sweeps — must reproduce
    the serial per-sample CSV (same math, batched device calls), including
    a missing-output method column and a padded tail flush."""
    import csv as csvmod
    import json

    from PIL import Image

    from hedit_tpu.cli.evaluation import main as eval_main

    rng = np.random.RandomState(1)
    src_dir = tmp_path / "src"
    m_a = tmp_path / "methodA"
    m_b = tmp_path / "methodB"  # partial outputs: img2 missing
    for d in (src_dir, m_a, m_b):
        d.mkdir()
    mapping = {}
    for i in range(3):
        name = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (512, 512, 3), np.uint8)).save(
            src_dir / name)
        Image.fromarray(rng.randint(0, 255, (512, 768, 3), np.uint8)).save(
            m_a / f"img{i}.png")
        if i != 2:
            Image.fromarray(rng.randint(0, 255, (512, 512, 3), np.uint8)
                            ).save(m_b / f"img{i}.png")
        mapping[f"img{i}"] = {
            "image_path": name,
            "original_prompt": f"a [cat] number {i}",
            "editing_prompt": f"a [dog] number {i}",
            "editing_type_id": "0",
            "mask": [800 * i, 2000, 1000, 3000],
        }
    mf = tmp_path / "mapping_file.json"
    mf.write_text(json.dumps(mapping))

    argv = [
        "--annotation_mapping_file", str(mf),
        "--src_image_folder", str(src_dir),
        "--tgt_methods", str(m_a), str(m_b),
        "--tiny", "--platform", "cpu",
    ]
    serial_csv = tmp_path / "serial.csv"
    batched_csv = tmp_path / "batched.csv"
    assert eval_main(argv + ["--result_path", str(serial_csv)]) == 0
    # batch=4 over 5 existing (sample, method) units: one full flush + a
    # padded tail flush
    assert eval_main(argv + ["--result_path", str(batched_csv),
                             "--batch", "4"]) == 0

    rs = list(csvmod.reader(serial_csv.open()))
    rb = list(csvmod.reader(batched_csv.open()))
    assert rs[0] == rb[0] and len(rs) == len(rb) == 4
    for row_s, row_b in zip(rs[1:], rb[1:]):
        assert row_s[0] == row_b[0]
        for v_s, v_b in zip(row_s[1:], row_b[1:]):
            if v_s == "":
                assert v_b == ""
                continue
            a, b = float(v_s), float(v_b)
            # batched matmul accumulation order only
            assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), (row_s[0], a, b)
