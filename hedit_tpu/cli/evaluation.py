"""PieBench evaluation CLI — parity with
``text-guided/evaluation/evaluation.py:109-215``.

Iterates the mapping file, decodes the run-length edit masks (borders forced
to 1), crops non-square result images to the right 512x512 ("to evaluate
editing", :203-207), computes the nine default metrics, and appends one CSV
row per sample per method.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np
from PIL import Image

ALL_METRICS = [
    "structure_distance",
    "psnr_unedit_part",
    "lpips_unedit_part",
    "mse_unedit_part",
    "ssim_unedit_part",
    "clip_similarity_source_image",
    "clip_similarity_target_image",
    "clip_similarity_target_image_edit_part",
    "local_clip",
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu PieBench evaluation")
    p.add_argument("--annotation_mapping_file", type=str, required=True)
    p.add_argument("--metrics", nargs="+", type=str, default=ALL_METRICS)
    p.add_argument("--src_image_folder", type=str, required=True)
    p.add_argument("--tgt_methods", nargs="+", type=str, required=True,
                   help="result folders to evaluate")
    p.add_argument("--result_path", type=str, default="evaluation_result.csv")
    p.add_argument("--edit_category_list", nargs="+", type=str,
                   default=["0", "1", "2", "3", "4", "5", "6", "7", "8", "9"])
    p.add_argument("--clip_weights", type=str, default=os.environ.get("HEDIT_CLIP_L14"))
    p.add_argument("--dino_weights", type=str, default=os.environ.get("HEDIT_DINO_B8"))
    p.add_argument("--lpips_weights", type=str, default=os.environ.get("HEDIT_LPIPS_CKPT"))
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--batch", type=int, default=0, metavar="N",
                   help="batch N (sample x method) units per device pass: "
                        "one DINO/CLIP-vision/LPIPS forward per stack and "
                        "chunked batched text sweeps, instead of the "
                        "reference's per-sample calls "
                        "(evaluation.py:109-215); 0 = serial")
    return p.parse_args(argv)


def build_calculators(args):
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from hedit_tpu.eval_harness.clip_embed import create_clip_embedder
    from hedit_tpu.eval_harness.local_clip import (
        DirectionalCLIPMetric, clip_image_preprocess,
    )
    from hedit_tpu.eval_harness.metrics import CLIPScoreMetric, LPIPSMetric
    from hedit_tpu.models.lpips_vgg import LPIPSVgg, convert_lpips_vgg
    from hedit_tpu.models.vit_dino import (
        DINOViT, ViTConfig, convert_dino_vit, structure_distance,
    )

    clip_emb = create_clip_embedder(args.clip_weights, tiny=args.tiny)
    clip_res = clip_emb.vision_model.cfg.input_resolution

    def image_embed_raw(img_raw):  # [B,H,W,3] 0..255
        return clip_emb.embed_image(
            clip_image_preprocess(jnp.asarray(img_raw), size=clip_res)
        )

    clip_score = CLIPScoreMetric(image_embed_raw, clip_emb.embed_text)
    local_clip = DirectionalCLIPMetric(
        lambda x: clip_emb.embed_image(x), clip_emb.embed_text, size=clip_res
    )

    vcfg = ViTConfig.tiny() if args.tiny else ViTConfig.dino_vitb8()
    dino = DINOViT(vcfg)
    dummy = jnp.zeros((1, 224, 224, 3))
    if args.dino_weights:
        from hedit_tpu.io_utils.weights import load_torch_state, validate_against

        dp = convert_dino_vit(load_torch_state(args.dino_weights))
        validate_against(jax.eval_shape(dino.init, jax.random.PRNGKey(0), dummy),
                         dp, "dino_vitb8")
        dino_params = jax.tree_util.tree_map(jnp.asarray, dp)
    else:
        dino_params = dino.init(jax.random.PRNGKey(0), dummy)
    # params as jit ARGUMENTS (axon remote-compile rejects baked weights)
    _dino_j = jax.jit(lambda p, x: dino.apply(p, x))
    dino_apply = lambda x: _dino_j(dino_params, x)  # noqa: E731

    lp = LPIPSVgg()
    di = jnp.zeros((1, 64, 64, 3))
    if args.lpips_weights:
        from hedit_tpu.io_utils.weights import load_torch_state

        lp_params = jax.tree_util.tree_map(
            jnp.asarray, convert_lpips_vgg(load_torch_state(args.lpips_weights))
        )
    else:
        lp_params = lp.init(jax.random.PRNGKey(0), di, di)
    _lpips_j = jax.jit(lambda p, a, b: lp.apply(p, a, b))
    lpips_metric = LPIPSMetric(lambda a, b: _lpips_j(lp_params, a, b))

    return clip_score, local_clip, dino_apply, lpips_metric


def calculate_metric(metric, calcs, src, tgt, mask, src_prompt, tgt_prompt):
    import jax.numpy as jnp

    from hedit_tpu.eval_harness import metrics as M
    from hedit_tpu.models.vit_dino import structure_distance

    clip_score, local_clip, dino_apply, lpips_metric = calcs
    inv_mask = 1 - mask
    if metric == "structure_distance":
        return float(structure_distance(
            dino_apply, jnp.asarray(np.asarray(src, np.float32))[None],
            jnp.asarray(np.asarray(tgt, np.float32))[None]))
    if metric == "psnr_unedit_part":
        return M.calculate_psnr(tgt, src, inv_mask, inv_mask)
    if metric == "lpips_unedit_part":
        return lpips_metric(tgt, src, inv_mask, inv_mask)
    if metric == "mse_unedit_part":
        return M.calculate_mse(tgt, src, inv_mask, inv_mask)
    if metric == "ssim_unedit_part":
        return M.calculate_ssim(tgt, src, inv_mask, inv_mask)
    if metric == "clip_similarity_source_image":
        return clip_score(src, src_prompt)
    if metric == "clip_similarity_target_image":
        return clip_score(tgt, tgt_prompt)
    if metric == "clip_similarity_target_image_edit_part":
        return clip_score(tgt, tgt_prompt, mask)
    if metric == "local_clip":
        import jax.numpy as jnp

        s = jnp.asarray(np.asarray(src, np.float32))
        t = jnp.asarray(np.asarray(tgt, np.float32))
        return local_clip(s, src_prompt, t, tgt_prompt)
    raise ValueError(metric)


def _load_unit(args, item, method):
    """(src512, tgt512) PIL pair for one (sample, method), or None when the
    method has no output for this sample.  Crop/resize parity with the
    serial loop (right-square crop, :203-207)."""
    base = os.path.join(method, item["image_path"])
    tgt_path = base if os.path.exists(base) else (
        base.rsplit(".", 1)[0] + ".png")
    if not os.path.exists(tgt_path):
        return None
    src = Image.open(
        os.path.join(args.src_image_folder, item["image_path"])
    ).convert("RGB")
    tgt = Image.open(tgt_path).convert("RGB")
    if tgt.size[0] != tgt.size[1]:
        tgt = tgt.crop((tgt.size[0] - tgt.size[1], 0,
                        tgt.size[0], tgt.size[1]))
    if tgt.size != (512, 512):
        tgt = tgt.resize((512, 512))
    if src.size != (512, 512):
        src = src.resize((512, 512))
    return src, tgt


def run_batched(args, calcs, data):
    """Throughput lane (VERDICT r3 #6): metric math identical to the serial
    loop, device calls batched — per flush of N units, ONE forward each
    through DINO (x2 stacks), CLIP vision (per variant), LPIPS, and chunked
    batched text sweeps.  The tail flush is padded to N so every tower
    compiles exactly once."""
    import jax.numpy as jnp

    from hedit_tpu.eval_harness import metrics as M
    from hedit_tpu.io_utils.images import mask_decode
    from hedit_tpu.models.vit_dino import structure_distance_batch

    clip_score, local_clip, dino_apply, lpips_metric = calcs
    results = {}
    units = []  # (key, method, src_np, tgt_np, mask, src_prompt, tgt_prompt)

    def flush():
        if not units:
            return
        n_real = len(units)
        while len(units) < args.batch:  # pad tail: constant compile shapes
            units.append(units[-1])
        keys = [(u[0], u[1]) for u in units]
        srcs = [u[2] for u in units]
        tgts = [u[3] for u in units]
        masks = [u[4] for u in units]
        inv_masks = [1 - m for m in masks]
        sps = [u[5] for u in units]
        tps = [u[6] for u in units]
        vals = {}
        want = set(args.metrics)
        if "structure_distance" in want:
            vals["structure_distance"] = np.asarray(structure_distance_batch(
                dino_apply,
                jnp.asarray(np.stack(srcs).astype(np.float32)),
                jnp.asarray(np.stack(tgts).astype(np.float32))))
        if "lpips_unedit_part" in want:
            vals["lpips_unedit_part"] = lpips_metric.batch(
                tgts, srcs, inv_masks, inv_masks)
        if "clip_similarity_source_image" in want:
            vals["clip_similarity_source_image"] = clip_score.batch(srcs, sps)
        if "clip_similarity_target_image" in want:
            vals["clip_similarity_target_image"] = clip_score.batch(tgts, tps)
        if "clip_similarity_target_image_edit_part" in want:
            vals["clip_similarity_target_image_edit_part"] = clip_score.batch(
                tgts, tps, masks)
        if "local_clip" in want:
            vals["local_clip"] = local_clip.batch(srcs, sps, tgts, tps)
        if "ssim_unedit_part" in want:
            vals["ssim_unedit_part"] = M.calculate_ssim_batch(
                tgts, srcs, inv_masks, inv_masks)
        for i in range(n_real):
            key, method = keys[i]
            for metric in args.metrics:
                if metric in vals:
                    v = float(vals[metric][i])
                elif metric == "psnr_unedit_part":
                    v = M.calculate_psnr(tgts[i], srcs[i], inv_masks[i],
                                         inv_masks[i])
                elif metric == "mse_unedit_part":
                    v = M.calculate_mse(tgts[i], srcs[i], inv_masks[i],
                                        inv_masks[i])
                elif metric == "ssim_unedit_part":
                    v = M.calculate_ssim(tgts[i], srcs[i], inv_masks[i],
                                         inv_masks[i])
                else:
                    raise ValueError(metric)
                results[(key, method, metric)] = v
            print(f"evaluated {key} [{method}]")
        units.clear()

    rows = []
    for key, item in data.items():
        if item.get("editing_type_id", "0") not in args.edit_category_list:
            continue
        rows.append(key)
        src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
        tgt_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
        mask = mask_decode(item["mask"])[:, :, None].repeat(3, axis=2)
        for method in args.tgt_methods:
            pair = _load_unit(args, item, method)
            if pair is None:
                for metric in args.metrics:
                    results[(key, method, metric)] = ""
                continue
            src, tgt = pair
            units.append((key, method, np.asarray(src), np.asarray(tgt),
                          mask, src_prompt, tgt_prompt))
            if len(units) == args.batch:
                flush()
    flush()

    with open(args.result_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["key"] + [f"{m}|{t}" for t in args.tgt_methods
                                   for m in args.metrics])
        for key in rows:
            writer.writerow([key] + [
                results[(key, method, metric)]
                for method in args.tgt_methods for metric in args.metrics])
    print(f"wrote {args.result_path}")
    return 0


def main(argv=None):
    from hedit_tpu.io_utils.images import dataset_from_json, mask_decode

    args = parse_args(argv)
    calcs = build_calculators(args)
    data = dataset_from_json(args.annotation_mapping_file)
    if args.batch > 0:
        return run_batched(args, calcs, data)

    with open(args.result_path, "w", newline="") as f:
        writer = csv.writer(f)
        header = ["key"] + [f"{m}|{t}" for t in args.tgt_methods for m in args.metrics]
        writer.writerow(header)
        for key, item in data.items():
            if item.get("editing_type_id", "0") not in args.edit_category_list:
                continue
            src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
            tgt_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
            mask = mask_decode(item["mask"])[:, :, None].repeat(3, axis=2)
            src = Image.open(
                os.path.join(args.src_image_folder, item["image_path"])
            ).convert("RGB")
            row = [key]
            for method in args.tgt_methods:
                base = os.path.join(method, item["image_path"])
                tgt_path = base if os.path.exists(base) else (
                    base.rsplit(".", 1)[0] + ".png"
                )
                if not os.path.exists(tgt_path):
                    row.extend([""] * len(args.metrics))
                    continue
                tgt = Image.open(tgt_path).convert("RGB")
                if tgt.size[0] != tgt.size[1]:
                    # crop the RIGHT square ("to evaluate editing", :203-207)
                    tgt = tgt.crop((tgt.size[0] - tgt.size[1], 0,
                                    tgt.size[0], tgt.size[1]))
                if tgt.size != (512, 512):
                    tgt = tgt.resize((512, 512))
                if src.size != (512, 512):
                    src = src.resize((512, 512))
                for metric in args.metrics:
                    row.append(calculate_metric(
                        metric, calcs, src, tgt, mask, src_prompt, tgt_prompt))
            writer.writerow(row)
            print(f"evaluated {key}")
    print(f"wrote {args.result_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
