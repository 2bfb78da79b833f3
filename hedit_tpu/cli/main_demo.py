"""Demo driver — CLI parity with ``text-guided/main_demo.py``.

Same pipeline as main_p2p but over a demo YAML
({image, source_prompt, target_prompt, blended_word, editing_instruction},
``text-guided/assets/demo/demo.yaml``), with the heuristic blend-word /
equalizer preprocessing and merging (:204-221): difflib word-diff proposes
blend words + eq params (value 1.5), which are merged with any dataset-given
blended_word.
"""

from __future__ import annotations

import os
import sys

from hedit_tpu.cli.main_p2p import parse_args, run_sample, result_dir_name
from hedit_tpu.cli.common import build_pipeline


def main(argv=None):
    from hedit_tpu.control.p2p_prep import preprocess_blend_and_eq
    from hedit_tpu.io_utils.images import dataset_from_yaml

    args = parse_args(argv)
    is_ddim = args.eta == 0
    pipe = build_pipeline(args, args.num_diffusion_steps,
                          steps_offset=0 if is_ddim else 1)

    # YAML location: --mapping_file wins; otherwise <data_path>/demo.yaml
    # (reference: ``main_demo.py:98`` ``dataset_from_yaml(data_path +
    # "/demo.yaml")``), with a dirname(--image) fallback for ad-hoc use.
    yaml_path = args.mapping_file or os.path.join(args.data_path, "demo.yaml")
    join_base = args.data_path
    if not os.path.exists(yaml_path) and args.image:
        # ad-hoc fallback: the YAML sits next to --image, so its image
        # entries must be joined against THAT directory, not --data_path
        yaml_path = os.path.join(os.path.dirname(args.image), "demo.yaml")
        join_base = os.path.dirname(args.image)
    items = dataset_from_yaml(yaml_path)
    out_dir = os.path.join(args.output_path, result_dir_name(args.mode + "_demo", args))
    os.makedirs(out_dir, exist_ok=True)

    samples = []
    for i, item in enumerate(items):
        src = item["source_prompt"]
        tar = item["target_prompt"]
        blend, eq = preprocess_blend_and_eq(src, tar)
        blended = item.get("blended_word", "")
        if not blended and blend is not None:
            blended = f"{blend[0][0]} {blend[1][0]}"
        # The reference CONCATENATES ``data_path + item['image']``
        # (``main_demo.py:131``; demo.yaml stores ``image: /lizard.jpg`` with
        # a leading slash, so os.path.join would wrongly treat it as
        # absolute).  Reproduce the concat against the directory the YAML
        # was actually found in; an existing path is honoured as-is for
        # ad-hoc YAMLs (absolute or cwd-relative).
        image = item["image"]
        if not os.path.exists(image):
            image = join_base + image
        samples.append((f"demo_{i}", {
            "image_path": image,
            "original_prompt": src,
            "editing_prompt": tar,
            "blended_word": blended,
            "editing_type_id": "0",
            "out_name": f"demo_{i}",
        }))

    if args.data_parallel > 0:
        from hedit_tpu.cli.main_p2p import run_data_parallel

        return run_data_parallel(args, pipe, out_dir, samples)

    for key, sample in samples:
        out = os.path.join(out_dir, f"{key}.png")
        from hedit_tpu.cli.common import resume_skip
        if resume_skip(args, out, key):
            continue
        img = run_sample(args, pipe, key, sample)
        img.save(out)
        print(f"[{key}] saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
