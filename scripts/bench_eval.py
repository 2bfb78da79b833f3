"""Wall-clock A/B of the evaluation harness: serial vs --batch lane.

VERDICT r3 #6's done-criterion: the eval CLI on a synthetic 64-image set,
before/after batching.  Uses the FULL-SIZE towers (DINO ViT-B/8, CLIP
ViT-L/14, VGG-LPIPS) with seeded weights (zero-egress image), i.e. the real
metric compute, on the default platform (TPU chip when available).

Usage: python scripts/bench_eval.py [n_images] [batch]
Prints one JSON line with both wall-clocks and the speedup.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n):
    import numpy as np
    from PIL import Image

    src = os.path.join(root, "src")
    method = os.path.join(root, "methodA")
    os.makedirs(src), os.makedirs(method)
    rs = np.random.RandomState(0)
    mapping = {}
    for i in range(n):
        name = f"img{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (512, 512, 3), np.uint8)).save(
            os.path.join(src, name))
        Image.fromarray(rs.randint(0, 255, (512, 512, 3), np.uint8)).save(
            os.path.join(method, f"img{i}.png"))
        mapping[f"img{i}"] = {
            "image_path": name,
            "original_prompt": f"a [cat] number {i}",
            "editing_prompt": f"a [dog] number {i}",
            "editing_type_id": "0",
            "mask": [1000 + 31 * i, 5000],
        }
    mf = os.path.join(root, "mapping_file.json")
    with open(mf, "w") as f:
        json.dump(mapping, f)
    return mf, src, method


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from hedit_tpu.cli.evaluation import main as eval_main

    with tempfile.TemporaryDirectory() as root:
        mf, src, method = make_dataset(root, n)
        argv = [
            "--annotation_mapping_file", mf,
            "--src_image_folder", src,
            "--tgt_methods", method,
        ]
        # warm both lanes once on a 4-image subset? no — towers compile per
        # batch shape; time full runs and report the steady-state second run
        results = {}
        for label, extra in [("serial", []),
                             ("batched", ["--batch", str(batch)])]:
            times = []
            for rep in range(2):
                out_csv = os.path.join(root, f"{label}{rep}.csv")
                t0 = time.perf_counter()
                rc = eval_main(argv + ["--result_path", out_csv] + extra)
                assert rc == 0
                times.append(time.perf_counter() - t0)
            print(f"# {label}: runs {[round(t, 1) for t in times]}",
                  file=sys.stderr)
            results[label] = min(times)
    print(json.dumps({
        "metric": "evaluation_harness_wall_s",
        "n_images": n, "batch": batch,
        "serial_s": round(results["serial"], 2),
        "batched_s": round(results["batched"], 2),
        "speedup": round(results["serial"] / results["batched"], 2),
        "serial_s_per_image": round(results["serial"] / n, 3),
        "batched_s_per_image": round(results["batched"] / n, 3),
    }))


if __name__ == "__main__":
    main()
