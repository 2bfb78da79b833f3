"""Bucket device-plane op times by source module, by joining the profiler
xplane op names against the compiled HLO's metadata op_name paths.

Usage: run scripts/profile_unet.py first (prints its logdir), then:
    python scripts/profile_categorize.py <logdir> [/tmp/unet_hlo.txt]
(hlo text from scripts/hlo_inspect.py)
"""
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hedit_tpu.utils.xplane import op_times_from_logdir  # noqa: E402


def hlo_metadata_map(hlo_path):
    """op short name -> metadata op_name path."""
    mm = {}
    pat = re.compile(r"%(\S+) = .*?metadata=\{op_name=\"([^\"]*)\"")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                mm[m.group(1)] = m.group(2)
    return mm


def categorize(opname, path):
    if "flash_attention" in opname or "flash_attention" in path:
        return "attention (flash kernel)"
    if "conv_general_dilated" in path:
        return "conv"
    if "group_norm" in path.lower() or "GroupNorm" in path:
        return "groupnorm"
    if "dot_general" in path or re.search(r"%dot", opname):
        return "dense matmul"
    if "copy" in opname or "bitcast" in opname:
        return "copy/layout"
    if "attentions_" in path or "attn" in path:
        return "attention (other)"
    return "other elementwise/fusion"


def main():
    logdir = sys.argv[1]
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unet_hlo.txt"
    mm = hlo_metadata_map(hlo_path)
    total_ps, rows = op_times_from_logdir(logdir)

    buckets, examples = {}, {}
    for name, (dur_ps, cnt) in rows.items():
        short = name.split(" ")[0].lstrip("%")
        path = mm.get(short, "")
        cat = categorize(name, path)
        buckets[cat] = buckets.get(cat, 0) + dur_ps
        ex = examples.setdefault(cat, [])
        if len(ex) < 3:
            ex.append((dur_ps, short, path.split("/")[-2:] if path else []))

    print(f"device total: {total_ps / 1e9:.2f} ms")
    for cat, ps in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<28} {ps / 1e9:8.2f} ms {100 * ps / total_ps:5.1f}%")
        for dur, short, tail in sorted(examples[cat], reverse=True):
            print(f"    e.g. {short[:44]:<46} {dur / 1e9:6.2f} ms  {'/'.join(tail)}")


if __name__ == "__main__":
    main()
