"""List the biggest copy/layout ops from a profile run with their HLO context
(what produced them, what consumes them) to find removable layout churn.

Usage: python scripts/copy_inspect.py <logdir> [/tmp/unet_hlo.txt] [topN]
"""
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hedit_tpu.utils.xplane import op_times_from_logdir  # noqa: E402


def main():
    logdir = sys.argv[1]
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/unet_hlo.txt"
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    hlo = open(hlo_path).read()

    total_ps, rows = op_times_from_logdir(logdir)
    copies = [(d, n, c) for n, (d, c) in rows.items()
              if n.lstrip("%").startswith(("copy", "bitcast", "transpose"))
              or ".copy" in n]
    copies.sort(reverse=True)
    csum = sum(d for d, _, _ in copies)
    print(f"copy/layout total {csum / 1e9:.2f} ms of {total_ps / 1e9:.2f} ms"
          f" ({len(copies)} ops)")
    for dur, name, cnt in copies[:topn]:
        short = name.split(" ")[0].lstrip("%")
        m = re.search(rf"%{re.escape(short)} = [^\n]*", hlo)
        line = m.group(0) if m else name
        # who consumes it?
        users = re.findall(rf"%(\S+) = [^\n]*%{re.escape(short)}[,)]", hlo)
        users = [u for u in users if u != short][:2]
        print(f"\n{dur / 1e9:7.3f} ms x{cnt}  {line[:240]}")
        if users:
            print(f"         users: {users}")


if __name__ == "__main__":
    main()
