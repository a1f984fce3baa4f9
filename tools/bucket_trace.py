"""Join analyze_trace exclusive times with HLO metadata -> bucketed table.

Usage: python tools/bucket_trace.py <profile_dir> <hlo_txt> [n_steps]

For each traced op, finds its HLO definition line and extracts the
op_name metadata + source line, then prints every op >= 0.1 ms/step with
its attribution, sorted. This is the round-4 successor to reading
analyze_trace output against a manual grep of the HLO dump.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from analyze_trace import exclusive_times, load_events  # noqa: E402


def hlo_metadata(hlo_path):
    meta = {}
    for line in open(hlo_path):
        m = re.match(r"\s+%?([\w.\-]+) = (\S+)", line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        om = re.search(r'op_name="([^"]*)"', line)
        sl = re.search(r"source_line=(\d+)", line)
        sf = re.search(r'source_file="([^"]*)"', line)
        meta[name] = (
            shape,
            om.group(1) if om else "",
            (Path(sf.group(1)).name if sf else "") + ":" + (sl.group(1) if sl else ""),
        )
    return meta


def main():
    profile_dir, hlo_path = sys.argv[1], sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    excl, cnt_by = exclusive_times(load_events(profile_dir))
    meta = hlo_metadata(hlo_path)
    rows = []
    for name, ms in excl.items():
        cnt = cnt_by[name]
        per_step = ms / n_steps
        if per_step < 0.05:
            continue
        shape, op_name, src = meta.get(name, ("?", "?", "?"))
        rows.append((per_step, cnt // n_steps, name, shape[:46], op_name[-72:], src))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{'ms/step':>8} {'x':>3}  name / shape / op_name / src   (sum {total:.1f} ms)")
    for per_step, cnt, name, shape, op_name, src in rows:
        print(f"{per_step:8.3f} x{cnt:<3} {name:<42} {shape}")
        print(f"{'':14}{op_name}  [{src}]")


if __name__ == "__main__":
    main()
