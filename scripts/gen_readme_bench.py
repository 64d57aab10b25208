"""Regenerate README.md's measured-performance table from the latest
BENCH_r*.json so the headline numbers cannot drift from what the driver
actually measured (they did drift by hand-editing before; see VERDICT r3).

Usage: python scripts/gen_readme_bench.py  (run from the repo root)
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (part key, row label incl. bench batch size, reference baseline steps/s)
ROWS = [
    ("mobile_robot",
     "MobileRobot ground truth (16384)", 250.0),
    ("car_racing",
     "CarRacing ground truth (8192)", 250.0),
    ("kuka_button",
     "KukaButton ground truth, closed-form IK + scalar Givens FK (8192)",
     250.0),
    ("__aggregate__",
     "Mixed aggregate (headline)", 250.0),
    ("mobile_robot_raw_pixels",
     "MobileRobot 224x224 rendered obs, packed-u32 compositor (1024)", 250.0),
    ("car_racing_raw_pixels",
     "CarRacing 224x224 rendered obs (1024)", 250.0),
    ("kuka_button_raw_pixels",
     "KukaButton 224x224 ray-traced obs, Pallas (640)", 250.0),
    ("mixed_family_raw_pixels_8192",
     "Mixed Kuka+OmniRobot pixel batch — the pod config's env side (8192)",
     250.0),
    ("ppo2_training_full_loop",
     "**Full PPO2 training loop** (4096 envs, one jit)", 278.0),
    ("ppo2_training_full_loop_fused8",
     "**Full PPO2 training loop, fused 8 updates/dispatch** "
     "(--updates-per-call)", 278.0),
    ("ppo2_training_full_loop_pixels",
     "**Full PPO2 training loop from pixels** (render+CNN+update in one jit)",
     278.0),
    ("srl_autoencoder_training",
     "SRL autoencoder training, 224x224 fwd+bwd (img/s)", None),
]


def fmt(v: float) -> str:
    if v >= 1e6:
        return f"{v / 1e6:.1f}M"
    if v >= 1e3:
        return f"{v / 1e3:.0f}K"
    return f"{v:.0f}"


def main() -> int:
    if len(sys.argv) > 1:
        benches = [sys.argv[1]]
    else:
        benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    assert benches, "no BENCH_r*.json found"
    with open(benches[-1]) as f:
        bench = json.load(f)
    # Driver files wrap the result under "parsed"; a raw bench.py output
    # line (passed explicitly) is the result itself.
    parsed = bench.get("parsed", bench)
    parts = dict(parsed["parts"])
    parts["__aggregate__"] = parsed["value"]

    lines = ["| Path | steps/s/chip | vs reference |", "|---|---|---|"]
    for key, label, base in ROWS:
        if key not in parts:
            continue
        v = parts[key]
        vs = f"~{v / base:,.0f}x".replace(",", ",") if base else "—"
        lines.append(f"| {label} | {fmt(v)} | {vs} |")
    table = "\n".join(lines)

    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    new = re.sub(
        r"(<!-- BENCH_TABLE_START \(generated from "
        r"BENCH_r\*\.json by scripts/gen_readme_bench\.py\) -->\n).*?"
        r"(\n<!-- BENCH_TABLE_END -->)",
        lambda m: m.group(1) + table + m.group(2),
        readme,
        flags=re.S,
    )
    src = os.path.basename(benches[-1])
    if new == readme:
        print("README table unchanged or markers missing", file=sys.stderr)
    with open(readme_path, "w") as f:
        f.write(new)
    print(f"README table regenerated from {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
