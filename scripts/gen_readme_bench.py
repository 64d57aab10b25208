"""Regenerate README.md's measured-performance table from bench records so
the headline numbers cannot drift from what was actually measured.

Provenance is explicit (round-4 verdict Weak #1): the PRIMARY column is the
latest driver-captured BENCH_r*.json — the official record; an optional
second column shows the builder's quiet-host run (bench_local_r*.json) for
comparison. Dispatch-sensitive parts carry their min–max window spread when
the record has parts_detail (bench.py median-of-3 methodology).

Usage: python scripts/gen_readme_bench.py [driver.json [local.json]]
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
     "KukaButton 224x224 ray-traced obs, Pallas coarse trace "
     "(render_scale=2, 640)", 250.0),
    ("kuka_button_raw_pixels_exact",
     "KukaButton 224x224 ray-traced obs, exact parity trace "
     "(render_scale=1, 640)", 250.0),
    ("mixed_family_raw_pixels_8192",
     "Mixed Kuka+OmniRobot pixel batch — the pod config's env side (8192)",
     250.0),
    ("ppo2_training_full_loop",
     "**Full PPO2 training loop** (probed batch, one jit)", 278.0),
    ("ppo2_training_full_loop_fused8",
     "**Full PPO2 training loop, fused 8 updates/dispatch** "
     "(--updates-per-call)", 278.0),
    ("ppo2_training_full_loop_pixels",
     "**Full PPO2 training loop from pixels** (render+CNN+update in one "
     "jit, recompute-obs)", 278.0),
    ("srl_autoencoder_training",
     "SRL autoencoder training, 224x224 fwd+bwd (img/s)", None),
    ("srl_robotic_priors_training",
     "SRL robotic-priors training (img/s)", None),
    ("srl_triplet_training",
     "SRL triplet (multi-view) training (img/s)", None),
    ("srl_encoded_env_ppo_stepping",
     "SRLEncodedEnv stepping: render→encode→policy act (512)", None),
]


def fmt(v: float) -> str:
    if v >= 1e6:
        return f"{v / 1e6:.1f}M"
    if v >= 1e3:
        return f"{v / 1e3:.0f}K"
    return f"{v:.0f}"


def load_record(path):
    with open(path) as f:
        bench = json.load(f)
    # Driver files wrap the result under "parsed"; a raw bench.py output
    # line (passed explicitly) is the result itself.
    parsed = bench.get("parsed", bench)
    parts = dict(parsed["parts"])
    parts["__aggregate__"] = parsed["value"]
    return parts, parsed.get("parts_detail", {})


def cell(parts, detail, key):
    if key not in parts:
        return "—"
    s = fmt(parts[key])
    d = detail.get(key)
    if d and d.get("min") is not None and d["max"] > d["min"]:
        s += f" ({fmt(d['min'])}–{fmt(d['max'])})"
    return s


def main() -> int:
    if len(sys.argv) > 1:
        driver_path = sys.argv[1]
    else:
        records = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        assert records, "no BENCH_r*.json found"
        driver_path = records[-1]
    local_path = None
    if len(sys.argv) > 2:
        local_path = sys.argv[2]
    else:
        locals_ = sorted(glob.glob(os.path.join(ROOT, "bench_local_r*.json")))
        if locals_:
            local_path = locals_[-1]

    d_parts, d_detail = load_record(driver_path)
    l_parts, l_detail = ({}, {})
    if local_path:
        l_parts, l_detail = load_record(local_path)

    d_name = os.path.basename(driver_path)
    l_name = os.path.basename(local_path) if local_path else None
    header = f"| Path | driver record ({d_name}) |"
    sep = "|---|---|"
    if l_name:
        header += f" quiet host ({l_name}) |"
        sep += "---|"
    header += " vs reference |"
    sep += "---|"

    lines = [header, sep]
    for key, label, base in ROWS:
        if key not in d_parts and key not in l_parts:
            continue
        row = f"| {label} | {cell(d_parts, d_detail, key)} |"
        if l_name:
            row += f" {cell(l_parts, l_detail, key)} |"
        v = d_parts.get(key, l_parts.get(key))
        vs = f"~{v / base:,.0f}x" if base else "—"
        row += f" {vs} |"
        lines.append(row)
    lines.append("")
    lines.append(
        "_Driver record = the per-round bench captured on the shared runner "
        "(official); quiet host = the builder's run on an otherwise idle "
        "machine. Parenthesized ranges are min–max over the 3 independent "
        "timing windows; the headline cell is the median. vs-reference uses "
        "the driver column._"
    )
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
    if new == readme:
        print("README table unchanged or markers missing", file=sys.stderr)
    with open(readme_path, "w") as f:
        f.write(new)
    print(f"README table regenerated from {d_name}"
          + (f" + {l_name}" if l_name else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
