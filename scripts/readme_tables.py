"""Generate README's performance tables FROM the committed bench artifacts.

"The table IS the artifact" (VERDICT r2/r3): every number in README's
performance section must grep out of a committed JSON. This script renders
the three tables from `BENCH_r*.json` (newest), `BENCH_SUITE.json` and
`BENCH_TRAIN.json` and splices them between the README marker comments:

    <!-- TABLE:headline --> ... <!-- /TABLE:headline -->
    <!-- TABLE:suite -->    ... <!-- /TABLE:suite -->
    <!-- TABLE:train -->    ... <!-- /TABLE:train -->

Usage:
    python scripts/readme_tables.py --write   # update README.md in place
    python scripts/readme_tables.py --check   # exit 1 if README is stale
                                              # (tests/test_driver_contract)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_jsonl(path):
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _suite_rows():
    return {r["config"]: r for r in _load_jsonl(
        os.path.join(ROOT, "BENCH_SUITE.json")
    )}


def headline_table() -> str:
    """The ViT-B/16 batch-256 bf16 schedule.json ladder: XLA → fused →
    int8, from the newest driver artifact + the suite's xla/int8 rows."""
    runs = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    with open(runs[-1]) as f:
        drv = json.load(f)["parsed"]
    s = _suite_rows()
    xla = s["vit_b16_schedulejson_xla"]
    i8 = s["vit_b16_schedulejson_int8"]
    i8s = s["vit_b16_schedulejson_int8_static"]
    src = os.path.basename(runs[-1])

    def vs(x):
        return x / drv["xla_base_img_per_s"]

    lines = [
        "| configuration | img/s/chip | vs XLA base | source |",
        "|---|---|---|---|",
        f"| unpruned, XLA ops | {drv['xla_base_img_per_s']:.0f} | 1.00× "
        f"| `{src}` |",
        f"| pruned, XLA ops | {xla['img_per_s']:.0f} | "
        f"{vs(xla['img_per_s']):.2f}× | `BENCH_SUITE.json` |",
        f"| unpruned, fused Pallas kernels | {drv['base_img_per_s']:.0f} | "
        f"{vs(drv['base_img_per_s']):.2f}× | `{src}` |",
        f"| **pruned, fused Pallas kernels** | **{drv['value']:.0f}** | "
        f"**{drv['vs_xla_base']:.2f}×** | `{src}` |",
        f"| pruned + int8 (opt-in, `rajni_tpu.quant`) | "
        f"{i8['img_per_s']:.0f} | {vs(i8['img_per_s']):.2f}× "
        f"| `BENCH_SUITE.json` |",
        f"| pruned + int8, calibrated static scales "
        f"(`--quantize --calibrate N`) | {i8s['img_per_s']:.0f} | "
        f"{vs(i8s['img_per_s']):.2f}× | `BENCH_SUITE.json` |",
    ]
    return "\n".join(lines)


_SUITE_LABELS = [
    ("vit_b16_readme_schedule", "ViT-B/16 + README schedule, batch 256"),
    ("deit_s_dynamic_rescoring",
     "DeiT-S dynamic re-scoring (8 blocks), batch 256"),
    ("vit_l16_aggressive_b256",
     "ViT-L/16 aggressive (keep 0.7 ×4), batch 256"),
    ("vit_b16_384_mixed",
     "ViT-B/384 (577 tokens) mixed ratios, batch 128"),
    ("vit_h14_probe",
     "ViT-H/14 @224 routing probe (keep 0.7 ×4), batch 128"),
    ("vit_b16_schedulejson_int8", "ViT-B/16 schedule.json, int8 (opt-in)"),
    ("vit_b16_schedulejson_int8_static",
     "ViT-B/16 schedule.json, int8 + calibrated static scales"),
    ("deit_s_dynamic_int8", "DeiT-S dynamic re-scoring, int8 (opt-in)"),
    ("deit_s_dynamic_int8_static",
     "DeiT-S dynamic re-scoring, int8 + static scales"),
    ("vit_l16_aggressive_int8", "ViT-L/16 aggressive, int8 (opt-in)"),
    ("vit_b16_384_int8", "ViT-B/384 mixed, int8 (opt-in)"),
    ("vit_b16_384_int8_static", "ViT-B/384 mixed, int8 + static scales"),
    ("vit_h14_probe_int8", "ViT-H/14 probe, int8 (opt-in)"),
    ("vit_h14_probe_int8_static", "ViT-H/14 probe, int8 + static scales"),
]


def suite_table() -> str:
    s = _suite_rows()
    lines = [
        "| BASELINE.json config | pruned img/s | base img/s | speedup "
        "| pruned MFU |",
        "|---|---|---|---|---|",
    ]
    for key, label in _SUITE_LABELS:
        r = s.get(key)
        if r is None:
            continue
        if "mfu" in r and r["mfu"] is not None:
            mfu = f"{100 * r['mfu']:.0f}%"
        else:
            mfu = f"{100 * r['mfu_vs_bf16_peak']:.0f}% of bf16 peak"
        lines.append(
            f"| {label} | {r['img_per_s']:.0f} | {r['base_img_per_s']:.0f} "
            f"| {r['speedup']:.2f}× | {mfu} |"
        )
    return "\n".join(lines)


_TRAIN_LABELS = [
    ("vit_base_patch16_224_train_schedulejson",
     "ViT-B/16 schedule.json, batch 128"),
    ("vit_base_patch16_224_train_schedulejson_kernels",
     "ViT-B/16 schedule.json, batch 128, `--kernels pallas`"),
    ("vit_base_patch16_224_train_schedulejson_droppath",
     "ViT-B/16 schedule.json, batch 128, `--drop_path 0.1`"),
    ("vit_base_patch16_224_train_schedulejson_remat",
     "ViT-B/16 schedule.json, batch 128, `--remat`"),
    ("vit_base_patch16_224_train_schedulejson_remat_kernels",
     "ViT-B/16 schedule.json, batch 128, `--remat --kernels pallas`"),
    ("vit_large_patch16_224_train_schedulejson_remat",
     "ViT-L/16 schedule.json, batch 256, `--remat`"),
    ("vit_large_patch16_224_train_schedulejson_remat_kernels",
     "ViT-L/16 schedule.json, batch 256, `--remat --kernels pallas`"),
    ("deit_small_patch16_224_train_schedulejson",
     "DeiT-S schedule.json, batch 256"),
    ("deit_small_patch16_224_train_schedulejson_kernels",
     "DeiT-S schedule.json, batch 256, `--kernels pallas`"),
]


def train_table() -> str:
    with open(os.path.join(ROOT, "BENCH_TRAIN.json")) as f:
        rows = {r["config"]: r for r in json.load(f)}
    lines = [
        "| config | pruned img/s | base img/s | speedup | pruned MFU |",
        "|---|---|---|---|---|",
    ]
    for key, label in _TRAIN_LABELS:
        r = rows.get(key)
        if r is None:
            continue
        mfu = f"{100 * r['mfu']:.0f}%" if "mfu" in r else "—"
        lines.append(
            f"| {label} | {r['img_per_s']} | {r['base_img_per_s']} "
            f"| {r['speedup']:.2f}× | {mfu} |"
        )
    return "\n".join(lines)


def render(readme: str) -> str:
    tables = {
        "headline": headline_table(),
        "suite": suite_table(),
        "train": train_table(),
    }
    for name, body in tables.items():
        pat = re.compile(
            rf"(<!-- TABLE:{name} -->\n).*?(<!-- /TABLE:{name} -->)",
            re.S,
        )
        if not pat.search(readme):
            raise SystemExit(f"README missing markers for table {name!r}")
        readme = pat.sub(lambda m: m.group(1) + body + "\n" + m.group(2),
                         readme)
    return readme


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--write", action="store_true")
    g.add_argument("--check", action="store_true")
    args = ap.parse_args()

    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        current = f.read()
    fresh = render(current)
    if args.write:
        with open(path, "w") as f:
            f.write(fresh)
        print("README.md tables regenerated from artifacts")
    elif fresh != current:
        print("README.md performance tables are STALE — run "
              "`python scripts/readme_tables.py --write`", file=sys.stderr)
        sys.exit(1)
    else:
        print("README.md tables match the artifacts")


if __name__ == "__main__":
    main()
