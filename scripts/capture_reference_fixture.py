"""Capture a parity fixture by EXECUTING the reference program.

Runs ``/root/reference/rajni``'s actual ``RAJNIViTWrapper`` (wrapper/
model.py:6-69, which executes attention.py + importance.py verbatim) over a
timm-shaped adapter (tests/test_reference_exec.py) at real
``vit_tiny_patch16_224`` geometry (12 blocks, N=197, C=192) with the shipped
``schedule.json`` schedule, and commits:

  * ``tests/fixtures/reference_vit_tiny_schedulejson.npz`` — seeded images +
    the reference program's fp32 CPU logits;
  * ``tests/fixtures/reference_vit_tiny_schedulejson.msgpack`` — the same
    weights converted to this framework's checkpoint format.

``tests/test_attest.py::test_dropped_in_fixtures`` then replays the pair on
every test run — the reference program is permanently in the test loop.
Weights are seeded random (no pretrained hub in this environment); on a
machine with timm + ImageNet, point ``--state_dict`` at a real checkpoint to
produce the pretrained-weight attestation the north star asks for
(reference eval path: /root/reference/rajni/run.py:89-131).

Usage: python scripts/capture_reference_fixture.py [--n 16] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, "/root/reference")

# the replay check is a CPU-fp32 parity statement (the committed fixture is
# replayed by tests under the CPU conftest); the TPU backend's default
# reduced matmul precision is not what is being attested here. sitecustomize
# pre-imports jax for the axon tunnel, so the env var alone is too late —
# force the platform through jax.config (see tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MODEL = "vit_tiny_patch16_224"
# /root/reference/schedule.json, int-normalized (SURVEY.md §2 quirk)
SCHEDULE = {
    3: {"keep_ratio": 0.95, "update": False},
    4: {"keep_ratio": 0.95, "update": True},
    5: {"keep_ratio": 0.85, "update": True},
    6: {"keep_ratio": 0.85, "update": True},
    7: {"keep_ratio": 0.95, "update": True},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16, help="images to capture")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir",
                   default=os.path.join(REPO, "tests", "fixtures"))
    p.add_argument("--state_dict", default=None,
                   help="optional timm .pth to use instead of seeded init")
    args = p.parse_args()

    import torch

    import rajni.wrapper  # the reference package, verbatim

    from rajni_tpu.attest import check_fixture, save_fixture
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.convert import convert_timm_state_dict
    from rajni_tpu.params.io import save_params
    from tests.test_reference_exec import TimmShapedViT, TorchOracleViT

    cfg = get_config(MODEL)
    torch.manual_seed(args.seed)
    oracle = TorchOracleViT(cfg).eval()
    if args.state_dict:
        oracle.load_state_dict(torch.load(args.state_dict, map_location="cpu"))

    wrapper = rajni.wrapper.RAJNIViTWrapper(TimmShapedViT(oracle), SCHEDULE)
    wrapper.eval()

    rng = np.random.default_rng(args.seed)
    images = rng.standard_normal(
        (args.n, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        logits = wrapper(
            torch.from_numpy(images).permute(0, 3, 1, 2)
        ).numpy()
    counts = wrapper.get_last_stats()["token_counts"]
    print(f"reference token_counts: {counts}")

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.join(args.out_dir, "reference_vit_tiny_schedulejson")
    save_fixture(
        stem + ".npz", images, logits, MODEL, SCHEDULE,
        source="reference program /root/reference/rajni executed verbatim "
               f"(RAJNIViTWrapper, CPU fp32, seed={args.seed}, "
               f"{'pretrained' if args.state_dict else 'seeded-random'} "
               "weights, schedule.json)",
    )
    params = convert_timm_state_dict(oracle.state_dict(), cfg, np.float32)
    save_params(stem + ".msgpack", params)

    report = check_fixture(stem + ".npz", params)
    print(json.dumps(report, indent=2))
    if report["top1_agreement"] < 1.0:
        raise SystemExit("replay disagreed with the reference program")
    print(f"wrote {stem}.npz / .msgpack")


if __name__ == "__main__":
    main()
