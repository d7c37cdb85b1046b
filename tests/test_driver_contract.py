"""Driver-contract smoke tests.

The round driver (a) runs ``python bench.py`` and parses ONE JSON line,
(b) compile-checks ``__graft_entry__.entry()`` single-chip, and (c) runs
``dryrun_multichip(n)`` on a virtual mesh. A regression in any of these
breaks the automated measurement pipeline silently — pin them in CI.
(The dryrun itself is exercised by the driver and too heavy for the unit
suite; here we pin its import surface and the two cheap contracts.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # Skip the TPU-tunnel plugin registration entirely: this is a CPU
        # contract check and must stay hermetic — with the plugin
        # registered, jax initializes EVERY backend's client on first
        # jax.devices(), so a wedged tunnel would hang a pure-CPU run.
        PALLAS_AXON_POOL_IPS="",
        RAJNI_BENCH_MODEL="vit_tiny_patch16_224",
        RAJNI_BENCH_BATCH="2",
        RAJNI_BENCH_ITERS="1",
        RAJNI_BENCH_KERNELS="xla",
        RAJNI_BENCH_DTYPE="float32",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "img/s" and rec["value"] > 0


def test_graft_entry_lowers_single_chip():
    """entry() must stay traceable/lowerable (the driver runs the full
    compile; executing ViT-B on the CPU backend here would cost ~8 min)."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    out_aval = lowered.out_info
    shape = jax.tree_util.tree_leaves(out_aval)[0].shape
    assert shape == (args[1].shape[0], 1000)


def test_readme_tables_match_artifacts():
    """'The table IS the artifact' (VERDICT r2/r3/r4): README's
    performance tables must be exactly what scripts/readme_tables.py
    renders from the committed bench JSONs."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "scripts/readme_tables.py", "--check"],
        cwd=REPO, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr or res.stdout
