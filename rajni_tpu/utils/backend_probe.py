"""Bounded JAX-backend-init probe, shared by the benchmark entry points.

The TPU tunnel in this environment can wedge in a state where the first
``jax.devices()`` hangs forever inside the plugin's client init — even for
CPU-targeted runs, because registering the plugin initializes every
backend's client. Probing in a throwaway subprocess with a timeout converts
that hang into a clean, diagnosable failure; the probe child inherits the
caller's env (``JAX_PLATFORMS``/``PALLAS_AXON_POOL_IPS``), so hermetic CPU
invocations stay hermetic.
"""

from __future__ import annotations

import subprocess
import sys


def probe_backend_init(timeout_s: int) -> str | None:
    """Try ``jax.devices()`` in a subprocess. Returns None when the backend
    initializes within ``timeout_s`` seconds, else a human-readable reason.
    ``timeout_s <= 0`` skips the probe entirely."""
    if timeout_s <= 0:
        return None
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return (f"jax backend init did not complete within {timeout_s}s — "
                "device tunnel down or wedged")
    except subprocess.CalledProcessError as e:
        return ("jax backend init failed:\n"
                + e.stderr.decode(errors="replace")[-2000:])
    return None
