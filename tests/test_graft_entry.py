"""Regression tests for the driver entry points in __graft_entry__.py.

Round-3 failure mode being pinned down: ``dryrun_multichip`` called
``jax.devices()`` *before* forcing the CPU platform. Under the axon
sitecustomize (which force-sets ``jax_platforms="axon,cpu"``), that first
call initializes the TPU backend — and when the TPU relay is wedged, backend
init blocks indefinitely, so the driver's 8-virtual-CPU-device check timed
out (MULTICHIP_r03 rc=124). The check must never depend on TPU availability.
"""

import ast
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__graft_entry__.py"


def test_dryrun_forces_cpu_before_devices_statically():
    """In dryrun_multichip's source, the jax_platforms=cpu config update must
    precede every jax.devices() call — the wedge-proofing invariant."""
    tree = ast.parse(ENTRY.read_text())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "dryrun_multichip"
    )
    events = []
    for node in ast.walk(fn):
        if not isinstance(node, ast.Call):
            continue
        target = ast.unparse(node.func)
        if target == "jax.config.update":
            args = [ast.unparse(a) for a in node.args]
            if args and "jax_platforms" in args[0] and "cpu" in args[1]:
                events.append(("force_cpu", node.lineno))
        elif target == "jax.devices":
            events.append(("devices", node.lineno))
    events.sort(key=lambda e: e[1])
    assert events, "expected jax.config.update and jax.devices calls"
    assert events[0][0] == "force_cpu", (
        "dryrun_multichip must force jax_platforms='cpu' BEFORE the first "
        f"jax.devices() call; observed order: {events}"
    )


def test_dryrun_multichip_runs_with_axon_default_platform():
    """Run the real dryrun in a subprocess with jax_platforms left at the
    axon sitecustomize default. With the fix, the axon backend is never
    initialized, so this passes quickly regardless of TPU state; without it,
    a wedged TPU hangs past the timeout."""
    env = dict(os.environ)
    # Leave PYTHONPATH's axon sitecustomize intact (that's the point), but
    # drop the conftest's CPU-forcing env var so the subprocess sees the
    # axon default, and give it the 8 virtual CPU devices the driver sets.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        env=env,
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip ok: 8 devices" in proc.stdout
