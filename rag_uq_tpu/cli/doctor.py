"""Environment doctor: verify the runtime prerequisites.

The analogue of the reference's setup script (scripts/setup.sh checks
Docker, starts services, pulls models): here there are no services to
start, so doctor reports device availability, dependency versions, the
native toolchain, and optional extras — and creates the standard data/model
directories.
"""

from __future__ import annotations

import argparse
import importlib
import json
import logging
import shutil
from pathlib import Path
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

REQUIRED = ["jax", "flax", "optax", "numpy"]
OPTIONAL = ["rouge_score", "matplotlib", "datasets", "orbax.checkpoint"]


def diagnose(create_dirs: bool = False, workdir: str = ".") -> dict:
    report: dict = {"required": {}, "optional": {}, "devices": [], "ok": True}

    for mod in REQUIRED:
        try:
            m = importlib.import_module(mod)
            report["required"][mod] = getattr(m, "__version__", "ok")
        except ImportError as e:
            report["required"][mod] = f"MISSING ({e})"
            report["ok"] = False

    for mod in OPTIONAL:
        try:
            m = importlib.import_module(mod)
            report["optional"][mod] = getattr(m, "__version__", "ok")
        except ImportError:
            report["optional"][mod] = "missing (feature degraded)"

    try:
        import jax

        report["devices"] = [str(d) for d in jax.devices()]
        report["default_backend"] = jax.default_backend()
    except Exception as e:  # pragma: no cover
        report["devices_error"] = str(e)
        report["ok"] = False

    report["cxx_compiler"] = shutil.which("g++") or "missing"
    try:
        from rag_uq_tpu.native import is_available

        report["native_runtime"] = "ok" if is_available() else "unavailable"
    except Exception as e:
        report["native_runtime"] = f"error: {e}"

    if create_dirs:
        for d in ("data/raw", "data/preprocessed", "models/router", "results"):
            Path(workdir, d).mkdir(parents=True, exist_ok=True)
        report["dirs_created"] = True
    return report


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Check the environment")
    parser.add_argument("--create-dirs", action="store_true")
    parser.add_argument("--workdir", default=".")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    report = diagnose(create_dirs=args.create_dirs, workdir=args.workdir)
    print(json.dumps(report, indent=2))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
