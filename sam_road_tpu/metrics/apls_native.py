"""Compile-on-demand wrapper for the native C++ APLS scorer (native/apls.cc).

The reference invokes its Go scorer per tile via `go run`
(reference: cityscale_metrics/apls.bash:15); here the C++ binary is built
once and cached next to the source.
"""

from __future__ import annotations

import os
import shutil
import subprocess


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "apls.cc")


def ensure_apls_binary() -> str | None:
    """Build (if needed) and return the binary path; None if unavailable."""
    src = _source_path()
    if not os.path.exists(src) or shutil.which("g++") is None:
        return None
    build_dir = os.path.join(os.path.dirname(src), "build")
    os.makedirs(build_dir, exist_ok=True)
    binary = os.path.join(build_dir, "apls")
    if os.path.exists(binary) and os.path.getmtime(binary) >= os.path.getmtime(src):
        return binary
    cmd = ["g++", "-O2", "-std=c++17", "-o", binary, src, "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        print(f"apls native build failed: {e.stderr.decode()[:500]}")
        return None
    return binary


def apls_score_files_native(gt_path: str, prop_path: str, out_path: str,
                            spacenet: bool = False):
    """Run the native scorer; returns (apls_gt, apls_prop, mean) or None."""
    binary = ensure_apls_binary()
    if binary is None:
        return None
    cmd = [binary, gt_path, prop_path, out_path]
    if spacenet:
        cmd.append("spacenet")
    subprocess.run(cmd, check=True, capture_output=True)
    with open(out_path) as f:
        parts = f.read().split()
    return float(parts[0]), float(parts[1]), float(parts[2])
