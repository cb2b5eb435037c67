"""Source snapshotting into the results directory.

Reference counterpart: every run copies model/transformer sources and zips
the whole tree into results (config.py:215-226 — the origin of the
reference's `vis/` artifact dirs). Here: one `code.zip` of the installed
flashvtg_tpu package per run.
"""

from __future__ import annotations

import os
import zipfile


def snapshot_code(results_dir: str) -> str:
    import flashvtg_tpu

    pkg_root = os.path.dirname(os.path.abspath(flashvtg_tpu.__file__))
    out_path = os.path.join(results_dir, "code.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith((".pyc", ".swp")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "flashvtg_tpu", os.path.relpath(full, pkg_root)
                )
                zf.write(full, rel)
    return out_path
