#!/usr/bin/env python
"""Build dist/osmgraft.zip for `spark-submit --py-files` deployment.

Deterministic: fixed timestamps + sorted member order, so re-packaging an
unchanged tree is byte-identical (stable artifact hashes for cluster-side
caching). North-rule deployment surface: the engine ships to a
multi-executor cluster as

    spark-submit --py-files dist/osmgraft.zip jobs/run_pipeline.py <args>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "osmgraft.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    members: list[tuple[str, str]] = []
    pkg = os.path.join(REPO, "osmgraft")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            # .yaml: the rules engine ships its scoring assets
            # (rules/assets/*.yaml) inside the zip; yamlspec reads them
            # via importlib.resources so zipimport works
            if f.endswith((".py", ".yaml")):
                full = os.path.join(root, f)
                members.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in members:
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build())
