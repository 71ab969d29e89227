"""The committed spark-submit bundle must match the source tree: a stale
dist/reden_spark.zip ships old operator semantics to clusters while every
repo-side test keeps passing (the round-4 review caught exactly this).
Repack with `bash scripts/package.sh` whenever reden_spark/ changes."""

import hashlib
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_dist_bundle_fresh():
    zpath = ROOT / "dist" / "reden_spark.zip"
    assert zpath.exists(), "dist/reden_spark.zip missing — run scripts/package.sh"
    z = zipfile.ZipFile(zpath)
    names = set(z.namelist())
    tree = {p.relative_to(ROOT).as_posix() for p in (ROOT / "reden_spark").rglob("*.py")}
    missing = tree - names
    extra = names - tree
    assert not missing, f"source files absent from bundle: {sorted(missing)[:5]}"
    assert not extra, f"bundle carries deleted files: {sorted(extra)[:5]}"
    stale = [
        n
        for n in sorted(names)
        if hashlib.md5((ROOT / n).read_bytes()).digest() != hashlib.md5(z.read(n)).digest()
    ]
    assert not stale, f"bundle content differs from tree: {stale[:5]}"
