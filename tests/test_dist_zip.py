"""The packaged --py-files zip must byte-match the source tree — a stale zip
ships an old module to every executor while local runs use the new one
(silently divergent deployments)."""
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "stl_decomp_4j_spark"
ZIP = ROOT / "dist" / "stl_decomp_4j_spark.zip"


def test_dist_zip_matches_source_tree():
    assert ZIP.exists(), "run python tools/package.py"
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    src = {
        str(p.relative_to(ROOT)): p.read_bytes() for p in sorted(PKG.rglob("*.py"))
    }
    assert set(zipped) == set(src), (
        f"zip/source file sets differ: only-zip={set(zipped) - set(src)}, "
        f"only-src={set(src) - set(zipped)} — re-run python tools/package.py"
    )
    stale = [n for n in src if zipped[n] != src[n]]
    assert not stale, f"stale modules in dist zip (re-run python tools/package.py): {stale}"
