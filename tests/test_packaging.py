"""Packaging-integrity guards.

An unanchored `data/` line in .gitignore once silently excluded the
whole `generative_models_tpu/data` subpackage from every commit; the
module was lost on a machine reset and had to be reconstructed from
its call sites. These tests make that class of loss impossible to miss
again.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "generative_models_tpu"


def _git(*args):
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True)


def _package_py_files():
    out = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.relpath(os.path.join(root, f), REPO))
    return sorted(out)


@pytest.fixture(scope="module")
def in_git_repo():
    r = _git("rev-parse", "--is-inside-work-tree")
    if r.returncode != 0 or r.stdout.strip() != "true":
        pytest.skip("not running inside the git checkout")


def test_every_package_source_is_tracked(in_git_repo):
    tracked = set(
        _git("ls-files", PKG).stdout.splitlines())
    on_disk = _package_py_files()
    assert on_disk, "package sources not found on disk"
    missing = [p for p in on_disk if p not in tracked]
    assert not missing, (
        f"package sources on disk but NOT tracked by git (check "
        f".gitignore for patterns matching them): {missing}")


def test_no_package_source_is_gitignored(in_git_repo):
    files = _package_py_files()
    r = _git("check-ignore", "--no-index", *files)
    # exit 1 = nothing ignored (the healthy state)
    assert r.returncode == 1, (
        f"git would ignore package sources: {r.stdout.splitlines()}")


def test_setuptools_discovers_all_subpackages():
    from setuptools import find_packages

    found = set(find_packages(where=REPO, include=[f"{PKG}*"]))
    expected = {PKG} | {
        f"{PKG}.{d}" for d in os.listdir(os.path.join(REPO, PKG))
        if os.path.isfile(os.path.join(REPO, PKG, d, "__init__.py"))}
    assert expected <= found, f"missing: {expected - found}"


# --- citation integrity -------------------------------------------------
#
# Round 4 shipped a default (Config.vq_decode) "justified by" a
# measurement file that did not exist (benchmarks/vq_decode_ab.json was
# cited in config.py, losses/vqprior.py, and docs/variants/vqprior.md
# but never committed). In a repo whose discipline is "defaults follow
# measurements", a phantom citation is worse than none. This test makes
# that rot structurally impossible: every `benchmarks/<name>.json`
# mentioned anywhere in package code or docs must be a git-TRACKED file
# (on-disk-but-untracked was exactly the round-4 failure mode).

_CITATION_ROOTS = [PKG, "docs", "benchmarks", "README.md", "BASELINE.md"]
_CITE_RE = r"benchmarks/[A-Za-z0-9_./-]+\.json"


def _cited_benchmark_jsons():
    import re
    cites = {}  # path -> first citing file
    for root in _CITATION_ROOTS:
        full = os.path.join(REPO, root)
        if os.path.isfile(full):
            walk = [(REPO, [], [root])]
        else:
            walk = os.walk(full)
        for r, dirs, files in walk:
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if not f.endswith((".py", ".md")):
                    continue
                p = os.path.join(r, f)
                with open(p, encoding="utf-8", errors="replace") as fh:
                    for m in re.findall(_CITE_RE, fh.read()):
                        cites.setdefault(m, os.path.relpath(p, REPO))
    return cites


def test_every_cited_benchmark_json_is_committed(in_git_repo):
    cites = _cited_benchmark_jsons()
    assert cites, "citation scan found nothing — scanner broken?"
    tracked = set(_git("ls-files", "benchmarks").stdout.splitlines())
    phantoms = {c: src for c, src in cites.items() if c not in tracked}
    assert not phantoms, (
        "files cite benchmarks JSONs that are not committed "
        f"(phantom evidence): {phantoms}")
