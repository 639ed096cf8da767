"""Exhaustive wrapper-surface sweep vs the reference package.

Walks every public class, method, and module-level function the reference
Python wrapper defines (AST-level, so the reference needs no runnable C
library) and asserts this package exposes an equivalent name.  This is the
regression guard behind the README claim that a reference user can switch
by renaming the import.

Skipped when /root/reference is not present (the tree ships with the
build environment, not the repo).
"""

import ast
import os

import pytest

REF_ROOT = "/root/reference/python/audioflux"

# ctypes handle structs and internal ABCs have no meaning here by design
SKIP_CLASSES = {"Base", "SpectrogramBase", "ResampleBase", "CQTBase"}


def _reference_surface():
    classes, funcs = {}, set()
    for dirp, _dirs, files in os.walk(REF_ROOT):
        if "__pycache__" in dirp:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            try:
                with open(os.path.join(dirp, f)) as fh:
                    tree = ast.parse(fh.read())
            except SyntaxError:
                continue
            for node in tree.body:
                if (isinstance(node, ast.ClassDef)
                        and not node.name.startswith("_")):
                    meths = {n.name for n in node.body
                             if isinstance(n, (ast.FunctionDef,
                                               ast.AsyncFunctionDef))
                             and not n.name.startswith("_")}
                    classes.setdefault(node.name, set()).update(meths)
                elif (isinstance(node, ast.FunctionDef)
                      and not node.name.startswith("_")):
                    funcs.add(node.name)
    return classes, funcs


@pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                    reason="reference tree not available")
def test_every_reference_name_has_an_equivalent():
    import matplotlib
    matplotlib.use("Agg")
    import audioflux_tpu as af
    import audioflux_tpu.display as afd
    import audioflux_tpu.fftlib as aff
    import audioflux_tpu.spectrogram as afs
    import audioflux_tpu.types as aft
    import audioflux_tpu.utils as afu

    def find(name):
        for mod in (af, afu, afd, afs, aft, aff):
            if hasattr(mod, name):
                return getattr(mod, name)
        return None

    classes, funcs = _reference_surface()
    assert len(classes) > 60 and len(funcs) > 30  # sweep sanity

    missing = []
    for cname, meths in sorted(classes.items()):
        if cname.startswith("Opaque") or cname in SKIP_CLASSES:
            continue
        ours = find(cname)
        if ours is None:
            missing.append(f"CLASS {cname}")
            continue
        missing.extend(f"METH {cname}.{m}" for m in sorted(meths)
                       if not hasattr(ours, m))
    missing.extend(f"FN {f}" for f in sorted(funcs) if find(f) is None)
    assert not missing, f"{len(missing)} reference names missing: {missing}"
