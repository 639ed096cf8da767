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
import warnings

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
                    with warnings.catch_warnings():
                        # the reference docstrings carry invalid LaTeX
                        # escapes that ast.parse warns about
                        warnings.simplefilter("ignore", SyntaxWarning)
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


def _reference_signatures():
    """{('ClassName', 'method' or None): [param names]} from the AST."""
    sigs = {}
    for dirp, _dirs, files in os.walk(REF_ROOT):
        if "__pycache__" in dirp:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            try:
                with open(os.path.join(dirp, f)) as fh:
                    with warnings.catch_warnings():
                        # the reference docstrings carry invalid LaTeX
                        # escapes that ast.parse warns about
                        warnings.simplefilter("ignore", SyntaxWarning)
                        tree = ast.parse(fh.read())
            except SyntaxError:
                continue
            for node in tree.body:
                if (isinstance(node, ast.ClassDef)
                        and not node.name.startswith("_")):
                    for n in node.body:
                        if (isinstance(n, ast.FunctionDef)
                                and (n.name == "__init__"
                                     or not n.name.startswith("_"))):
                            args = [a.arg for a in n.args.args
                                    if a.arg != "self"]
                            args += [a.arg for a in n.args.kwonlyargs]
                            sigs[(node.name, n.name)] = args
                elif (isinstance(node, ast.FunctionDef)
                      and not node.name.startswith("_")):
                    args = [a.arg for a in node.args.args]
                    args += [a.arg for a in node.args.kwonlyargs]
                    sigs[(None, node.name)] = args
    return sigs


# justified signature deviations (documented in README / PARITY):
SKIP_SIGS = {
    ("DWT", "__init__"),   # reference wrapper marshals samplate as
    ("WPT", "__init__"),   # waveletType*; ours follows the C API
    ("SWT", "__init__"),
}


@pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                    reason="reference tree not available")
def test_every_signature_accepts_reference_parameters():
    """Drop-in calls by KEYWORD must work: every parameter name the
    reference accepts must be accepted here too (extra parameters on our
    side are fine).  This is the guard behind the core.py findings
    (mel_num/bark_num/erb_num/cqt_num, chirp's method, resample's
    re_type...)."""
    import inspect
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

    bad = []
    for (cname, fname), ref_params in sorted(
            _reference_signatures().items(),
            key=lambda kv: (kv[0][0] or "", kv[0][1])):
        if cname is not None and (cname.startswith("Opaque")
                                  or cname in SKIP_CLASSES):
            continue
        if (cname, fname) in SKIP_SIGS:
            continue
        owner = find(cname) if cname else None
        target = (find(fname) if cname is None else
                  getattr(owner, "__init__", None) if fname == "__init__"
                  else getattr(owner, fname, None) if owner else None)
        if target is None:
            continue  # presence is the other test's job
        try:
            params = inspect.signature(target).parameters
        except (TypeError, ValueError):
            continue
        if any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in params.values()):
            continue
        names = set(params)
        miss = [p for p in ref_params if p not in names]
        if miss:
            label = f"{cname}.{fname}" if cname else fname
            bad.append(f"{label}: missing {miss}")
    assert not bad, "\n".join(bad)
