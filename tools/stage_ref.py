"""Stage the reference oracle into .ref/ (gitignored, per-machine).

Builds what tools/gen_goldens.py / tools/bench_ref.py and the C-oracle
fuzz tests expect:

  .ref/libaudioflux.so   — the reference C core compiled on this machine
  .ref/pkg/audioflux     — copy of the reference's own ctypes wrapper,
                           with its lib/ dir pointing at the .so above
  .ref/soundfile_stub.py — minimal soundfile shim (the wrapper imports
                           it at module load; no audio IO is exercised)

Run: python tools/stage_ref.py   (gcc line from .claude/skills/verify)
"""

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
REF_PY = "/root/reference/python/audioflux"
REF_DIR = os.path.join(ROOT, ".ref")
SO = os.path.join(REF_DIR, "libaudioflux.so")

STUB = '''"""Minimal soundfile stub for the staged reference wrapper.

The wrapper's audio.py imports soundfile at module load; the golden
generators never touch audio files, so only the names need to exist.
"""


class SoundFile:  # pragma: no cover - never instantiated by gen_goldens
    def __init__(self, *a, **k):
        raise NotImplementedError("soundfile stub: no real audio IO")


def read(*a, **k):
    raise NotImplementedError("soundfile stub: no real audio IO")


def write(*a, **k):
    raise NotImplementedError("soundfile stub: no real audio IO")
'''


def main():
    os.makedirs(REF_DIR, exist_ok=True)
    if not os.path.exists(SO):
        dirs = ["", "vector", "util", "dsp", "classic", "filterbank",
                "feature", "mir", "track"]
        srcs = []
        for d in dirs:
            p = os.path.join(REF_SRC, d)
            srcs += [os.path.join(p, f) for f in sorted(os.listdir(p))
                     if f.endswith(".c")]
        cmd = (["gcc", "-O2", "-fPIC", "-shared", "-fopenmp", "-DHAVE_OMP",
                f"-I{REF_SRC}"] + srcs + ["-lm", "-o", SO])
        print("building", SO)
        subprocess.run(cmd, check=True)

    pkg = os.path.join(REF_DIR, "pkg")
    dst = os.path.join(pkg, "audioflux")
    if not os.path.isdir(dst):
        print("staging", dst)
        shutil.copytree(REF_PY, dst)
    lib_dir = os.path.join(dst, "lib")
    os.makedirs(lib_dir, exist_ok=True)
    link = os.path.join(lib_dir, "libaudioflux.so")
    # lexists: a DANGLING link (repo moved, partial clean) must be
    # replaced, and plain exists() would miss it then crash os.symlink
    if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(SO):
        os.unlink(link)
    if not os.path.lexists(link):
        os.symlink(SO, link)

    stub = os.path.join(REF_DIR, "soundfile_stub.py")
    if not os.path.exists(stub):
        with open(stub, "w") as f:
            f.write(STUB)
    print("staged: ", SO, dst, stub)


if __name__ == "__main__":
    sys.exit(main())
