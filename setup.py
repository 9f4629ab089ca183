"""Build driver (reference analogue: setup.py:1-256 driving CMake).

The compute path is pure Python/JAX; the only native artifact is
native/erl_gp_native.cpp (host runtime: loaders, token checkpoints, OpenMP
raycaster), compiled here into the package's ``_native/`` directory so wheels
ship it prebuilt. Installation works without a toolchain — the package falls
back to building into the user cache at import, or to the pure-Python
implementations (utils/native.py).
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "erl_gp_native.cpp")
OUT_DIR = os.path.join(HERE, "erl_gaussian_process_tpu", "_native")


class BuildWithNative(build_py):
    def run(self):
        self._build_native()
        super().run()

    def _build_native(self):
        if not os.path.exists(SRC):
            return
        os.makedirs(OUT_DIR, exist_ok=True)
        out = os.path.join(OUT_DIR, "erl_gp_native.so")
        for cc in ("c++", "g++", "clang++"):
            for extra in (["-fopenmp"], []):
                try:
                    subprocess.run(
                        [cc, "-O3", "-std=c++17", "-shared", "-fPIC",
                         *extra, SRC, "-o", out],
                        check=True, capture_output=True, timeout=300)
                    print(f"built native runtime with {cc} {extra}")
                    return
                except (OSError, subprocess.SubprocessError):
                    continue
        print("WARNING: no C++ toolchain found; the package will build the "
              "native runtime lazily at import or use Python fallbacks")


setup(cmdclass={"build_py": BuildWithNative})
