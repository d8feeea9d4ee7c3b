"""Build hook: compile the optional native decode runtime into the wheel.

All project metadata lives in pyproject.toml; this file only teaches
setuptools to compile ``native/css_io.cpp`` (libjpeg/libpng JPEG/PNG →
canvas decoders, GIL-released — see native/) into
``css_tpu/_native/libcss_io.so`` at build time.  The build is best-effort:
when no C++ toolchain or image libraries are present the wheel simply ships
without the library and ``css_tpu.data.native_io`` falls back to PIL.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


def _try_build_native(out_dir: str) -> bool:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "css_io.cpp")
    if not os.path.exists(src):
        return False
    cxx = os.environ.get("CXX", "g++")
    if shutil.which(cxx) is None:
        return False
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libcss_io.so")
    cmd = [cxx, "-O3", "-fPIC", "-Wall", "-std=c++17", "-shared",
           "-o", out, src, "-ljpeg", "-lpng", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", b"") or b""
        if isinstance(detail, bytes):
            detail = detail.decode(errors="replace")
        sys.stderr.write(
            f"css-tpu: native decode runtime not built ({e}); "
            "the PIL fallback will be used.\n"
            + (f"compiler output:\n{detail}\n" if detail.strip() else ""))
        return False


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        # place the shared library inside the build tree so package-data
        # globbing (css_tpu/_native/*.so) picks it up for the wheel
        _try_build_native(os.path.join(self.build_lib, "css_tpu", "_native"))


setup(cmdclass={"build_py": BuildPyWithNative})
