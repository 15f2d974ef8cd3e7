"""Builds the REFERENCE's own C++ (CPU) engines for golden parity tests.

The reference ships CPU twins of every kernel precisely so logic can be
checked without a GPU (SURVEY.md §4.4); we compile those same sources with
-DNOCUDA via torch's cpp_extension and test our JAX engines against them
move-for-move. Build artifacts are cached under /tmp/torch_ext.
"""
import functools
import os
import sysconfig

REF = "/root/reference/boardlaw"


@functools.lru_cache(maxsize=None)
def _load(name, source):
    os.environ.setdefault("TORCH_EXTENSIONS_DIR", "/tmp/torch_ext")
    import torch.utils.cpp_extension as ext

    [torch_libdir] = ext.library_paths()
    return ext.load(
        name=name,
        sources=[source],
        extra_cflags=["-std=c++17", "-DNOCUDA"],
        with_cuda=False,
        extra_ldflags=[
            "-ltorch",
            "-ltorch_python",
            f"-L{torch_libdir}",
            f"-Wl,-rpath,{torch_libdir}",
        ],
        verbose=False,
    )


def hex_engine():
    return _load("hexref", f"{REF}/hex/cpp/wrappers.cpp")


def mcts_engine():
    return _load("mctsref", f"{REF}/mcts/cpp/wrappers.cpp")
