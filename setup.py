"""Build hook for the optional C++ native extension.

The package works without it (NumPy fallback in vbicm_tpu.model); build it
with: python setup.py build_ext --inplace
"""
import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "vbicm_tpu._native",
            sources=["native/geometry.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ]
)
