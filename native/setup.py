"""Build the mfcnet_native C extension:

    cd native && python setup.py build_ext --inplace

The data layer auto-detects the built module and falls back to the pure
NumPy path when absent.
"""

from setuptools import Extension, setup

setup(
    name="mfcnet_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "mfcnet_native",
            sources=["mfcnet_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
