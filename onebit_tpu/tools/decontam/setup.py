"""Build the native n-gram core:

    cd onebit_tpu/tools/decontam && python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

setup(
    name="janitor_core",
    ext_modules=[Extension("_janitor_core", ["janitor_core.c"],
                           extra_compile_args=["-O3"])],
)
