"""Compatibility shim: environments without the `wheel` package (and no
network to fetch it) can still `pip install -e . --no-use-pep517`.
All metadata lives in pyproject.toml."""
from setuptools import setup

setup()
