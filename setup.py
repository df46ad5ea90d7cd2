"""Shim for legacy editable installs (`pip install -e .` without the
`wheel` package); all metadata lives in pyproject.toml [project]."""

from setuptools import setup

setup()
