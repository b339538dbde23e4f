"""Pipeline front-end: parse TQL-like pipeline strings into Dataset chains."""

from tenzir_ray.pipelines.package import InstalledPackage, Package
from tenzir_ray.pipelines.planner import Pipeline

__all__ = ["InstalledPackage", "Package", "Pipeline"]
