"""Config/CLI utilities."""
from . import factory, parser  # noqa: F401
