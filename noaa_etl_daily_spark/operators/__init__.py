"""Operator modules. Importing this package populates the query registry."""

from . import aggregates  # noqa: F401
