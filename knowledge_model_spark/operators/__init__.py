"""Composite operators built on DataFrame primitives."""
