"""Reference-shaped soma feature-module namespace (see compat package docstring)."""
