"""Reference-shaped bnac feature-module namespace (see compat package docstring)."""
