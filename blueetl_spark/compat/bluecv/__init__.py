"""Reference-shaped bluecv feature-module namespace (see compat package docstring)."""
