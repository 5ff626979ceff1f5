"""Custom distributed operators built from DataFrame primitives."""
