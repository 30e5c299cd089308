"""User-facing function surfaces: the SQL expression engine (``expr``)."""
