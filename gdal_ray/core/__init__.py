"""Pure computational kernels — no Ray imports allowed in this subpackage."""
